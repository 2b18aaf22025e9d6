"""Sources & sinks: parquet/csv readers, report sink, synthetic fixtures."""
