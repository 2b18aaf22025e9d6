"""spk_sl_validation_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``yeahjrco/SPK_SL_validation`` repo (a pandas batch ETL + rule-engine
workload over SAP master-data extracts) as an idiomatic Spark library,
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Layout:
- ``session``     — SparkSession builder tuned for the target env
- ``schemas``     — explicit StructTypes for every entity
- ``functions/``  — scalar / text / vector column expressions
- ``operators/``  — relational ops, the rule-cascade compiler, dedup,
                    similarity, window ops
- ``sources/``    — readers, report sink, synthetic fixtures
- ``plans/``      — end-to-end pipelines (reference parity) + the
                    named query registry used by the driver contract
- ``streaming/``  — Structured Streaming variants
"""

__version__ = "0.1.0"
