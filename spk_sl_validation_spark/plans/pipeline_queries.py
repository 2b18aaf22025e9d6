"""The reference pipelines as driver-contract entries.

The full SPK/SL cleansing and status-cleansing pipelines run on the
reference-domain synthetic fixtures (sources/fixtures.py — built to
fire every cascade rule). Their row-level expected outputs are pinned
by the golden tests (tests/test_pipelines.py); the fixture tables are
createDataFrame-built and hence not visible to the DuckDB side, so
these register rows-only — the honest shape for whole-pipeline checks
(sentinel-guarded cascades are not SQL-flattenable, operators/rules.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spk_sl_validation_spark.plans.registry import register


def _stringify_timestamps(df: DataFrame) -> DataFrame:
    """SAP 'Valid to' dates use 9999-12-31, outside pandas' ns range —
    Arrow collection would overflow. Render timestamps as strings for
    the contract surface (values unchanged, just display-typed)."""
    from spk_sl_validation_spark.functions.scalar import c

    exprs = [
        c(f.name).cast("string").alias(f.name) if f.dataType.typeName() == "timestamp" else c(f.name)
        for f in df.schema.fields
    ]
    return df.select(*exprs)


@register(
    "pipeline_spk_sl_main",
    doc="FULL reference pipeline (SL_SPK_Cleansing): fixtures → main sheet with Comment+Analysis (golden-tested; rows-only here)",
    oracle=None,
)
def pipeline_spk_sl_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spk_sl_validation_spark.plans import spk_sl_cleansing
    from spk_sl_validation_spark.sources import fixtures as FX

    tables = FX.build_tables(spark)
    sheets = spk_sl_cleansing.run(tables, run_ts=FX.RUN_TS, variant=spk_sl_cleansing.CL)
    return _stringify_timestamps(sheets["Valid SL with SPK"])


@register(
    "pipeline_status_cleansing",
    doc="FULL reference pipeline (Status_Cleansing): fixtures → MARC sheet with cascade-D comments (golden-tested; rows-only here)",
    oracle=None,
)
def pipeline_status_cleansing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spk_sl_validation_spark.plans import status_cleansing
    from spk_sl_validation_spark.sources import fixtures as FX

    tables = FX.build_tables(spark)
    return _stringify_timestamps(status_cleansing.run(tables)["MARC"])


@register(
    "pipeline_spk_sl_v1",
    doc="FULL reference pipeline, V1 variant (SL_SPK_Check_V1): '70.0'/isna status semantics, short sentinels, no B3/B6 (golden-tested; rows-only here)",
    oracle=None,
)
def pipeline_spk_sl_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spk_sl_validation_spark.plans import spk_sl_cleansing
    from spk_sl_validation_spark.sources import fixtures as FX

    tables = FX.build_tables(spark)
    sheets = spk_sl_cleansing.run(tables, run_ts=FX.RUN_TS, variant=spk_sl_cleansing.V1)
    return _stringify_timestamps(sheets["Valid SL with SPK"])
