"""Driver contract for the spark-graft builder (PySpark target).

Thin delegation into ``spk_sl_validation_spark.plans.registry`` — every
implemented operator from SURVEY.md §2 registers a named query there,
with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's FULL CL pipeline (SL_SPK_Cleansing.py,
    SURVEY.md §3.1) on /root/testdata/sf0.001 — validity split,
    broadcast enrichment, dual-source window, SENTINEL-guarded Apex
    cascades A/B/C, J11/J12 backfill joins, and the Analysis coalesce;
    returns the main "Valid SL with SPK" sheet relation (the same plan
    `pipeline_spk_sl_main` runs hash-checked at sf0.01)."""
    from spk_sl_validation_spark.plans.pipeline_queries import pipeline_spk_sl_main

    return pipeline_spk_sl_main(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spk_sl_validation_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from spk_sl_validation_spark.plans.registry import all_oracles

    return all_oracles()
