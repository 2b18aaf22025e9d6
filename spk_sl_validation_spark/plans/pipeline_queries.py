"""The reference pipelines as driver-contract entries — fully
hash-checked against DuckDB.

Round 1 registered these rows-only: the fixture inputs were
createDataFrame-built and invisible to the oracle side. Now the inputs
are reference-domain tables derived from the driver's parquet testdata
by shared SQL (plans/refdata.py), so the COMPLETE pipelines — validity
split, broadcast enrichment, dual-source window, SENTINEL-guarded Apex
cascade, IntraCo branch, backfill/Analysis — run through the engine
(plans/spk_sl_cleansing.run / plans/status_cleansing.run) AND replay in
DuckDB, value-hash compared end to end.

Row-level per-rule semantics against the reference itself
(SL_SPK_Cleansing.py / SL_SPK_Check_V1.py / Status_Cleansing.py) remain
pinned by the fixture golden tests (tests/test_pipelines.py).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from spk_sl_validation_spark.plans import refdata
from spk_sl_validation_spark.plans.registry import register

# must render identically to refdata.RUN_TS_SQL
RUN_TS = datetime(1997, 6, 1)


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
    doc=(
        "FULL reference pipeline (SL_SPK_Cleansing): parquet-derived reference "
        "tables → validity split → enrichment → cascades A/B/C (SENTINEL Apex "
        "cascade included) → main sheet with Comment+Analysis; DuckDB replays "
        "the whole dataflow (hash-checked)"
    ),
    oracle=refdata.spk_sl_oracle("CL"),
)
def pipeline_spk_sl_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spk_sl_validation_spark.plans import spk_sl_cleansing

    tables = refdata.build_ref_tables(spark, sf_dir)
    sheets = spk_sl_cleansing.run(tables, run_ts=RUN_TS, variant=spk_sl_cleansing.CL)
    return _stringify_timestamps(sheets["Valid SL with SPK"])


@register(
    "pipeline_status_cleansing",
    doc=(
        "FULL reference pipeline (Status_Cleansing): parquet-derived MARC/MARA/"
        "MB52 → scope filter → inventory group-sum → cascade D → MARC sheet "
        "(hash-checked)"
    ),
    oracle=refdata.status_cleansing_oracle(),
)
def pipeline_status_cleansing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spk_sl_validation_spark.plans import status_cleansing

    tables = refdata.build_ref_tables(spark, sf_dir)
    # r11: lineage barrier between the fixture DERIVATION (which
    # carries a 1-row scalar fan-in — a BroadcastNestedLoopJoin) and
    # the pipeline. Fused, the cascade-D projection lands inside
    # bnlj_doConsume where Spark's expression splitter cannot split
    # (inputs are method parameters) and the method blows the JVM
    # 64 KB codegen limit — a hard red under the selfcheck's
    # codegen.fallback=false, and a silent interpreted 4-10x wall
    # before. Lazy checkpoints: nothing runs at build time, and each
    # side compiles as its own (small) whole-stage unit. Production
    # reads real SAP extracts from storage, so the scan boundary is
    # the production shape anyway.
    tables = {k: v.localCheckpoint(eager=False) for k, v in tables.items()}
    return _stringify_timestamps(status_cleansing.run(tables)["MARC"])


@register(
    "pipeline_spk_sl_v1",
    doc=(
        "FULL reference pipeline, V1 variant (SL_SPK_Check_V1): '70.0'/isna "
        "status semantics, short sentinels, no B3/B6, no backfill (hash-checked)"
    ),
    oracle=refdata.spk_sl_oracle("V1"),
)
def pipeline_spk_sl_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spk_sl_validation_spark.plans import spk_sl_cleansing

    tables = refdata.build_ref_tables(spark, sf_dir)
    sheets = spk_sl_cleansing.run(tables, run_ts=RUN_TS, variant=spk_sl_cleansing.V1)
    return _stringify_timestamps(sheets["Valid SL with SPK"])
