"""Driver contract for the spark-graft builder (PySpark target).

Thin delegation into ``spk_sl_validation_spark.plans.registry`` — every
implemented operator from SURVEY.md §2 registers a named query there,
with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: enrich the fact table
    against two broadcast dims, classify every row through the rule
    cascade, mark dual-source groups, and summarize — the reference's
    pipeline shape (SURVEY.md §3.1) on the driver testdata."""
    from pyspark.sql import functions as F

    from spk_sl_validation_spark.operators import relational as R
    from spk_sl_validation_spark.plans.relational_queries import _lineitem_rules
    from spk_sl_validation_spark.operators.rules import compile_to_column
    from spk_sl_validation_spark.sources.readers import load_table

    sf_dir = "/root/testdata/sf0.001"
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    enriched = R.left_join(li, supp, on=li.l_suppkey == supp.s_suppkey)
    enriched = R.left_join(enriched, nation, on=F.col("s_nationkey") == nation.n_nationkey)
    classified = enriched.withColumn("Comment", compile_to_column(_lineitem_rules()))
    flagged = R.mark_duplicates(classified, ["l_orderkey", "l_partkey"], flag_col="dual_source")
    return (
        flagged.groupBy("n_name", "Comment")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("dual_source").cast("long")).alias("n_dual_source"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spk_sl_validation_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from spk_sl_validation_spark.plans.registry import all_oracles

    return all_oracles()
