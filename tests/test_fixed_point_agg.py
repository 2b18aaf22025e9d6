"""exact_fixed_point_agg: two-level exact money aggregation.

Long-cents accumulation inside each input partition, DECIMAL(38,0)
merge across partials — bit-identical to a decimal chain, bounded
accumulators regardless of corpus size."""

from __future__ import annotations

from pyspark.sql import functions as F

from spk_sl_validation_spark.operators import relational as R


def _cents(c):
    return F.round(F.col(c) * 100).cast("long")


def test_matches_decimal_chain_bitwise(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = R.exact_fixed_point_agg(
        li,
        ["l_returnflag"],
        {
            "s2": (_cents("l_extendedprice"), 1e2),
            "s4": (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")), 1e4),
        },
        count_alias="n",
    )
    ref = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("s2"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("s4"),
        F.count(F.lit(1)).alias("n"),
    )
    g = {r.l_returnflag: (r.s2, r.s4, r.n) for r in got.collect()}
    e = {r.l_returnflag: (r.s2, r.s4, r.n) for r in ref.collect()}
    assert g == e  # bit-identical doubles, not approx


def test_partition_count_invariance(spark, sf_dir):
    """The level-1 split follows spark_partition_id — the final result
    must not depend on how the input happens to be partitioned."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )
    sums = {"s": (_cents("l_extendedprice"), 1e2)}
    a = R.exact_fixed_point_agg(li.repartition(1), ["l_returnflag"], sums)
    b = R.exact_fixed_point_agg(li.repartition(17), ["l_returnflag"], sums)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_level1_partials_stay_partition_local(spark, sf_dir):
    """Level 1 must complete map-side: the only shuffled rows are the
    per-(group, partition) partials, so exactly one of the two
    exchanges carries row-level data... assert the plan has 2 shuffles
    and zero sort-merge joins."""
    import re

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = R.exact_fixed_point_agg(li, ["l_returnflag"], {"s": (_cents("l_extendedprice"), 1e2)})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "SortMergeJoin" not in plan
