"""Approximate-sketch operators: accuracy-bounded, not oracle-hashed
(HLL implementations differ across engines by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spk_sl_validation_spark.sources.readers import load_table


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).collect()[0].n
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02).alias("n")).collect()[0].n
    assert abs(approx - exact) <= max(1, 0.05 * exact)


def test_approx_percentile_brackets_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.select(
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
        F.percentile(F.col("value").cast("double"), F.lit(0.5)).alias("exact"),
    ).collect()[0]
    lo, hi = (
        ev.selectExpr("min(value) AS lo", "max(value) AS hi").collect()[0].lo,
        ev.selectExpr("max(value) AS hi").collect()[0].hi,
    )
    spread = hi - lo
    assert abs(row.approx - row.exact) <= 0.05 * spread
