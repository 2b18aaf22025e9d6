"""Incremental batch consumption (operators/incremental.py):
two incremental runs over a growing directory must together equal one
full read, with no loss at equal-timestamp boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from spk_sl_validation_spark.operators.incremental import (
    commit_watermark,
    incremental_rows,
    read_watermark,
)
from spk_sl_validation_spark.sources.readers import load_table


def test_two_increments_cover_exactly_once(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    median_ts = ev.selectExpr("percentile(cast(ts as double), 0.5)").first()[0]

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    first = ev.filter(F.col("ts").cast("double") <= median_ts)
    second = ev.filter(F.col("ts").cast("double") > median_ts)
    first.write.mode("overwrite").parquet(src)

    inc1 = incremental_rows(spark.read.parquet(src), state, "ts", "event_id")
    got1 = inc1.count()
    assert got1 == first.count()
    commit_watermark(inc1, state, "ts", "event_id")
    assert read_watermark(state) is not None

    # nothing new → empty increment, watermark unchanged
    again = incremental_rows(spark.read.parquet(src), state, "ts", "event_id")
    assert again.count() == 0
    assert commit_watermark(again, state, "ts", "event_id") is None

    # append the second batch (same directory, new files)
    second.write.mode("append").parquet(src)
    inc2 = incremental_rows(spark.read.parquet(src), state, "ts", "event_id")
    assert inc2.count() == second.count()
    commit_watermark(inc2, state, "ts", "event_id")

    # union of increments == full dataset, no dupes, no loss
    total = got1 + second.count()
    assert total == ev.count()


def test_equal_timestamp_boundary_not_lost(spark, tmp_path):
    """Rows sharing the watermark timestamp but arriving later must
    still be picked up (composite watermark)."""
    src = str(tmp_path / "src2")
    state = str(tmp_path / "state2")
    b1 = spark.createDataFrame([(1, 100, "a"), (2, 200, "b")], ["event_id", "ts", "v"])
    b1.write.mode("overwrite").parquet(src)
    inc1 = incremental_rows(spark.read.parquet(src), state, "ts", "event_id")
    assert inc1.count() == 2
    commit_watermark(inc1, state, "ts", "event_id")

    # late row with SAME ts=200 but higher id
    spark.createDataFrame([(3, 200, "c")], ["event_id", "ts", "v"]).write.mode(
        "append"
    ).parquet(src)
    inc2 = incremental_rows(spark.read.parquet(src), state, "ts", "event_id")
    rows = inc2.collect()
    assert len(rows) == 1 and rows[0].event_id == 3
