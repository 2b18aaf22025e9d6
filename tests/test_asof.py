"""Unit tests for the as-of join operator."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from spk_sl_validation_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_basic_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            Row(lid=1, k="a", ts=_ts("2024-01-01T10:00:00")),
            Row(lid=2, k="a", ts=_ts("2024-01-01T12:00:00")),
            Row(lid=3, k="a", ts=_ts("2024-01-01T09:00:00")),  # before any right row
            Row(lid=4, k="b", ts=_ts("2024-01-01T10:00:00")),  # other key
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01T10:00:00"), rid=100),  # ties lid=1 → inclusive
            Row(k="a", ts=_ts("2024-01-01T11:00:00"), rid=101),
            Row(k="b", ts=_ts("2024-01-01T08:00:00"), rid=200),
        ]
    )
    out = {r.lid: r.rid for r in asof_join(left, right, by=["k"], on="ts", suffix="").collect()}
    assert out[1] == 100  # equal timestamp matches (inclusive)
    assert out[2] == 101  # latest prior
    assert out[3] is None  # no prior right row → null
    assert out[4] == 200  # keyed independently


def test_asof_tiebreak_max_wins(spark):
    left = spark.createDataFrame([Row(lid=1, k="a", ts=_ts("2024-01-01T10:00:00"))])
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01T09:00:00"), rid=5),
            Row(k="a", ts=_ts("2024-01-01T09:00:00"), rid=9),
        ]
    )
    out = asof_join(left, right, by=["k"], on="ts", tiebreak="rid", suffix="").collect()
    assert out[0].rid == 9
