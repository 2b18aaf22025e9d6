"""transformWithState (Spark 4 StatefulProcessor) — skip-guarded.

The transformWithState Python runner requires a working
``google.protobuf``; containers without it crash the runner, so this
surface is covered here (skipping where the dependency is broken)
instead of by an always-on driver-contract query. Semantics under
test: final per-user state == batch GROUP BY on the same data.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _protobuf_ok(), reason="transformWithState needs google.protobuf")
def test_transform_with_state_matches_batch(spark, sf_dir):
    from spk_sl_validation_spark.sources.readers import load_table
    from spk_sl_validation_spark.streaming import pipeline as P

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = P.stream_events(spark, sf_dir)
        out = P.run_available_now(P.user_activity_stats(stream), output_mode="update")
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.expr("timestamp_micros(first_us)").alias("first_ts"),
            F.expr("timestamp_micros(last_us)").alias("last_ts"),
        )
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
    )
    assert final.exceptAll(batch).count() == 0 and batch.exceptAll(final).count() == 0
