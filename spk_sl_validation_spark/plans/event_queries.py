"""Event-table queries: JSON function surface + as-of join.

Neither exists in the reference (no JSON, no temporal joins —
SURVEY.md §2.9/§2.5); both are table stakes for an events pipeline at
scale, so they register as first-class oracle-checked operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spk_sl_validation_spark.operators.asof import asof_join
from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table


@register(
    "events_json_extract",
    doc="JSON path extraction from the props column + grouped aggregation (function surface: JSON)",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CAST(props->>'k' AS BIGINT)) AS n_k,
       MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
       MAX(CAST(props->>'k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "asof_join_purchases",
    doc="as-of join: each click attached to the user's most recent prior-or-same-time purchase (union+window, one shuffle)",
    oracle="""
WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT c.event_id, c.user_id, c.ts,
       p.event_id AS purchase_event_id, p.ts AS purchase_ts
FROM clicks c
ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def asof_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    out = asof_join(
        clicks,
        purchases.select(
            "user_id",
            "ts",
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
        ),
        by=["user_id"],
        on="ts",
        value_cols=["purchase_event_id", "purchase_ts"],
        tiebreak="purchase_event_id",
        suffix="",
    )
    return out.select("event_id", "user_id", "ts", "purchase_event_id", "purchase_ts")


@register(
    "range_join_clicks_before_purchase",
    headline=True,
    doc="banded interval range join: per purchase, clicks by the same user in the trailing hour (operators/rangejoin.py; hash equi-join on (user, time-band), no BNLJ)",
    oracle="""
SELECT p.event_id, p.user_id, COUNT(c.ts) AS n_in_window
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts > p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
GROUP BY p.event_id, p.user_id
""",
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spk_sl_validation_spark.operators.rangejoin import interval_count

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = interval_count(
        purchases, clicks, by=["user_id"], left_id="event_id",
        left_ts="ts", right_ts="ts", lookback_sec=3600,
    )
    return out.select("event_id", "user_id", "n_in_window")


DEBOUNCE_GAP_HOURS = 6


@register(
    "events_debounce",
    doc=(
        f"time-window dedup (debounce): an event survives iff >= "
        f"{DEBOUNCE_GAP_HOURS} h passed since the previous event of the same "
        "(user, type) — telemetry retry/duplicate-burst suppression. One lag "
        "window, one shuffle; lag-based (the timer resets on every event, "
        "kept or not), so the rule stays a single window pass"
    ),
    oracle=f"""
SELECT event_id, user_id, event_type, ts
FROM (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_ts
  FROM events
)
WHERE prev_ts IS NULL OR ts - prev_ts >= INTERVAL {DEBOUNCE_GAP_HOURS} HOUR
""",
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst suppression for event streams: duplicate submissions,
    retry storms, and double-fires land within minutes of the
    original — keep an event only when the immediately preceding
    event of the same (user, type) is at least the gap older.

    Lag-based semantics (not cascade-debounce): the comparison is
    always against the previous RAW event, so the operator is one
    window function — single shuffle on the partition key, streaming
    frame, no state beyond one row. The cascade variant (timer resets
    only on kept events) is a running fixpoint — that shape lives in
    sessionize_events / streaming_sessionize.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        ev.withColumn("__prev", prev)
        .filter(
            F.col("__prev").isNull()
            | (F.col("ts") >= F.col("__prev") + F.expr(f"INTERVAL {DEBOUNCE_GAP_HOURS} HOUR"))
        )
        .select("event_id", "user_id", "event_type", "ts")
    )
