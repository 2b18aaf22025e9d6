"""Scale-machinery queries: skew-mitigation operators whose results
must be *identical* to the naive plan — the oracle is the plain SQL
the salted/bucketed execution replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spk_sl_validation_spark.operators.skew import salted_group_agg
from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table


@register(
    "salted_group_sum",
    doc="two-phase salted aggregation on a skewed low-cardinality key == plain GROUP BY (exact decimal sums)",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
)
def salted_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_group_agg(
        ev, ["event_type"], sum_cols=["value_dec"], count=True, n_salts=16, salt_source="event_id"
    )
    return out.select(
        "event_type", F.col("sum_value_dec").cast("double").alias("sum_value"), "n"
    )


@register(
    "salted_join_agg",
    doc=(
        "salted large-to-large shuffle join on a 5-value (maximally skewed) key "
        "== plain equi-join: probe rows salt by row-hash, build side replicated "
        "n_salts x, so one hot key spreads over n_salts reducers. Aggregated "
        "with exact decimal sums so the comparison is bit-stable"
    ),
    oracle="""
WITH dim AS (
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS type_avg
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       MAX(d.type_avg) AS type_avg
FROM events e JOIN dim d ON d.event_type = e.event_type
GROUP BY e.event_type
""",
)
def salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spk_sl_validation_spark.operators.skew import salted_shuffle_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias(
            "type_avg"
        )
    )
    joined = salted_shuffle_join(ev, dim, on=["event_type"], n_salts=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.max("type_avg").alias("type_avg"),
    )
