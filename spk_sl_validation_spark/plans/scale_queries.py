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
