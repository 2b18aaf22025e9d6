"""Function-surface breadth queries: windows, strings, grouping sets.

The reference's function inventory is tiny (SURVEY.md §2.9); a user
replacing it gets the full Spark SQL surface. These queries pin the
parts most workloads reach for first, value-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table


@register(
    "window_suite",
    doc="window-function breadth: lag/lead/rank/dense_rank/ntile + running + moving aggregates",
    oracle="""
SELECT o_custkey, o_orderkey,
       lag(o_orderkey) OVER w AS prev_order,
       lead(o_orderkey) OVER w AS next_order,
       rank() OVER wp AS price_rank,
       dense_rank() OVER wp AS price_dense_rank,
       ntile(4) OVER w AS quartile,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_3,
       count(*) OVER (PARTITION BY o_custkey) AS n_orders
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.rank().over(wp).alias("price_rank"),
        F.dense_rank().over(wp).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.sum(price_dec).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias("running_spend"),
        F.sum(price_dec).over(w.rowsBetween(-2, 0)).cast("double").alias("spend_3"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n_orders"),
    )


@register(
    "string_suite",
    doc="string-function breadth: regexp_extract, split_part, levenshtein, translate, pads, reverse",
    oracle="""
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)$', 1) AS name_num,
       split_part(c_name, '#', 1) AS name_stem,
       levenshtein(c_mktsegment, 'BUILDING') AS seg_dist,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
       reverse(c_name) AS name_rev,
       length(c_name) AS name_len,
       upper(substring(c_mktsegment, 1, 3)) AS seg3
FROM customer
""",
)
def string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("name_num"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_stem"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_dist"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lower_vowels"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse("c_name").alias("name_rev"),
        F.length("c_name").alias("name_len"),
        F.upper(F.substring("c_mktsegment", 1, 3)).alias("seg3"),
    )


@register(
    "null_semantics",
    doc="null-handling surface: <=> (IS NOT DISTINCT FROM), null-safe !=, coalesce/nullif/nvl2 (SURVEY §4.4.1)",
    oracle="""
SELECT o_orderkey,
       (o_orderstatus IS NOT DISTINCT FROM 'O') AS eq_nullsafe,
       (o_orderstatus IS DISTINCT FROM 'F') AS neq_nullsafe,
       coalesce(nullif(o_orderstatus, 'P'), 'WAS_P') AS status_or_marker,
       CASE WHEN o_custkey IS NOT NULL THEN 'has_cust' ELSE 'no_cust' END AS nvl2_shape
FROM orders
WHERE o_orderkey < 2000
""",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spk_sl_validation_spark.functions.scalar import neq

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").eqNullSafe("O").alias("eq_nullsafe"),
        neq(F.col("o_orderstatus"), "F").alias("neq_nullsafe"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("WAS_P")).alias("status_or_marker"),
        F.nvl2(F.col("o_custkey"), F.lit("has_cust"), F.lit("no_cust")).alias("nvl2_shape"),
    )


@register(
    "value_histogram",
    doc="fixed-width histogram via width_bucket (distributed histogram = one aggregation)",
    oracle="""
SELECT CAST(CASE WHEN value < 0.0 THEN 0
                 WHEN value >= 1000.0 THEN 21
                 ELSE CAST(floor(value / 50.0) AS INTEGER) + 1 END AS INTEGER) AS bucket,
       COUNT(*) AS n,
       MIN(value) AS lo,
       MAX(value) AS hi
FROM events
GROUP BY bucket
""",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.width_bucket("value", F.lit(0.0), F.lit(1000.0), F.lit(20)).cast("int").alias("bucket"), "value")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.min("value").alias("lo"), F.max("value").alias("hi"))
    )


@register(
    "rollup_revenue",
    doc="ROLLUP grouping-set aggregation with grouping() flags (multi-level totals in one pass)",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "revenue",
            "n",
        )
    )


@register(
    "cube_revenue",
    doc="CUBE grouping-set aggregation (all 4 grouping combinations in one pass; partial-agg + single expand, no re-scan per level)",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "revenue",
            "n",
        )
    )


@register(
    "window_time_range",
    doc=(
        "time-RANGE window frame: per-customer trailing-90-day rolling spend and "
        "order count (frame bounded by event-time value, not row offset). Spark "
        "expresses the interval bound as rangeBetween over epoch seconds; the "
        "frame is a set (order-independent within ties), and the DECIMAL sum "
        "makes the rolling total bit-deterministic"
    ),
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_90d,
       COUNT(*) OVER w AS n_orders_90d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
""",
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("long"))
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("spend_90d"),
        F.count(F.lit(1)).over(w).alias("n_orders_90d"),
    )


@register(
    "grouping_sets_revenue",
    doc=(
        "explicit GROUPING SETS (the two single-dimension rollups only, no "
        "grand total): one scan, one Expand — the shape CUBE/ROLLUP cannot "
        "express when only selected combinations are wanted"
    ),
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               GROUPING(o_orderstatus) AS g_status,
               GROUPING(o_orderpriority) AS g_priority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "safe_arithmetic_suite",
    doc=(
        "ANSI-safe error handling surface: try_cast (bad string/number/date → "
        "NULL, never a job abort), try_divide (NULL on zero), out-of-bounds "
        "array index → NULL. At 100 TB one malformed row must not kill an "
        "8-hour job; try_* quarantines it as NULL for downstream auditing"
    ),
    oracle="""
SELECT o_orderkey,
       try_cast(o_orderpriority AS INTEGER) AS whole_prio_int,
       try_cast(split_part(o_orderpriority, '-', 1) AS INTEGER) AS prio_num,
       try_cast(o_orderstatus AS DATE) IS NULL AS status_not_date,
       CASE WHEN (try_cast(split_part(o_orderpriority, '-', 1) AS INTEGER) - 1) = 0
            THEN NULL
            ELSE o_totalprice / (try_cast(split_part(o_orderpriority, '-', 1) AS INTEGER) - 1)
       END AS price_over_prio_minus1,
       (string_split(o_orderpriority, '-'))[5] AS oob_element
FROM orders
WHERE o_orderkey < 1000
""",
)
def safe_arithmetic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    prio_num = F.try_to_number(
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1)), F.lit("9")
    ).cast("int")
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("whole_prio_int"),
        prio_num.alias("prio_num"),
        F.col("o_orderstatus").try_cast("date").isNull().alias("status_not_date"),
        F.try_divide(F.col("o_totalprice"), prio_num - F.lit(1)).alias(
            "price_over_prio_minus1"
        ),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(5)).alias("oob_element"),
    )


@register(
    "analytic_rank_suite",
    doc=(
        "analytic window breadth beyond window_suite: percent_rank, "
        "cume_dist, nth_value, first/last_value with explicit frames — "
        "ratios of integer ranks, so doubles are engine-identical"
    ),
    oracle="""
SELECT o_custkey, o_orderkey,
       round(percent_rank() OVER wp, 6) AS price_pct_rank,
       round(cume_dist() OVER wp, 6) AS price_cume_dist,
       nth_value(o_orderkey, 3) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS third_priciest,
       first_value(o_orderkey) OVER wp AS priciest,
       last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS cheapest
FROM orders
WHERE o_custkey < 200
WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def analytic_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    wp = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w_full = wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(wp), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(wp), 6).alias("price_cume_dist"),
        F.nth_value("o_orderkey", 3).over(w_full).alias("third_priciest"),
        F.first("o_orderkey").over(wp).alias("priciest"),
        F.last("o_orderkey").over(w_full).alias("cheapest"),
    )
