"""Aggregation-surface breadth: array aggregation, exact percentiles,
pivot — value-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table


@register(
    "agg_collect_arrays",
    doc="array aggregation: sorted collect_list/collect_set + array ops (size, contains, slice)",
    oracle="""
WITH g AS (
  SELECT c_nationkey,
         list_sort(list(c_custkey)) AS custkeys,
         list_sort(list(DISTINCT c_mktsegment)) AS segments
  FROM customer
  GROUP BY c_nationkey
)
SELECT c_nationkey,
       len(custkeys) AS n_cust,
       CAST(to_json(custkeys[1:5]) AS VARCHAR) AS first5,
       list_contains(segments, 'BUILDING') AS has_building,
       len(segments) AS n_segments
FROM g
""",
)
def agg_collect_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey").agg(
        F.sort_array(F.collect_list("c_custkey")).alias("custkeys"),
        F.sort_array(F.collect_set("c_mktsegment")).alias("segments"),
    )
    return g.select(
        "c_nationkey",
        F.size("custkeys").alias("n_cust"),
        F.to_json(F.slice("custkeys", 1, 5)).alias("first5"),
        F.array_contains("segments", "BUILDING").alias("has_building"),
        F.size("segments").alias("n_segments"),
    )


@register(
    "percentile_stats",
    doc="exact interpolated percentiles (p50/p90/p99) + decimal-exact avg per group",
    oracle="""
SELECT event_type,
       CAST(quantile_cont(CAST(value AS DOUBLE), 0.5) AS DOUBLE) AS p50,
       CAST(quantile_cont(CAST(value AS DOUBLE), 0.9) AS DOUBLE) AS p90,
       CAST(quantile_cont(CAST(value AS DOUBLE), 0.99) AS DOUBLE) AS p99,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type
""",
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    return ev.groupBy("event_type").agg(
        F.percentile(v, F.lit(0.5)).alias("p50"),
        F.percentile(v, F.lit(0.9)).alias("p90"),
        F.percentile(v, F.lit(0.99)).alias("p99"),
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)))
        .cast("double")
        .alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "merge_upsert",
    doc="MERGE/upsert semantics via full outer join + coalesce (updates win, inserts appended)",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
),
updates AS (
  SELECT o_orderkey, o_totalprice * 1.1 AS new_price FROM orders WHERE o_orderkey % 3 = 0
)
SELECT coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
       coalesce(u.new_price, b.o_totalprice) AS price,
       CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
            WHEN u.o_orderkey IS NULL THEN 'unchanged'
            ELSE 'updated' END AS merge_action
FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    updates = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("u_orderkey"), (F.col("o_totalprice") * 1.1).alias("new_price")
    )
    # Full outer is not broadcastable; the default is a sort-merge
    # join. Pin shuffle-hash building on the updates side — the MERGE
    # shape's delta batch is the bounded side at 100 TB, and SHJ skips
    # both sort passes.
    joined = base.join(
        updates.hint("shuffle_hash"), base.o_orderkey == updates.u_orderkey, "full_outer"
    )
    return joined.select(
        F.coalesce("o_orderkey", "u_orderkey").alias("o_orderkey"),
        F.coalesce("new_price", "o_totalprice").alias("price"),
        F.when(F.col("o_orderkey").isNull(), "inserted")
        .when(F.col("u_orderkey").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
    )


@register(
    "set_ops",
    doc="bag-semantics set operations: INTERSECT ALL / EXCEPT ALL between order slices",
    oracle="""
SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 100000
INTERSECT ALL
SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 100000).select("o_custkey", "o_orderstatus")
    urgent = o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_custkey", "o_orderstatus"
    )
    return big.intersectAll(urgent)


@register(
    "except_all",
    doc="EXCEPT ALL: multiset difference between order slices",
    oracle="""
SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 100000
EXCEPT ALL
SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 100000).select("o_custkey", "o_orderstatus")
    urgent = o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_custkey", "o_orderstatus"
    )
    return big.exceptAll(urgent)


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "pivot_revenue",
    doc="pivot: order revenue by status × priority (explicit pivot values → stable schema)",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p1_urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p2_high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p3_medium,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p4_notspec,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p5_low
FROM orders
GROUP BY o_orderstatus
""",
)
def pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    pv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.sum(price).cast("double"))
    )
    return pv.select(
        "o_orderstatus",
        F.col("`1-URGENT`").alias("p1_urgent"),
        F.col("`2-HIGH`").alias("p2_high"),
        F.col("`3-MEDIUM`").alias("p3_medium"),
        F.col("`4-NOT SPECIFIED`").alias("p4_notspec"),
        F.col("`5-LOW`").alias("p5_low"),
    )


@register(
    "conditional_agg_suite",
    doc=(
        "conditional-aggregate breadth: FILTER-clause counts/sums, count_if, "
        "bool_and/bool_or, arg_max with a unique ordering key — one grouped "
        "pass, every branch map-side combinable"
    ),
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '1-URGENT')
            AS DOUBLE) AS urgent_revenue,
       CAST(count_if(o_orderpriority = '5-LOW') AS BIGINT) AS n_low,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       arg_max(o_orderpriority, o_orderkey) AS latest_priority
FROM orders
GROUP BY o_orderstatus
""",
)
def conditional_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__ca_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_revenue,
               count_if(o_orderpriority = '5-LOW') AS n_low,
               bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
               bool_and(o_totalprice > 1000) AS all_over_1k,
               max_by(o_orderpriority, o_orderkey) AS latest_priority
        FROM __ca_orders
        GROUP BY o_orderstatus
        """
    )


TRIM_FRAC = 0.05  # drop this fraction from EACH tail


@register(
    "trimmed_mean_events",
    doc=(
        f"exact {int(TRIM_FRAC*100)}%-trimmed mean of event value per type — "
        "the robust-location twin of mad_outliers: rank by (value, event_id) "
        "total order, drop floor(0.05·n) rows from each tail, mean the rest "
        "via exact decimal staging. One window + one aggregate, both keyed "
        "by the low-cardinality type column"
    ),
    oracle=f"""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
kept AS (
  SELECT event_type, value
  FROM r
  WHERE rn > CAST(floor({TRIM_FRAC} * n) AS BIGINT)
    AND rn <= n - CAST(floor({TRIM_FRAC} * n) AS BIGINT)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_kept,
       round(CAST(sum(CAST(round(value, 12) AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6)
         AS trimmed_mean
FROM kept GROUP BY event_type
""",
)
def trimmed_mean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    cut = F.floor(F.lit(TRIM_FRAC) * F.col("n")).cast("long")
    kept = r.filter((F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut))
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.sum(F.round("value", 12).cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("trimmed_mean"),
    )


@register(
    "correlation_suite",
    doc=(
        "grouped bivariate statistics: Pearson correlation + covariance of "
        "(quantity, extendedprice) per return flag from exact staged decimal "
        "power sums — the same order-independent staging as moment_stats, "
        "extended to cross moments; one map-side-combined aggregate"
    ),
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(round(l_quantity, 6) AS DECIMAL(24,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(round(l_extendedprice, 6) AS DECIMAL(24,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(round(l_quantity * l_quantity, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(round(l_extendedprice * l_extendedprice, 6) AS DECIMAL(32,6))) AS DOUBLE) AS syy,
         CAST(sum(CAST(round(l_quantity * l_extendedprice, 6) AS DECIMAL(30,6))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((sxy / n - (sx / n) * (sy / n))
             / (sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0))
                * sqrt(greatest(syy / n - (sy / n) * (sy / n), 0.0))), 6) AS pearson_r,
       round(sxy / n - (sx / n) * (sy / n), 4) AS covar_pop
FROM s
""",
)
def correlation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r / covariance per group WITHOUT the engine's corr()
    builtin (whose accumulation order is engine-specific): exact
    decimal power sums first — quantity and price carry at most 2 true
    decimals, so round-to-6 products are mathematically exact — then a
    fixed double expression both engines evaluate identically."""
    li = load_table(spark, sf_dir, "lineitem")

    def dsum(expr, prec):
        return F.sum(F.round(expr, 6).cast(f"decimal({prec},6)")).cast("double")

    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("l_quantity"), 24).alias("sx"),
        dsum(F.col("l_extendedprice"), 24).alias("sy"),
        dsum(F.col("l_quantity") * F.col("l_quantity"), 28).alias("sxx"),
        dsum(F.col("l_extendedprice") * F.col("l_extendedprice"), 32).alias("syy"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice"), 30).alias("sxy"),
    )
    n = F.col("n")
    mx, my = F.col("sx") / n, F.col("sy") / n
    vx = F.greatest(F.col("sxx") / n - mx * mx, F.lit(0.0))
    vy = F.greatest(F.col("syy") / n - my * my, F.lit(0.0))
    cov = F.col("sxy") / n - mx * my
    return s.select(
        "l_returnflag",
        "n",
        F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("pearson_r"),
        F.round(cov, 4).alias("covar_pop"),
    )
