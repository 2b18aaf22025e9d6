"""Modern Spark 4 SQL surface: recursive CTEs, VARIANT JSON, frequent-
items sketch, unpivot/melt.

Beyond-reference extensions (the reference's surface is plain pandas —
SURVEY.md §2.9 lists no JSON/recursion/sketch use). These pin the
engine's coverage of the newest declarative surfaces, each with an
exact DuckDB oracle:

- **Recursive CTE** (Spark 4.0+): the one relational construct that
  expresses *stateful sequential* logic — a running sum that resets at
  a cap cannot be written with window frames (each row's value depends
  on the previous row's *computed* state, not its inputs). Recursion
  depth = max chain length per key (≤ 25 orders/customer here), and
  each iteration is a hash join on (custkey, rn) — fully distributed,
  no driver loop.
- **VARIANT** (Spark 4.0+): parse the JSON once into the binary
  variant encoding, then bind typed paths — at 100 TB this beats
  per-path get_json_object re-parsing; the parse is a codegen'd
  columnar kernel.
- **approx_top_k**: the mergeable frequent-items sketch — partial
  sketches combine associatively across partitions (map-side partial,
  one narrow final merge), the only scalable shape for heavy-hitter
  queries on skewed 100 TB columns. k exceeds the column's true
  cardinality here, so the sketch is exact and oracle-checkable.
- **unpivot** (dedicated logical operator, not a UNION of scans): one
  scan emits all measure rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table

# Capped running sum over each customer's order history in date order:
# spend accumulates until it crosses the cap, then the bucket resets and a
# reset is counted (budget-exhaustion semantics). The per-branch CAST keeps
# the recursive column types fixed (recursive UNION ALL requires a stable
# schema) and the arithmetic exact DECIMAL on both engines.
_RECURSIVE_SQL = """
WITH RECURSIVE ord AS (
  SELECT o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM {orders}
),
walk(o_custkey, rn, bucket, n_resets) AS (
  SELECT o_custkey, rn,
         CAST(CASE WHEN price >= 300000 THEN 0 ELSE price END AS DECIMAL(18,2)),
         CASE WHEN price >= 300000 THEN 1 ELSE 0 END
  FROM ord
  WHERE rn = 1
  UNION ALL
  SELECT o.o_custkey, o.rn,
         CAST(CASE WHEN w.bucket + o.price >= 300000 THEN 0
                   ELSE w.bucket + o.price END AS DECIMAL(18,2)),
         w.n_resets + CASE WHEN w.bucket + o.price >= 300000 THEN 1 ELSE 0 END
  FROM walk w
  JOIN ord o ON o.o_custkey = w.o_custkey AND o.rn = w.rn + 1
)
SELECT o_custkey, n_resets, CAST(bucket AS DOUBLE) AS residual
FROM (SELECT w.*, MAX(rn) OVER (PARTITION BY o_custkey) AS mx FROM walk w)
WHERE rn = mx
"""


@register(
    "recursive_capped_cumsum",
    doc=(
        "recursive CTE (Spark 4): per-customer running spend that resets at a "
        "300k cap — stateful sequential logic inexpressible with window frames "
        "(state depends on prior COMPUTED state); distributed hash-join "
        "iteration, depth = max orders per customer"
    ),
    oracle=_RECURSIVE_SQL.format(orders="orders"),
)
def recursive_capped_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(_RECURSIVE_SQL.format(orders="v_orders"))


@register(
    "sql_udf_pricing",
    doc=(
        "SQL scalar UDFs (Spark 4.1 CREATE FUNCTION ... RETURN): declarative "
        "named expressions resolved at plan time — f_charge composes f_disc, "
        "both inline into whole-stage codegen (NO serialization boundary, "
        "unlike Python UDFs); oracle inlines the same arithmetic"
    ),
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount), 6) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(round((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax), 6) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def sql_udf_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDF surface: the modern replacement for the reference's
    Python helper functions (SURVEY.md SS2.9) — named, typed, catalog-
    registered expressions with zero runtime cost. The group sums use
    round(6)->DECIMAL(24,6) staging: disc_price/charge have at most 4/6
    true decimals (2-decimal money x 2-decimal rates), so round-to-6 is
    mathematically exact and engine-stable, while round-to-12 on a 1e5
    magnitude sits past double precision and diverges in the last ULP."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION f_disc(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION f_charge(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN f_disc(p, d) * (1.0 + t)"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li_udf")
    return spark.sql(
        """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(f_disc(l_extendedprice, l_discount), 6) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(round(f_charge(l_extendedprice, l_discount, l_tax), 6) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS n
FROM v_li_udf
GROUP BY l_returnflag, l_linestatus
"""
    )


@register(
    "events_variant_extract",
    doc=(
        "VARIANT JSON (Spark 4): parse_json once into the binary variant "
        "encoding, then typed variant_get path binds — one parse per row "
        "regardless of how many paths are read (vs get_json_object re-parsing "
        "per path, which events_json_extract pins as the legacy surface)"
    ),
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(props->>'k' AS BIGINT)) AS max_k,
       COUNT(CAST(props->>'k' AS BIGINT)) AS n_k
FROM events
GROUP BY event_type
""",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.max("k").alias("max_k"), F.count("k").alias("n_k"))
    )


@register(
    "approx_topk_event_types",
    doc=(
        "approx_top_k frequent-items sketch: mergeable partial sketches "
        "(map-side combine, narrow final merge) — the scalable heavy-hitter "
        "shape; k=8 exceeds the column's true cardinality (5), so the sketch "
        "degenerates to exact counts and the GROUP BY oracle matches"
    ),
    oracle="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def approx_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type")
        .agg(F.expr("approx_top_k(event_type, 8)").alias("tk"))
        .select(F.explode("tk").alias("t"))
        .select(F.col("t.item").alias("event_type"), F.col("t.count").alias("n"))
    )


@register(
    "udtf_token_runs",
    doc=(
        "Python UDTF (LATERAL table function): maximal consecutive-token "
        "runs per document — the 1→N procedural expansion surface. The "
        "DuckDB oracle is the islands-and-gaps SQL formulation, which is "
        "also what a 100 TB run would use (UDTFs are row-at-a-time Python; "
        "see functions/udtfs.py)"
    ),
    oracle="""
WITH toks AS (
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
),
runs AS (
  SELECT doc_id, token, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id, token ORDER BY pos) AS grp
  FROM toks
)
SELECT doc_id, token, MIN(pos) AS start_pos, COUNT(*) AS run_len
FROM runs
GROUP BY doc_id, token, grp
HAVING COUNT(*) >= 2
""",
)
def udtf_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spk_sl_validation_spark.functions.udtfs import TokenRunLengths

    spark.udtf.register("token_run_lengths", TokenRunLengths)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("v_documents")
    return spark.sql(
        "SELECT d.doc_id, r.token, r.start_pos, r.run_len "
        "FROM v_documents d, LATERAL token_run_lengths(d.text) r"
    )


_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "unpivot_lineitem_measures",
    doc=(
        "unpivot/melt via the dedicated Unpivot operator: one scan emits all "
        "measure rows (vs a UNION of N scans), then exact-decimal totals per "
        "measure"
    ),
    oracle="\nUNION ALL\n".join(
        f"SELECT '{m}' AS measure, CAST(SUM(CAST({m} AS DECIMAL(18,2))) AS DOUBLE) AS total "
        f"FROM lineitem"
        for m in _MEASURES
    ),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(*[F.col(m).cast("decimal(18,2)").alias(m) for m in _MEASURES])
        .unpivot([], list(_MEASURES), "measure", "val")
        .groupBy("measure")
        .agg(F.sum("val").cast("double").alias("total"))
    )
