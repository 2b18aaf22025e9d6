"""SQL-string API surface: the engine is equally drivable via
``spark.sql`` over registered views — same Catalyst plans as the
DataFrame API. One representative multi-join analytical query (TPC-H
Q3 shape) pins the surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table

_Q3 = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM {customer} c
JOIN {orders} o ON c.c_custkey = o.o_custkey
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
"""


@register(
    "sql_tpch_q3",
    doc="SQL-string API: TPC-H Q3 shape via spark.sql over registered views (same Catalyst plan as DataFrame API)",
    oracle=_Q3.format(customer="customer", orders="orders", lineitem="lineitem"),
)
def sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(_Q3.format(customer="v_customer", orders="v_orders", lineitem="v_lineitem"))


_Q17 = """
SELECT p.p_brand,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_lines
FROM {lineitem} l
JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM {lineitem} l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


@register(
    "sql_tpch_q17",
    doc=(
        "SQL-string API: TPC-H Q17 shape — correlated scalar subquery (per-part avg) that "
        "Catalyst decorrelates into an aggregate + join, no per-row re-scan. AVG is exact "
        "here (integral quantities sum exactly in double), so the threshold is deterministic"
    ),
    oracle=_Q17.format(lineitem="lineitem", part="part"),
)
def sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("lineitem", "part"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(_Q17.format(lineitem="v_lineitem", part="v_part"))
