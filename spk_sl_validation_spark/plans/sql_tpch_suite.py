"""Full TPC-H pattern coverage via the SQL-string API.

Together with ``pricing_summary`` (Q1 shape, DataFrame API) and
``sql_api_queries`` (Q3/Q17/Q18/Q22), this module completes all 22
TPC-H query patterns. The driver testdata is a *reduced* TPC-H schema
(no partsupp; lineitem lacks commitdate/receiptdate/shipmode; part
lacks container/mfgr), so each query keeps the original's *plan shape*
— the join topology, subquery style, and aggregation pattern that
exercise a distinct Catalyst path — with predicates adapted to the
available columns. Reference parity note: the reference
(SL_SPK_Cleansing.py:84-123 etc.) drives everything through an
imperative pandas surface; this suite pins the equivalent declarative
surface (spark.sql over registered views → same Catalyst plans as the
DataFrame API).

Determinism: money sums go through exact DECIMAL and cast to DOUBLE at
the end; divisions happen in DOUBLE on already-exact operands; every
LIMIT has a totally-ordered ORDER BY. The same SQL text runs on Spark
(against v_* temp views) and DuckDB (against the parquet views), so
the oracle is definitionally the same computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table

_REV = "CAST(SUM(CAST({a}.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST({a}.l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

_SUITE: list[tuple[str, str, tuple[str, ...], str]] = []


def _q(name: str, doc: str, tables: tuple[str, ...], sql: str) -> None:
    _SUITE.append((name, doc, tables, sql))


_q(
    "sql_tpch_q2",
    "TPC-H Q2 shape: correlated scalar MIN subquery (cheapest supplier per "
    "part) — Catalyst decorrelates to an aggregate + join; DISTINCT absorbs "
    "lineitem fan-out. Equality is on raw stored doubles (no arithmetic), so "
    "cross-engine comparison is exact",
    ("part", "supplier", "lineitem"),
    """
SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
       CAST(s.s_acctbal AS DOUBLE) AS s_bal
FROM {part} p
JOIN {lineitem} l ON l.l_partkey = p.p_partkey
JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size <= 5
  AND s.s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM {lineitem} l2
    JOIN {supplier} s2 ON s2.s_suppkey = l2.l_suppkey
    WHERE l2.l_partkey = p.p_partkey
  )
""",
)

_q(
    "sql_tpch_q4",
    "TPC-H Q4 shape: correlated EXISTS over the fact (→ left-semi join), "
    "priority order counts; 'late' adapted to shipdate > orderdate + 60d "
    "(schema has no commit/receipt dates)",
    ("orders", "lineitem"),
    """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM {orders} o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM {lineitem} l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
""",
)

_q(
    "sql_tpch_q5",
    "TPC-H Q5 shape: 6-way snowflake join (region→nation→supplier ⋈ "
    "customer→orders→lineitem) with the local-supplier constraint "
    "s_nationkey = c_nationkey folded into the join; dims broadcast",
    ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    f"""
SELECT n.n_name, {_REV.format(a="l")} AS revenue
FROM {{customer}} c
JOIN {{orders}} o ON o.o_custkey = c.c_custkey
JOIN {{lineitem}} l ON l.l_orderkey = o.o_orderkey
JOIN {{supplier}} s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN {{nation}} n ON n.n_nationkey = s.s_nationkey
JOIN {{region}} r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
)

_q(
    "sql_tpch_q6",
    "TPC-H Q6 shape: single-scan filtered aggregate — every predicate "
    "pushes to the parquet scan (range on shipdate, BETWEEN on discount, "
    "bound on quantity), then one exact-decimal sum",
    ("lineitem",),
    """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM {lineitem}
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)

_q(
    "sql_tpch_q7",
    "TPC-H Q7 shape: bi-directional nation-pair volume — two aliases of the "
    "same dim (n1/n2) with an OR of pair constraints, year extraction, "
    "grouped exact-decimal volume",
    ("supplier", "lineitem", "orders", "customer", "nation"),
    """
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM {supplier} s
  JOIN {lineitem} l ON l.l_suppkey = s.s_suppkey
  JOIN {orders} o ON o.o_orderkey = l.l_orderkey
  JOIN {customer} c ON c.c_custkey = o.o_custkey
  JOIN {nation} n1 ON n1.n_nationkey = s.s_nationkey
  JOIN {nation} n2 ON n2.n_nationkey = c.c_nationkey
  WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_11')
     OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9')
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)

_q(
    "sql_tpch_q8",
    "TPC-H Q8 shape: market share — 8-way join, conditional share of an "
    "exact-decimal sum; the division happens in DOUBLE on operands that are "
    "bit-identical across engines",
    ("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
    """
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN nation = 'NATION_9' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS nation
  FROM {part} p
  JOIN {lineitem} l ON l.l_partkey = p.p_partkey
  JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
  JOIN {orders} o ON o.o_orderkey = l.l_orderkey
  JOIN {customer} c ON c.c_custkey = o.o_custkey
  JOIN {nation} n1 ON n1.n_nationkey = c.c_nationkey
  JOIN {region} r ON r.r_regionkey = n1.n_regionkey
  JOIN {nation} n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
) all_nations
GROUP BY o_year
""",
)

_q(
    "sql_tpch_q9",
    "TPC-H Q9 shape: product-line profit by nation×year; supplycost adapted "
    "to p_retailprice×quantity (no partsupp). DECIMAL(12,2) factors keep "
    "every intermediate inside precision 38 with no scale loss",
    ("part", "supplier", "lineitem", "orders", "nation"),
    """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
           - CAST(p.p_retailprice AS DECIMAL(12,2))
           * CAST(l.l_quantity AS DECIMAL(12,2)) AS amount
  FROM {part} p
  JOIN {lineitem} l ON l.l_partkey = p.p_partkey
  JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
  JOIN {orders} o ON o.o_orderkey = l.l_orderkey
  JOIN {nation} n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
)

_q(
    "sql_tpch_q10",
    "TPC-H Q10 shape: returned-item reporting — top 20 customers by lost "
    "revenue in a quarter; ORDER BY is totally ordered (revenue, custkey) so "
    "LIMIT is deterministic",
    ("customer", "orders", "lineitem", "nation"),
    f"""
SELECT c.c_custkey, c.c_name, {_REV.format(a="l")} AS revenue,
       CAST(c.c_acctbal AS DOUBLE) AS acctbal, n.n_name
FROM {{customer}} c
JOIN {{orders}} o ON o.o_custkey = c.c_custkey
JOIN {{lineitem}} l ON l.l_orderkey = o.o_orderkey
JOIN {{nation}} n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)

_q(
    "sql_tpch_q11",
    "TPC-H Q11 shape: groups exceeding a fraction-of-total scalar subquery "
    "in HAVING (supplier shipped-value concentration within one nation); "
    "both sides of the comparison stay exact DECIMAL",
    ("lineitem", "supplier", "nation"),
    """
SELECT l.l_suppkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM {lineitem} l
JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
JOIN {nation} n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_9'
GROUP BY l.l_suppkey
HAVING SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) > (
  SELECT SUM(CAST(l2.l_extendedprice AS DECIMAL(18,2))) * CAST(0.05 AS DECIMAL(6,4))
  FROM {lineitem} l2
  JOIN {supplier} s2 ON s2.s_suppkey = l2.l_suppkey
  JOIN {nation} n2 ON n2.n_nationkey = s2.s_nationkey
  WHERE n2.n_name = 'NATION_9'
)
""",
)

_q(
    "sql_tpch_q12",
    "TPC-H Q12 shape: two-bucket conditional counts per category (shipmode "
    "adapted to priority classes; late-shipment predicate correlates the "
    "two fact tables before grouping)",
    ("orders", "lineitem"),
    """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM {orders} o
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
GROUP BY l.l_linestatus
""",
)

_q(
    "sql_tpch_q13",
    "TPC-H Q13 shape: customer order-count distribution — left outer join "
    "with a predicate in the join condition (not the WHERE, which would "
    "drop the NULL-extended rows), then a second aggregation over the first",
    ("customer", "orders"),
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM {customer} c
  LEFT JOIN {orders} o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)

_q(
    "sql_tpch_q14",
    "TPC-H Q14 shape: promo revenue share — conditional vs unconditional "
    "exact-decimal sums over one join, percentage computed in DOUBLE",
    ("lineitem", "part"),
    """
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
              THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS DOUBLE) AS promo_revenue
FROM {lineitem} l
JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
""",
)

_q(
    "sql_tpch_q15",
    "TPC-H Q15 shape: top supplier — a CTE revenue view consumed twice "
    "(join probe + scalar MAX); equality compares doubles derived from the "
    "same exact decimal sum, so it is stable across engines",
    ("lineitem", "supplier"),
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM {lineitem}
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM {supplier} s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)

_q(
    "sql_tpch_q16",
    "TPC-H Q16 shape: supplier-count per part attribute triple with a "
    "NOT IN anti-subquery (negative-balance suppliers stand in for the "
    "complaints filter) and COUNT(DISTINCT) — lineitem stands in for partsupp",
    ("part", "lineitem", "supplier"),
    """
SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM {part} p
JOIN {lineitem} l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM {supplier} WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)

_q(
    "sql_tpch_q19",
    "TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity bands "
    "— the classic OR-of-ANDs predicate Catalyst must keep join-pushable "
    "(common p_partkey equi-condition extracted, residual OR as filter)",
    ("lineitem", "part"),
    f"""
SELECT {_REV.format(a="l")} AS revenue
FROM {{lineitem}} l
JOIN {{part}} p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)

_q(
    "sql_tpch_q20",
    "TPC-H Q20 shape: nested IN subqueries — suppliers who shipped >400 "
    "units of 'small%' parts in a year (part-filter IN inside a grouped "
    "HAVING IN); exact-decimal quantity threshold",
    ("supplier", "lineitem", "part"),
    """
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_bal
FROM {supplier} s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM {lineitem} l
  WHERE l.l_partkey IN (SELECT p_partkey FROM {part} WHERE p_name LIKE 'small%')
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l.l_suppkey
  HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 400
)
""",
)

_q(
    "sql_tpch_q21",
    "TPC-H Q21 shape: suppliers who kept orders waiting — EXISTS (another "
    "supplier on the order) plus correlated NOT EXISTS (no OTHER supplier "
    "late) against the same fact; 'late' adapted to shipdate > orderdate+60d",
    ("supplier", "lineitem", "orders"),
    """
SELECT s.s_name, COUNT(*) AS numwait
FROM {supplier} s
JOIN {lineitem} l1 ON l1.l_suppkey = s.s_suppkey
JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM {lineitem} l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM {lineitem} l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)


def _make_builder(sql: str, tables: tuple[str, ...]):
    def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
        return spark.sql(sql.format(**{t: f"v_{t}" for t in tables}))

    return builder


for _name, _doc, _tables, _sql in _SUITE:
    register(_name, oracle=_sql.format(**{t: t for t in _tables}), doc=_doc)(
        _make_builder(_sql, _tables)
    )
