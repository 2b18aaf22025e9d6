"""Graph centrality query: PageRank over the event-transition graph.

The DuckDB oracle replays the identical computation — same edge
derivation (per-user lag with a unique tiebreak), same damping, same
dangling-mass redistribution, and the same per-step round(…, 12)
re-synchronization — as unrolled CTEs, one pair (inflow, dangling)
per power iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spk_sl_validation_spark.ext.graph import DAMPING, ITERATIONS, pagerank, transition_edges
from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table


def _pagerank_oracle(damping: float = DAMPING, iterations: int = ITERATIONS) -> str:
    steps = []
    for i in range(1, iterations + 1):
        prev = f"r{i - 1}"
        steps.append(
            f"""inf{i} AS (
  SELECT e.dst AS node,
         CAST(sum(CAST(round(r.rank * e.w / o.out_w, 12) AS DECIMAL(28,12))) AS DOUBLE)
           AS inflow
  FROM edges e
  JOIN outw o ON o.src = e.src
  JOIN {prev} r ON r.node = e.src
  GROUP BY e.dst
),
dang{i} AS (
  SELECT coalesce(CAST(sum(CAST(r.rank AS DECIMAL(28,12))) AS DOUBLE), 0.0) AS dm
  FROM {prev} r
  WHERE r.node NOT IN (SELECT src FROM edges)
),
r{i} AS (
  SELECT n.node,
         round((1.0 - {damping}) / nn.n
               + {damping} * (coalesce(f.inflow, 0.0) + d.dm / nn.n), 12) AS rank
  FROM nodes n
  LEFT JOIN inf{i} f ON f.node = n.node
  CROSS JOIN nn
  CROSS JOIN dang{i} d
)"""
        )
    iter_ctes = ",\n".join(steps)
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
edges AS (
  SELECT prev AS src, event_type AS dst, CAST(count(*) AS DOUBLE) AS w
  FROM seq WHERE prev IS NOT NULL
  GROUP BY 1, 2
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
r0 AS (SELECT node, round(1.0 / nn.n, 12) AS rank FROM nodes CROSS JOIN nn),
{iter_ctes}
SELECT node, round(rank, 6) AS rank FROM r{iterations}
"""


@register(
    "graph_pagerank_events",
    doc=(
        "link-style centrality for corpus curation: per-user consecutive-event "
        "transition edges (lag window + count), then weighted PageRank with "
        f"dangling redistribution, {ITERATIONS} unrolled power iterations at "
        f"d={DAMPING} — edge derivation is the 100 TB stage, iterations join "
        "the small aggregated graph"
    ),
    oracle=_pagerank_oracle(),
)
def graph_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return pagerank(transition_edges(events))
