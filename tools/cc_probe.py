"""Connected-components probe: alternating-stars contraction vs
min-label propagation on synthetic 10M-edge graphs, with a measured
diameter crossover for the dispatch advice in `dedup_clusters`.

Two graph families (both Spark-generated, no driver loops):

- ``path:<d>``  — disjoint path components of diameter ``d``; total
  edge count fixed at --edges, so component count = edges/d.
  Propagation needs exactly d rounds; stars needs ~2·log2(d).
- ``expander``  — one hash-random graph (edges over edges/3 nodes,
  expected diameter O(log n)) — the benign near-dup-family shape.

For each (graph, method) the probe reports wall seconds, rounds, and
TOTAL shuffle write bytes read from the Spark UI REST API (stages
completed during the run; the UI is enabled just for this probe).
Per-round relation sizes are the structural story: propagation
re-joins the full static symmetric edge set every round, stars
contracts it.

    python tools/cc_probe.py --edges 10000000 --diameters 2,4,8,16,32

Output: one JSON line per (graph, method) run → SCALE.md §7.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _completed_shuffle_bytes(spark) -> tuple[int, int]:
    """(max stage id, total shuffle write bytes) over completed stages."""
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    if not stages:
        return (-1, 0)
    return (
        max(s["stageId"] for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def path_edges(spark, n_edges: int, diameter: int):
    """Disjoint paths: component c owns nodes c*(d+1) .. c*(d+1)+d."""
    from pyspark.sql import functions as F

    d = diameter
    return (
        spark.range(n_edges)
        .select(
            ((F.col("id") / d).cast("long") * (d + 1) + F.col("id") % d).alias("src"),
            ((F.col("id") / d).cast("long") * (d + 1) + F.col("id") % d + 1).alias("dst"),
        )
    )


def expander_edges(spark, n_edges: int):
    from pyspark.sql import functions as F

    n_nodes = max(2, n_edges // 3)
    return spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(n_nodes)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))


def symmetrize(edges):
    from pyspark.sql import functions as F

    return (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )


def propagate(sym_edges, max_rounds: int) -> tuple[int, int]:
    """Min-label propagation — the SHARED production implementation
    (`ext/graph.py min_label_propagation`, the same loop
    `dedup_clusters(method='propagate')` executes), so the probe
    measures the real operator, not a replica."""
    from spk_sl_validation_spark.ext.graph import min_label_propagation

    labels, rounds = min_label_propagation(sym_edges, max_rounds)
    return rounds, labels.count()


def main() -> None:
    n_edges = 10_000_000
    diameters = [2, 4, 8, 16, 32]
    run_expander = True
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--edges" and i + 1 < len(args):
            n_edges = int(args[i + 1])
        if a == "--diameters" and i + 1 < len(args):
            diameters = [int(x) for x in args[i + 1].split(",") if x]
        if a == "--no-expander":
            run_expander = False

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    from spk_sl_validation_spark.ext.graph import connected_components_stars
    from spk_sl_validation_spark.session import build_session

    spark = build_session(
        app_name="cc-probe",
        extra_conf={
            "spark.sql.shuffle.partitions": "256",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    graphs: list[tuple[str, object, int]] = []
    for d in diameters:
        graphs.append((f"path:{d}", path_edges(spark, n_edges, d), d + 2))
    if run_expander:
        graphs.append(("expander", expander_edges(spark, n_edges), 64))

    for name, edges, prop_rounds in graphs:
        sym = symmetrize(edges)
        n_sym = sym.count()
        for method in ("stars", "propagate"):
            _, before = _completed_shuffle_bytes(spark)
            t0 = time.monotonic()
            if method == "stars":
                labels, rounds = connected_components_stars(sym, max_rounds=60)
                n_labels = labels.count()
            else:
                rounds, n_labels = propagate(sym, prop_rounds)
            wall = time.monotonic() - t0
            _, after = _completed_shuffle_bytes(spark)
            print(
                json.dumps(
                    {
                        "graph": name,
                        "method": method,
                        "edges_sym": n_sym,
                        "rounds": rounds,
                        "wall_s": round(wall, 1),
                        "shuffle_write_gb": round((after - before) / 1e9, 2),
                        "n_labels": n_labels,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
