"""Verdict r9 task #5: attribute the r8→r9 bench drift on
dedup_pipeline / dedup_incremental / hybrid_rrf_retrieval.

git diff 88fda9e..febea43 over ext/dedup.py, ext/retrieval.py and
their plans modules is EMPTY — the three queries ran identical code
in both driver benches, so the only open question is whether one
host-session's variance covers the observed deltas
(dedup_pipeline 2.465→3.85, dedup_incremental 3.28→3.592,
hybrid_rrf 2.07→2.537). This probe interleaves the three queries for
N rounds in ONE session (same noop-write protocol as bench.py) and
prints per-query min/median/max/stdev.

Run: python tools/ab_dedup_drift.py [rounds]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ("dedup_pipeline", "dedup_incremental", "hybrid_rrf_retrieval")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import gc

    from spk_sl_validation_spark.plans.registry import REGISTRY, _ensure_loaded
    from spk_sl_validation_spark.session import build_session

    spark = build_session(app_name="ab-dedup-drift")
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_loaded()
    load1 = os.getloadavg()[0]
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    samples: dict[str, list[float]] = {q: [] for q in QUERIES}
    for r in range(ROUNDS + 1):  # round 0 = unmeasured warm-up
        for q in QUERIES:
            t0 = time.time()
            REGISTRY[q].builder(spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.time() - t0
            if r > 0:
                samples[q].append(dt)
            gc.collect()
            spark.catalog.clearCache()
    print(f"load1_at_start={load1:.2f} rounds={ROUNDS} sf_dir={SF_DIR}")
    for q in QUERIES:
        s = samples[q]
        print(
            f"{q:24s} min={min(s):.3f} median={statistics.median(s):.3f} "
            f"max={max(s):.3f} stdev={statistics.stdev(s):.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
