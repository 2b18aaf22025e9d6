"""Benchmark harness (driver contract).

Runs the registry's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a noop write (forces full computation on
the executors, no driver-side collect) — what a cluster run would
measure. Per-query time is the best of N runs after a JVM warm-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from spk_sl_validation_spark.plans.registry import headline_queries
    from spk_sl_validation_spark.session import build_session

    spark = build_session(app_name="bench")
    specs = headline_queries()

    # warm-up: JVM/codegen/filesystem caches
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import gc

    times: dict[str, float] = {}
    for name, spec in specs.items():
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.time()
            spec.builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        # Isolate measurements: drop this query's cached/checkpointed
        # RDDs before the next one. Without this, leaked session state
        # (localCheckpoint RDDs, broadcast blocks) piles up across the
        # suite and later queries pay its GC bill — measured 2.6x total
        # inflation at sf0.1 (22.9s -> 8.7s with cleanup).
        gc.collect()
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
