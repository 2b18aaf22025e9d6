"""Benchmark harness (driver contract).

Runs the registry's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a noop write (forces full computation on
the executors, no driver-side collect) — what a cluster run would
measure.

Attributability (round-3 contract): per query, one unmeasured warm-up
run (JVM/codegen/file-index warm) followed by ``BENCH_RUNS`` measured
runs. ``queries`` reports per-query MEDIANS (the headline ``value`` is
their sum — robust to one-off host hiccups); ``queries_detail`` adds
min and spread per query and ``host`` fingerprints the machine, so a
cross-round delta can be attributed to a plan change vs host drift by
ratio, not guesswork. BENCH_HISTORY.md keeps one row per round.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Pinned measured-run count (after 1 unmeasured warm-up per query).
RUNS = int(os.environ.get("BENCH_RUNS", "3"))

# Sampled at IMPORT time, before the Spark JVM and warm-up runs exist:
# sampling at fingerprint-build time reads the bench's own load
# (measured >=1.7 even from a 0.04-load shell), making the committed
# load1 context useless for drift attribution.
try:
    _LOAD1_AT_LAUNCH: float | None = round(os.getloadavg()[0], 2)
except OSError:
    _LOAD1_AT_LAUNCH = None


def _host_fingerprint() -> dict:
    import platform
    import subprocess

    import pyspark

    try:
        rev = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        ).stdout.strip()
    except Exception:
        rev = ""
    load1 = _LOAD1_AT_LAUNCH
    return {
        "cpus": os.cpu_count(),
        "platform": platform.platform(),
        "python": platform.python_version(),
        "pyspark": pyspark.__version__,
        "spark_cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        # attribution: which code produced the numbers, and how busy the
        # host was at measurement start (day-to-day drift has measured
        # 2x+ on this box — per-query deltas without a rev+load context
        # are uninterpretable).
        "git_rev": rev,
        "load1_at_start": load1,
    }


def _py_worker_calibrator(spark, runs: int) -> dict:
    """Fixed-size Arrow/pandas_udf workload, sf-INDEPENDENT: 4M longs
    through a numpy pipeline in 32 partitions, noop-written like every
    query. pricing_summary calibrates JVM-side host drift, but a
    JVM-only calibrator cannot see Python-WORKER contention (fork/
    spawn latency, Arrow transfer, numpy throughput) — the r10 driver
    bench moved the pandas_udf-bound family 1.2-1.4x while the JVM
    calibrator moved 1.02x, and this number is what attributes that.
    """
    import pandas as pd  # noqa: F401 — resolved by get_type_hints below
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _mix_impl(v):
        import numpy as np

        x = v.to_numpy(dtype="float64")
        for _ in range(8):
            x = np.sqrt(x * 1.0000001 + 1.0)
        return pd.Series(x)

    # annotations set explicitly (not inline) because this module uses
    # `from __future__ import annotations`: stringized inline hints
    # fail pandas_udf's type inference for locally-imported pandas
    _mix_impl.__annotations__ = {"v": pd.Series, "return": pd.Series}
    _mix = pandas_udf(_mix_impl, "double")

    samples: list[float] = []
    for run in range(runs + 1):  # run 0 = unmeasured warm-up
        t0 = time.time()
        (
            spark.range(0, 4_000_000, 1, 32)
            .select(_mix(F.col("id")).alias("v"))
            .selectExpr("sum(v) AS s")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        if run > 0:
            samples.append(time.time() - t0)
    return {
        "median": round(statistics.median(samples), 3),
        "min": round(min(samples), 3),
        "max": round(max(samples), 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from spk_sl_validation_spark.plans.registry import headline_queries
    from spk_sl_validation_spark.session import build_session

    spark = build_session(app_name="bench")
    specs = headline_queries()

    # warm-up: JVM/codegen/filesystem caches
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Python-worker calibrator BEFORE the query loop (it also warms
    # the Python worker pool the pandas_udf queries reuse).
    py_cal = _py_worker_calibrator(spark, RUNS)

    import gc

    def _cleanup() -> None:
        # Isolate measurements: drop cached/checkpointed RDDs and
        # broadcast blocks between runs. Without this, leaked session
        # state piles up across the suite and later queries pay its GC
        # bill — measured 2.6x total inflation at sf0.1.
        gc.collect()
        spark.catalog.clearCache()

    medians: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name, spec in specs.items():
        samples: list[float] = []
        warmup_s = 0.0
        for run in range(RUNS + 1):  # run 0 = unmeasured warm-up
            t0 = time.time()
            spec.builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            if run > 0:
                samples.append(dt)
            else:
                warmup_s = dt
            _cleanup()
        med = statistics.median(samples)
        medians[name] = round(med, 3)
        detail[name] = {
            "median": round(med, 3),
            "min": round(min(samples), 3),
            "max": round(max(samples), 3),
            "stdev": round(statistics.stdev(samples), 3) if len(samples) > 1 else 0.0,
            # honesty field (r12, verdict item 8): run 0's wall. Any
            # one-time session-scoped cost a query amortizes — JVM/
            # codegen warm-up, per-session fixture-manifest builds
            # (webcure_queries._materialized) — lands HERE, visibly,
            # instead of silently vanishing from the medians.
            "warmup_s": round(warmup_s, 3),
        }

    host = _host_fingerprint()
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Detailed line first; the compact contract line LAST. The driver keeps a
    # byte-bounded tail of stdout, which truncated the head of the single long
    # line in r5/r6 ("parsed": null) — a short final line always survives the
    # tail capture intact.
    print(
        json.dumps(
            {
                "metric": "headline_queries_detail",
                "queries_detail": detail,
                "py_worker_calibrator": py_cal,
                "runs": RUNS,
                "aggregation": "median",
                "host": host,
                "sf": sf_val,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(sum(medians.values()), 3),
                "unit": "sec",
                "queries": medians,
                "py_worker_calibrator": py_cal["median"],
                "sf": sf_val,
                "git_rev": host.get("git_rev"),
                "runs": RUNS,
                "aggregation": "median",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
