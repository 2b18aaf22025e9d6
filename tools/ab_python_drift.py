"""Verdict r10 task #3: attribute the Python-worker-bound driver
drift (text_quality 0.626→0.865 = 2.10× its r1 anchor,
text_quality_train +36%, text_bigram_logprob +39%,
similarity_topk_bruteforce +34%, multimodal_jpeg_pixel_stats
5.069→6.382) while the JVM calibrator moved 1.02×.

git diff febea43..4689556 over ext/text.py, plans/text_queries.py,
ext/similarity.py, ext/multimodal.py shows ONLY appended round-10
functions plus a moved constant block — the five queries ran
byte-identical code in both driver benches, so (as with the r10
dedup-drift closure) the open question is host-session variance, now
specifically PYTHON-WORKER variance a JVM calibrator cannot see.
This probe interleaves the five queries for N rounds in ONE session
(same noop-write protocol as bench.py) bracketed by the bench.py
Python-worker calibrator (run first AND last), and prints per-query
min/median/max/stdev plus both calibrator readings.

Run near-idle: python tools/ab_python_drift.py [rounds]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "text_quality",
    "text_quality_train",
    "text_bigram_logprob",
    "similarity_topk_bruteforce",
    "multimodal_jpeg_pixel_stats",
)
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import gc

    from bench import _py_worker_calibrator
    from spk_sl_validation_spark.plans.registry import REGISTRY, _ensure_loaded
    from spk_sl_validation_spark.session import build_session

    spark = build_session(app_name="ab-python-drift")
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_loaded()
    load1 = os.getloadavg()[0]
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    cal_start = _py_worker_calibrator(spark, 3)
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
    cal_end = _py_worker_calibrator(spark, 3)

    print(f"load1_at_start={load1:.2f} rounds={ROUNDS} sf_dir={SF_DIR}")
    print(f"py_worker_calibrator start={cal_start} end={cal_end}")
    for q in QUERIES:
        s = samples[q]
        print(
            f"{q:28s} min={min(s):.3f} median={statistics.median(s):.3f} "
            f"max={max(s):.3f} stdev={statistics.stdev(s):.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
