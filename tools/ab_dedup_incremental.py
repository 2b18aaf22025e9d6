"""Interleaved cross-revision A/B for ONE registry query (default
dedup_incremental): HEAD's repo vs a second worktree at a pinned
revision, alternating subprocess runs so host drift cancels.

Each subprocess builds its own Spark session, runs 1 unmeasured
warm-up + N measured noop-write executions of the query at sf0.1, and
prints its walls; this driver interleaves A/B/A/B... and reports
per-revision medians. JVM startup is outside the measured window.

    python tools/ab_dedup_incremental.py /tmp/ab_460f77a [query] [pairs]

Round-6 motivation (VERDICT r5 item 7): the driver artifact showed
dedup_incremental 3.082 -> 3.687 between r4/r5 driver runs; this
closes whether the nd-artifact maintenance commit (943677f) costs
anything or it was load.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

RUNNER = r'''
import json, os, sys, time
repo = sys.argv[1]; name = sys.argv[2]; runs = int(sys.argv[3])
sys.path.insert(0, repo); os.chdir(repo)
from spk_sl_validation_spark.session import build_session
spark = build_session(app_name="ab-one")
spark.sparkContext.setLogLevel("ERROR")
from spk_sl_validation_spark.plans.registry import REGISTRY, _ensure_loaded
_ensure_loaded()
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
builder = REGISTRY[name].builder
def once():
    t = time.monotonic()
    builder(spark, sf).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t
once()
print(json.dumps({"walls": [round(once(), 3) for _ in range(runs)]}))
'''


def run_once(repo: str, name: str, runs: int) -> list[float]:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(RUNNER)
        path = f.name
    try:
        out = subprocess.run(
            [sys.executable, path, repo, name, str(runs)],
            capture_output=True,
            text=True,
            timeout=900,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)["walls"]
    finally:
        os.unlink(path)


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    other = sys.argv[1]
    name = sys.argv[2] if len(sys.argv) > 2 else "dedup_incremental"
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    head = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    load1 = os.getloadavg()[0]
    a_walls: list[float] = []
    b_walls: list[float] = []
    for i in range(pairs):
        a_walls += run_once(head, name, 2)
        b_walls += run_once(other, name, 2)
        print(f"pair {i + 1}: head {a_walls[-2:]} other {b_walls[-2:]}", flush=True)
    print(
        json.dumps(
            {
                "query": name,
                "head_median_s": round(statistics.median(a_walls), 3),
                "other_median_s": round(statistics.median(b_walls), 3),
                "head_walls": a_walls,
                "other_walls": b_walls,
                "other_repo": other,
                "load1_at_start": round(load1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
