"""Dump `.explain("formatted")` for headline queries into plans/r<N>/.

    python tools/dump_round_plans.py r12 before [query ...]

Writes plans/r12/<query>_before.txt for each named query (default: all
headline queries). The static optimized plan (isFinalPlan=false) is
what the plan-budget pins check; the judge diffs these files against
the claims in OPTIMIZATION_r<N>.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rnd, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    from spk_sl_validation_spark.plans.registry import headline_queries
    from spk_sl_validation_spark.session import build_session

    spark = build_session(app_name=f"dump_round_plans_{rnd}_{tag}")
    specs = headline_queries()
    if not names:
        names = list(specs)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].builder(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write("== Physical Plan ==\n" if not plan.startswith("==") else "")
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
