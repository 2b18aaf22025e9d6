"""Index-churn probe: BM25 deletion (negated merge) vs full rebuild
at corpus scale — the measurement behind remove_from_bm25_index's
claim that deletion cost rides the removed slice + one index pass
(no text re-tokenization) while a rebuild re-pays the whole corpus.

    python tools/index_churn_probe.py --docs 2000000 --remove 100000

Index artifacts are materialized (localCheckpoint) OUTSIDE the timed
windows — both paths start from the same at-rest-equivalent state.
Output: one JSON line per timed path → SCALE.md §7.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = 2_000_000
    n_remove = 100_000
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--docs" and i + 1 < len(args):
            n_docs = int(args[i + 1])
        if a == "--remove" and i + 1 < len(args):
            n_remove = int(args[i + 1])

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    from pyspark.sql import functions as F

    from spk_sl_validation_spark.ext.retrieval import (
        bm25_index_tables,
        remove_from_bm25_index,
    )
    from spk_sl_validation_spark.session import build_session
    from tools.scale_probe import synth_docs

    spark = build_session(
        app_name="index-churn-probe", extra_conf={"spark.sql.shuffle.partitions": "256"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n_docs).localCheckpoint(eager=True)
    postings, df_tbl, stats = bm25_index_tables(docs)
    postings = postings.localCheckpoint(eager=True)
    df_tbl = df_tbl.localCheckpoint(eager=True)
    stats = stats.localCheckpoint(eager=True)
    n_postings = postings.count()

    # every synth doc has >=1 posting row, so the stride batch is valid
    remove_ids = docs.select("doc_id").filter(
        F.col("doc_id") % (n_docs // n_remove) == 1
    )

    def materialize(dfs) -> None:
        for d in dfs:
            d.write.format("noop").mode("overwrite").save()

    t0 = time.monotonic()
    removed = remove_from_bm25_index(postings, df_tbl, stats, remove_ids)
    materialize(removed)
    remove_wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "op": "remove_from_bm25_index",
                "docs": n_docs,
                "removed": n_remove,
                "postings_rows": n_postings,
                "wall_s": round(remove_wall, 1),
            }
        ),
        flush=True,
    )

    survivors = docs.join(
        remove_ids.hint("shuffle_hash"), "doc_id", "left_anti"
    ).localCheckpoint(eager=True)
    t0 = time.monotonic()
    rebuilt = bm25_index_tables(survivors)
    materialize(rebuilt)
    rebuild_wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "op": "rebuild_bm25_index",
                "docs": n_docs - n_remove,
                "wall_s": round(rebuild_wall, 1),
                "remove_speedup": round(rebuild_wall / max(remove_wall, 1e-9), 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
