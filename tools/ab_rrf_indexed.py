"""Same-session interleaved A/B: hybrid_rrf_retrieval (direct, two
corpus-text scans per query batch) vs hybrid_rrf_rank_indexed reading
PERSISTED index artifacts (zero corpus work at query time).

Index build/persist happens OUTSIDE the timed window — that is the
point of the indexed path: the artifacts are a one-time (mergeable)
cost amortized over repeated query batches. Alternating D/I runs in
one session cancel host drift; medians of N printed as one JSON line.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "5"))


def main() -> None:
    # sample BEFORE the Spark JVM exists (same flaw class bench.py fixed:
    # sampling later reads the benchmark's own load)
    load1_at_launch = os.getloadavg()[0]

    from spk_sl_validation_spark.session import build_session

    spark = build_session(app_name="ab-rrf-indexed")
    spark.sparkContext.setLogLevel("ERROR")

    from spk_sl_validation_spark.ext.retrieval import (
        bm25_doc_term_counts,
        bm25_index_tables,
        hybrid_rrf_rank_indexed,
    )
    from spk_sl_validation_spark.plans.registry import REGISTRY, _ensure_loaded
    from spk_sl_validation_spark.plans.retrieval_queries import (
        BM25_QUERIES,
        RRF_K,
        RRF_POOL,
        RRF_TOP_K,
    )
    from spk_sl_validation_spark.sources.readers import load_table
    from spk_sl_validation_spark.sources.sinks import write_clustered

    _ensure_loaded()

    # persisted artifacts are scratch for this A/B only — reclaim on
    # exit (atexit rather than try/finally so a Ctrl-C mid-run still
    # cleans up after the JVM shuts down)
    tmp = tempfile.mkdtemp(prefix="rrf_idx_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    docs = load_table(spark, SF_DIR, "documents")
    postings, df_tbl, stats = bm25_index_tables(docs)
    write_clustered(postings, f"{tmp}/postings", ["term"], n_files=8)
    df_tbl.write.parquet(f"{tmp}/df")
    stats.write.parquet(f"{tmp}/stats")
    bm25_doc_term_counts(postings).write.parquet(f"{tmp}/nd")

    p2 = spark.read.parquet(f"{tmp}/postings")
    d2 = spark.read.parquet(f"{tmp}/df")
    s2 = spark.read.parquet(f"{tmp}/stats")
    n2 = spark.read.parquet(f"{tmp}/nd")

    def direct_df():
        return REGISTRY["hybrid_rrf_retrieval"].builder(spark, SF_DIR)

    def indexed_df():
        return hybrid_rrf_rank_indexed(
            BM25_QUERIES, p2, d2, s2, n2, rrf_k=RRF_K, pool=RRF_POOL, top_k=RRF_TOP_K
        )

    def run_direct() -> int:
        return direct_df().count()

    def run_indexed() -> int:
        return indexed_df().count()

    # warm-up (page cache, codegen) doubling as a VALUE cross-check —
    # a row-count compare would pass by construction (both return
    # top_k rows per query)
    assert sorted(map(tuple, direct_df().collect())) == sorted(
        map(tuple, indexed_df().collect())
    )
    direct_walls, indexed_walls = [], []
    for _ in range(RUNS):
        t = time.monotonic()
        run_direct()
        direct_walls.append(time.monotonic() - t)
        t = time.monotonic()
        run_indexed()
        indexed_walls.append(time.monotonic() - t)

    d_med = statistics.median(direct_walls)
    i_med = statistics.median(indexed_walls)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "runs": RUNS,
                "direct_median_s": round(d_med, 3),
                "indexed_median_s": round(i_med, 3),
                "speedup": round(d_med / i_med, 2),
                "direct_walls": [round(w, 3) for w in direct_walls],
                "indexed_walls": [round(w, 3) for w in indexed_walls],
                "load1_at_start": load1_at_launch,
            }
        )
    )


if __name__ == "__main__":
    main()
