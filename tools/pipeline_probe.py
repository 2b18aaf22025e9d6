"""End-to-end training-corpus-pipeline probe with per-stage
shuffle-byte accounting (SCALE.md §7).

Runs the COMPOSED pipeline (quality gate → LSH near-dup dedup →
mixture sampling → sequence packing; plans/assembly_queries.py
compose_training_pipeline) on a synthetic corpus 2–3 orders of
magnitude past bench scale, with the Spark UI's REST API recording
shuffle read/write bytes for every stage. The claim under test is the
repo's central scale rule, COMPOSED rather than per-operator: the
corpus text is never shuffled — signatures, ids, and metadata rows
shuffle instead — so total shuffle bytes stay a small fraction of
corpus text bytes no matter how the stages stack.

Synthetic corpus: n docs, 20 sources (mixture weights exercise all 4
bands), ~8% short docs (< 30 tokens — the quality gate drops them),
10% exact duplicates and 5% near duplicates (dedup pressure),
xxhash64-mixed 40-word bodies (no accidental cross-doc overlap).

Usage: python tools/pipeline_probe.py [--docs 10000000]
Prints one JSON line: totals, per-stage top shuffle writers, and the
shuffle-to-corpus byte ratio.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

UI_PORT = 4077


def synth_corpus(spark, n: int):
    base = spark.range(n).withColumnRenamed("id", "doc_id")

    def body(seed_col, n_words=40):
        return F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    F.xxhash64(
                        F.concat(seed_col.cast("string"), F.lit(f"_{i}"))
                    ).cast("string"),
                )
                for i in range(n_words)
            ],
        )

    is_short = F.col("doc_id") % 12 == 11          # ~8%: fails the ≥30-token gate
    is_exact = (F.col("doc_id") % 10 == 9) & (F.col("doc_id") % 7 != 0)   # ~10%
    is_near = F.col("doc_id") % 20 == 10           # 5%
    base_id = F.col("doc_id") - (F.col("doc_id") % 7)
    text = (
        F.when(is_short, body(F.col("doc_id"), 8))
        .when(is_exact, body(base_id))
        .when(is_near, F.concat(body(base_id), F.lit(" tail"), F.col("doc_id").cast("string")))
        .otherwise(body(F.col("doc_id")))
    )
    src = F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
    return base.select("doc_id", src.alias("source"), text.alias("text"))


def rest_stages(app_id: str) -> list[dict]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def rest_jobs(app_id: str) -> list[dict]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/jobs"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())




def legacy_compose(docs):
    """The pre-round-7 composition: the keep semi-join carries the
    TEXT-bearing relation and packing re-tokenizes after the join —
    the corpus-shuffle anti-pattern the metadata-join restructure
    removed. Kept here as the A/B arm that quantifies the fix."""
    from spk_sl_validation_spark.ext import assembly as A
    from spk_sl_validation_spark.ext import dedup as D
    from spk_sl_validation_spark.ext.hashing import ws_tokens
    from spk_sl_validation_spark.plans.assembly_queries import (
        MIN_TOKENS,
        MIX_WEIGHTS,
        SEQ_LEN,
    )
    from spk_sl_validation_spark.plans.dedup_shared import BANDS, JACCARD_TAU, NUM_HASHES

    q = docs.filter(F.size(ws_tokens("text")) >= MIN_TOKENS)
    keep = D.dedup_corpus(q, "doc_id", "text", NUM_HASHES, BANDS, 3, JACCARD_TAU)
    kept = q.join(keep.filter("keep").select("doc_id"), "doc_id", "left_semi")
    sampled = A.mixture_sample(kept, MIX_WEIGHTS)
    packed = A.pack_sequences(sampled, seq_len=SEQ_LEN)
    return packed.select("doc_id", "n_tokens", "tok_offset", "seq_id", "offset_in_seq")


def main() -> None:
    n = 10_000_000
    legacy = False
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--docs" and i + 1 < len(args):
            n = int(args[i + 1])
        if a == "--legacy":
            legacy = True

    import os

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    from spk_sl_validation_spark.plans.assembly_queries import compose_training_pipeline
    from spk_sl_validation_spark.session import build_session

    spark = build_session(
        app_name="pipeline-probe",
        extra_conf={
            "spark.sql.shuffle.partitions": "256",
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            # keep every stage visible to the REST snapshot
            "spark.ui.retainedStages": "5000",
        },
    )
    app_id = spark.sparkContext.applicationId

    docs = synth_corpus(spark, n).localCheckpoint(eager=True)
    corpus_bytes = docs.agg(F.sum(F.octet_length("text")).alias("b")).first()["b"]
    before_stage_ids = {s["stageId"] for s in rest_stages(app_id)}
    before_job_ids = {j["jobId"] for j in rest_jobs(app_id)}

    t0 = time.time()
    # Building the composition materializes its eager localCheckpoints
    # (LSH candidates, verify doc-sets, pack base) as separate jobs;
    # the job-id watermark between build and action splits the
    # accounting into the two phases a cluster operator would see.
    packed = (legacy_compose if legacy else compose_training_pipeline)(docs)
    t_compose = time.time()
    compose_job_ids = {
        j["jobId"] for j in rest_jobs(app_id) if j["jobId"] not in before_job_ids
    }
    qe = packed._jdf.queryExecution()
    out_rows = qe.toRdd().count()
    t_end = time.time()
    wall = t_end - t0

    stages = {
        s["stageId"]: s
        for s in rest_stages(app_id)
        if s["stageId"] not in before_stage_ids
    }
    jobs = [j for j in rest_jobs(app_id) if j["jobId"] not in before_job_ids]
    phases = []
    for label, member in (
        ("checkpoint_materialization", lambda j: j["jobId"] in compose_job_ids),
        ("final_assembly", lambda j: j["jobId"] not in compose_job_ids),
    ):
        sids = {sid for j in jobs if member(j) for sid in j["stageIds"]}
        st = [stages[sid] for sid in sids if sid in stages]
        phases.append(
            {
                "phase": label,
                "wall_sec": round(
                    (t_compose - t0) if label == "checkpoint_materialization" else (t_end - t_compose), 1
                ),
                "shuffle_write_mb": round(sum(s["shuffleWriteBytes"] for s in st) / 1e6, 1),
                "shuffle_read_mb": round(sum(s["shuffleReadBytes"] for s in st) / 1e6, 1),
                "n_stages": len(st),
            }
        )
    sw = sum(s["shuffleWriteBytes"] for s in stages.values())
    sr = sum(s["shuffleReadBytes"] for s in stages.values())
    top = sorted(stages.values(), key=lambda s: -s["shuffleWriteBytes"])[:4]
    print(
        json.dumps(
            {
                "op": "training_corpus_pipeline_legacy" if legacy else "training_corpus_pipeline",
                "docs": n,
                "out_rows": out_rows,
                "wall_sec": round(wall, 1),
                "docs_per_sec": int(n / wall),
                "corpus_text_bytes": int(corpus_bytes),
                "shuffle_write_bytes": int(sw),
                "shuffle_read_bytes": int(sr),
                "shuffle_write_over_corpus": round(sw / corpus_bytes, 4),
                "n_stages": len(stages),
                "phases": phases,
                "top_shuffle_stages": [
                    {
                        "stage": s["stageId"],
                        "write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                        "read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                    }
                    for s in top
                ],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
