"""Streaming crawl frontier (streaming/pipeline.py
ingest_frontier_stream): foreachBatch delta-merge into a persisted
frontier — the production twin of the complete-mode aggregate, with
NO full-state re-emission per trigger. The registered query
(streaming_frontier_ingest) is value-hashed against the batch law by
the registry differential test; these tests pin the delta mechanics."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from spk_sl_validation_spark.streaming.pipeline import (
    FRONTIER_SCHEMA,
    _frontier_process_batch,
    ingest_frontier_stream,
    read_frontier,
    write_frontier,
)


def _run_two_batches(spark, tmp_path, b1_rows, b2_rows):
    frontier_dir = str(tmp_path / "frontier")
    source_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    write_frontier(
        spark.createDataFrame([], "doc_id long, url string"), frontier_dir
    )
    os.makedirs(source_dir)
    now = time.time()
    for i, rows in enumerate((b1_rows, b2_rows)):
        sub = f"{source_dir}/b{i}"
        spark.createDataFrame(rows, "doc_id long, url string").coalesce(
            1
        ).write.parquet(sub)
        when = now - 60 + i * 30
        for f in os.listdir(sub):
            os.utime(f"{sub}/{f}", (when, when))
    q = ingest_frontier_stream(spark, f"{source_dir}/*", frontier_dir, ckpt)
    q.awaitTermination()
    return frontier_dir


def test_delta_writes_only_improving_rows(spark, tmp_path):
    # batch 0: two urls; batch 1: one dup (worse id), one dup with a
    # BETTER id, one novel url.
    frontier_dir = _run_two_batches(
        spark,
        tmp_path,
        [(10, "https://a.com/x"), (11, "https://a.com/y")],
        [(20, "https://a.com/x"), (5, "https://a.com/y"), (21, "https://a.com/z")],
    )
    deltas = spark.read.schema(FRONTIER_SCHEMA).parquet(frontier_dir)
    by_batch = {
        r.batch_id: r.n
        for r in deltas.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    # batch 1 wrote ONLY the improving rows (better y + novel z), not
    # the full 3-url frontier — the no-full-state-re-emission claim.
    assert by_batch[0] == 2
    assert by_batch[1] == 2
    got = {r.norm_url: r.doc_id for r in read_frontier(spark, frontier_dir).collect()}
    assert got == {
        "https://a.com/x": 10,
        "https://a.com/y": 5,  # batch-1 improvement wins the LSM fold
        "https://a.com/z": 21,
    }


def test_frontier_normalizes_before_merging(spark, tmp_path):
    # raw variants of one canonical URL collapse across batches
    frontier_dir = _run_two_batches(
        spark,
        tmp_path,
        [(7, "https://WWW.A.com/x/")],
        [(3, "https://a.com:443/x?utm_source=f")],
    )
    got = {r.norm_url: r.doc_id for r in read_frontier(spark, frontier_dir).collect()}
    assert got == {"https://a.com/x": 3}


def test_batch_replay_is_idempotent(spark, tmp_path):
    frontier_dir = str(tmp_path / "frontier")
    write_frontier(
        spark.createDataFrame([(1, "https://a.com/seed")], "doc_id long, url string"),
        frontier_dir,
    )
    batch = spark.createDataFrame(
        [(9, "https://a.com/seed"), (2, "https://a.com/new")],
        "doc_id long, url string",
    )
    _frontier_process_batch(spark, batch, 0, frontier_dir)
    once = sorted(tuple(r) for r in read_frontier(spark, frontier_dir).collect())
    # replay of the SAME batch_id overwrites its own delta partition
    _frontier_process_batch(spark, batch, 0, frontier_dir)
    twice = sorted(tuple(r) for r in read_frontier(spark, frontier_dir).collect())
    assert once == twice == [("https://a.com/new", 2), ("https://a.com/seed", 1)]
    deltas = spark.read.schema(FRONTIER_SCHEMA).parquet(frontier_dir)
    assert deltas.filter("batch_id = 0").count() == 1  # only the novel url


def test_auto_compaction_bounds_partitions_and_preserves_fold(spark, tmp_path):
    import os as _os

    frontier_dir = str(tmp_path / "frontier")
    write_frontier(
        spark.createDataFrame([], "doc_id long, url string"), frontier_dir
    )
    # 12 batches, threshold 4: url u{j} first appears in batch j with
    # doc_id 100+j, then every later batch offers a better id — the
    # expected frontier is a pure function of the law, independent of
    # when compaction fired.
    expected = {}
    for b in range(12):
        rows = [(100 + b, f"https://a.com/u{b}")] + [
            (100 + b - j, f"https://a.com/u{j}") for j in range(b)
        ]
        for did, url in rows:
            key = url.replace("https://a.com", "https://a.com")
            expected[key] = min(expected.get(key, 1 << 60), did)
        batch = spark.createDataFrame(rows, "doc_id long, url string")
        _frontier_process_batch(spark, batch, b, frontier_dir, compact_threshold=4)
        n_parts = sum(
            1 for d in _os.listdir(frontier_dir) if d.startswith("batch_id=")
        )
        # bounded: at most threshold+1 right after the trigger batch
        assert n_parts <= 5, f"batch {b}: {n_parts} partitions"
    got = {r.norm_url: r.doc_id for r in read_frontier(spark, frontier_dir).collect()}
    assert got == expected
    # compaction actually fired (without it there would be 13 dirs)
    n_parts = sum(1 for d in _os.listdir(frontier_dir) if d.startswith("batch_id="))
    assert n_parts < 13
    # and the staging dir was cleaned up
    assert not _os.path.exists(f"{frontier_dir}/_compact_tmp")


def test_replay_after_compaction_is_idempotent(spark, tmp_path):
    frontier_dir = str(tmp_path / "frontier")
    write_frontier(
        spark.createDataFrame([(1, "https://a.com/seed")], "doc_id long, url string"),
        frontier_dir,
    )
    for b in range(6):
        batch = spark.createDataFrame(
            [(50 + b, f"https://a.com/v{b}")], "doc_id long, url string"
        )
        _frontier_process_batch(spark, batch, b, frontier_dir, compact_threshold=2)
    once = sorted(tuple(r) for r in read_frontier(spark, frontier_dir).collect())
    # replay the LAST batch (the crash-recovery path) — compaction may
    # fire again; the min-fold must not change
    batch = spark.createDataFrame(
        [(55, "https://a.com/v5")], "doc_id long, url string"
    )
    _frontier_process_batch(spark, batch, 5, frontier_dir, compact_threshold=2)
    twice = sorted(tuple(r) for r in read_frontier(spark, frontier_dir).collect())
    assert once == twice


def test_empty_bootstrap_reads_back_empty(spark, tmp_path):
    frontier_dir = str(tmp_path / "frontier")
    write_frontier(
        spark.createDataFrame([], "doc_id long, url string"), frontier_dir
    )
    assert read_frontier(spark, frontier_dir).count() == 0
