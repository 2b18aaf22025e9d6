"""The precomputed-dedup-index path (ext/dedup.py
dedup_index_tables / dedup_incremental_indexed): result equivalence
with the self-contained incremental operator, and the zero-exchange
index-side join plan when the band table is stored bucketed on its
join key — the artifact layout SCALE.md §2 prescribes for 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.dedup import (
    dedup_incremental,
    dedup_incremental_indexed,
    dedup_index_tables,
)
from spk_sl_validation_spark.operators.skew import write_bucketed
from spk_sl_validation_spark.sources.readers import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_indexed_matches_self_contained(spark, sf_dir):
    """With no cap-bound buckets, batch-vs-prebuilt-index dedup must
    reproduce dedup_incremental's keep/drop/reason set exactly."""
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    expected = {
        (r.doc_id, r.keep, r.reason)
        for r in dedup_incremental(docs, is_new=is_new).collect()
    }
    index_fp, index_bands, index_hs = dedup_index_tables(docs.filter(~is_new))
    got = {
        (r.doc_id, r.keep, r.reason)
        for r in dedup_incremental_indexed(
            docs.filter(is_new), index_fp, index_bands, index_hs
        ).collect()
    }
    assert got == expected
    assert len(got) == docs.filter(is_new).count()


def test_index_detects_both_dup_kinds(spark, sf_dir):
    """A batch holding an exact copy and a near copy of index docs is
    flagged with the right reasons; novel docs are kept."""
    docs = load_table(spark, sf_dir, "documents").limit(100).cache()
    index = docs.filter(F.col("doc_id") < 80)
    base = docs.filter(F.col("doc_id") == 3).select("text").first().text
    batch = spark.createDataFrame(
        [
            (1001, base),  # exact copy of an index doc
            (1002, base + " tail tail"),  # near copy
            (1003, "entirely novel words " * 10),
        ],
        "doc_id long, text string",
    )
    fp, bands, hs = dedup_index_tables(index)
    out = {r.doc_id: r.reason for r in dedup_incremental_indexed(batch, fp, bands, hs).collect()}
    assert out[1001] == "exact_dup"
    assert out[1002] == "near_dup"
    assert out[1003] == "unique"


def test_bucketed_index_band_join_has_no_index_side_exchange(spark, sf_dir):
    """Band table persisted bucketed+sorted on (band, h0, h1): the
    delta's candidate join reads the index with NO exchange — only the
    (much smaller) batch side shuffles. This is the property that
    makes per-shard dedup cost ∝ shard, not ∝ corpus."""
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    _, index_bands, _ = dedup_index_tables(docs.filter(~is_new))
    keys = ["band", "h0", "h1"]
    # Bucket count must equal the partition count the join requires
    # (shuffle.partitions here; a cluster would bucket the index at
    # its standing reducer count), and auto-bucketed-scan heuristics
    # are disabled so the one-sided-bucketed read is deterministic.
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    write_bucketed(index_bands, "b_dedup_index_bands", keys, n_buckets=n_buckets, sort_cols=keys)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        stored = spark.table("b_dedup_index_bands")
        _, batch_bands, _ = dedup_index_tables(docs.filter(is_new))
        joined = batch_bands.join(stored.hint("merge").withColumnRenamed("doc_id", "iid"), keys)
        plan = _plan(joined)
        # The index side is a bare bucketed FileScan feeding the
        # sort-merge join: no Exchange, and no Sort either (sortBy
        # order is preserved). Only the batch subtree shuffles — its
        # signature aggregation plus the layout onto the band key.
        assert "Bucketed: true" in plan
        assert plan.count("Exchange hashpartitioning") == 2
        n = joined.count()
        assert n > 0  # the join actually produces candidates here
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS b_dedup_index_bands")


def test_merge_then_second_batch_sees_first_batch(spark, sf_dir):
    """Lifecycle: dedup batch-1 against the index, merge its kept docs
    in, then a batch-2 copy of a KEPT batch-1 doc is exact_dup while a
    copy of a DROPPED batch-1 doc (absent from the merged index, and
    its original already indexed) is still flagged via the original."""
    from spk_sl_validation_spark.ext.dedup import merge_into_dedup_index

    docs = load_table(spark, sf_dir, "documents").limit(60).cache()
    index_docs = docs.filter(F.col("doc_id") < 40)
    novel = "fresh never seen words " * 8
    b1 = spark.createDataFrame([(2001, novel)], "doc_id long, text string")
    idx = dedup_index_tables(index_docs)
    r1 = dedup_incremental_indexed(b1, *idx)
    kept = r1.filter("keep").select("doc_id")
    assert kept.count() == 1
    merged = merge_into_dedup_index(idx, dedup_index_tables(b1), kept)

    b2 = spark.createDataFrame([(3001, novel)], "doc_id long, text string")
    r2 = {r.doc_id: r.reason for r in dedup_incremental_indexed(b2, *merged).collect()}
    assert r2[3001] == "exact_dup"
