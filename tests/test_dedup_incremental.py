"""Semantic golden tests for ext.dedup.dedup_incremental (batch-vs-
index dedup). The registry differential test value-hashes the
registered query against DuckDB; these pin the semantics on a corpus
small enough to reason about by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.dedup import dedup_incremental

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _run(spark, rows, new_ids):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_incremental(
        df, is_new=F.col("doc_id").isin(new_ids), jaccard_threshold=0.5
    )
    return {r["doc_id"]: (r["keep"], r["reason"]) for r in out.collect()}


def test_exact_near_and_unique(spark):
    rows = [
        # ---- index ----
        (1, BASE),
        (2, "completely different index content here nothing shared at all ok"),
        # ---- new batch ----
        (10, BASE),  # byte-identical to index doc 1 -> exact_dup
        (11, BASE + " omega"),  # near-dup of doc 1 (8 of 9 shingles shared)
        (12, "one two three four five six seven eight nine ten"),  # unique
    ]
    got = _run(spark, rows, [10, 11, 12])
    assert set(got) == {10, 11, 12}  # only the batch is reported
    assert got[10] == (False, "exact_dup")
    assert got[11] == (False, "near_dup")
    assert got[12] == (True, "unique")


def test_exact_normalization_case_and_whitespace(spark):
    rows = [
        (1, "Hello   World FOO"),
        (10, "hello world foo"),  # same after lower+collapse -> exact_dup
    ]
    got = _run(spark, rows, [10])
    assert got[10] == (False, "exact_dup")


def test_within_batch_dups_are_out_of_scope(spark):
    # Two identical NEW docs with no index counterpart: both kept —
    # batch-internal dedup is dedup_corpus's job, documented contract.
    rows = [
        (1, "index doc that matches nothing in the batch at all truly"),
        (10, BASE),
        (11, BASE),
    ]
    got = _run(spark, rows, [10, 11])
    assert got[10] == (True, "unique")
    assert got[11] == (True, "unique")


def test_index_never_reported(spark):
    rows = [(1, BASE), (2, BASE), (10, "something else entirely unrelated words")]
    got = _run(spark, rows, [10])
    assert set(got) == {10}
    assert got[10] == (True, "unique")
