"""Incremental sequence packing (ext.assembly pack_state /
pack_sequences_continue, registered query pack_incremental):
continuation == full rebuild, out-of-order guard, empty-state identity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spk_sl_validation_spark.ext import assembly as A
from spk_sl_validation_spark.sources.readers import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pack_continue_equals_full_rebuild(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    k = docs.agg(F.floor(F.max("doc_id") / 2).cast("long")).first()[0]
    existing = docs.filter(F.col("doc_id") <= k)
    batch = docs.filter(F.col("doc_id") > k)

    full = A.pack_sequences(docs, seq_len=512).filter(F.col("doc_id") > k)
    cont = A.pack_sequences_continue(batch, A.pack_state(existing), seq_len=512)
    assert _rows(cont) == _rows(full)


def test_pack_continue_guards_out_of_order(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i}") for i in range(10)], "doc_id long, text string"
    )
    state = A.pack_state(docs)  # max_id = 9
    batch = spark.createDataFrame([(5, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="id-ordered"):
        A.pack_sequences_continue(batch, state)


def test_pack_continue_from_empty_state_is_plain_pack(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1, "a b c"), (2, "d e")], "doc_id long, text string"
    )
    cont = A.pack_sequences_continue(batch, A.pack_state(empty), seq_len=4)
    plain = A.pack_sequences(batch, seq_len=4)
    assert _rows(cont) == _rows(plain)


def test_pack_state_tokens_col(spark):
    df = spark.createDataFrame(
        [(1, "a b c", 3), (2, "d e", 2)], "doc_id long, text string, n long"
    )
    st = A.pack_state(df, tokens_col="n").first()
    assert (st["n_docs"], st["max_id"], st["total_tokens"]) == (2, 2, 5)
