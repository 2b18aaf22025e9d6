"""End-to-end dedup pipeline behavior."""

from __future__ import annotations

from pyspark.sql import Row

from spk_sl_validation_spark.ext.dedup import dedup_corpus


def test_dedup_corpus_drops_higher_id_near_dup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.replace("kappa", "lambda")  # 1 of 8 shingles differs
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=near),
            Row(doc_id=3, text="totally unrelated words about query engines and plans"),
        ]
    )
    out = {r.doc_id: r.keep for r in dedup_corpus(df, jaccard_threshold=0.6).collect()}
    assert out == {1: True, 2: False, 3: True}


def test_dedup_clusters_transitive_chain(spark):
    from spk_sl_validation_spark.ext.dedup import dedup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near1 = base.replace("kappa", "lambda")
    near2 = near1.replace("alpha", "omega")  # near near1, farther from base
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=near1),
            Row(doc_id=3, text=near2),
            Row(doc_id=4, text="unrelated words about catalyst plans and shuffles"),
        ]
    )
    out = {r.doc_id: r.cluster_id for r in dedup_clusters(df, jaccard_threshold=0.6).collect()}
    # 1~2 and 2~3 are near-dups → all three share the min-id cluster label.
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4


def test_dedup_corpus_keeps_everything_when_no_dups(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="one two three four five six"),
            Row(doc_id=2, text="seven eight nine ten eleven twelve"),
        ]
    )
    out = dedup_corpus(df).collect()
    assert all(r.keep for r in out)


def test_exact_first_equivalent_keep_set(spark, sf_dir):
    """dedup_corpus(exact_first=True) must produce the identical keep
    set as the plain LSH-over-everything path (provable equivalence —
    copies relate through their representative)."""
    from spk_sl_validation_spark.ext.dedup import dedup_corpus
    from spk_sl_validation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    plain = {r["doc_id"]: r["keep"] for r in dedup_corpus(docs).collect()}
    fast = {r["doc_id"]: r["keep"] for r in dedup_corpus(docs, exact_first=True).collect()}
    assert plain == fast
