"""Unit tests: banded interval range join, benchmark decontamination,
JSONL source roundtrip."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spk_sl_validation_spark.ext.decontaminate import benchmark_overlap
from spk_sl_validation_spark.operators.rangejoin import banded_interval_pairs, interval_count


def _events(spark):
    mk = datetime
    rows = [
        # user 1: clicks at :00:00, :30:00, purchase at 01:00:00 (both in window:
        # ts > 00:00:00 exclusive? click@00:00:00 is exactly lower bound -> excluded)
        Row(event_id=1, user_id=1, ts=mk(2024, 1, 1, 0, 0, 0), event_type="click"),
        Row(event_id=2, user_id=1, ts=mk(2024, 1, 1, 0, 30, 0), event_type="click"),
        Row(event_id=3, user_id=1, ts=mk(2024, 1, 1, 1, 0, 0), event_type="purchase"),
        # boundary: click exactly at purchase ts -> included (<=)
        Row(event_id=4, user_id=2, ts=mk(2024, 1, 1, 5, 0, 0), event_type="click"),
        Row(event_id=5, user_id=2, ts=mk(2024, 1, 1, 5, 0, 0), event_type="purchase"),
        # cross-band: click 59:59 before a purchase in the next hour-band
        Row(event_id=6, user_id=3, ts=mk(2024, 1, 1, 7, 59, 59), event_type="click"),
        Row(event_id=7, user_id=3, ts=mk(2024, 1, 1, 8, 30, 0), event_type="purchase"),
        # out of window: click 61 min before
        Row(event_id=8, user_id=4, ts=mk(2024, 1, 1, 9, 0, 0), event_type="click"),
        Row(event_id=9, user_id=4, ts=mk(2024, 1, 1, 10, 1, 0), event_type="purchase"),
        # other user's click never matches
        Row(event_id=10, user_id=5, ts=mk(2024, 1, 1, 0, 55, 0), event_type="click"),
    ]
    return spark.createDataFrame(rows)


def test_banded_pairs_match_naive_range_join(spark):
    ev = _events(spark)
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts")

    pairs = banded_interval_pairs(p, c, ["user_id"], "ts", "ts", 3600)
    got = sorted((r.event_id, r.ts_r) for r in pairs.collect())

    naive = (
        p.alias("p")
        .join(
            c.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("c.ts") > F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c.ts") <= F.col("p.ts")),
        )
        .select(F.col("p.event_id"), F.col("c.ts"))
    )
    want = sorted((r.event_id, r.ts) for r in naive.collect())
    assert got == want
    # boundary semantics: purchase 3 sees only the :30 click (exclusive lower),
    # purchase 5 sees the equal-ts click (inclusive upper), 7 crosses bands, 9 empty
    by_purchase = {}
    for eid, _ in got:
        by_purchase[eid] = by_purchase.get(eid, 0) + 1
    assert by_purchase == {3: 1, 5: 1, 7: 1}


def test_interval_count_zero_preserving(spark):
    ev = _events(spark)
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = interval_count(p, c, ["user_id"], "event_id", "ts", "ts", 3600)
    got = {r.event_id: r.n_in_window for r in out.collect()}
    assert got == {3: 1, 5: 1, 7: 1, 9: 0}


def test_benchmark_overlap_flags_shared_ngrams(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog")]
    )
    train = spark.createDataFrame(
        [
            # contains the bench 4-gram "quick brown fox jumps"
            Row(doc_id=1, text="she saw the quick brown fox jumps over nothing"),
            # no 4-gram overlap
            Row(doc_id=2, text="completely unrelated text with different words entirely"),
            # short doc (< n tokens): whole-doc shingle, no overlap
            Row(doc_id=3, text="tiny doc"),
        ]
    )
    out = benchmark_overlap(train, bench, "doc_id", "text", n=4)
    got = {r.doc_id: (r.n_overlap, r.contaminated) for r in out.collect()}
    assert got[1][1] is True and got[1][0] >= 1
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_benchmark_overlap_bloom_equals_direct(spark):
    """The Bloom-prefiltered path returns row-identical output to the
    direct path — including with a DELIBERATELY tiny filter (m_bits=64,
    high false-positive rate): Bloom has no false negatives and the
    exact-verify stage kills every false positive, so the filter size
    tunes cost, never correctness."""
    from spk_sl_validation_spark.ext.decontaminate import benchmark_overlap_bloom

    bench = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog")]
    )
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="she saw the quick brown fox jumps over nothing"),
            Row(doc_id=2, text="completely unrelated text with different words entirely"),
            Row(doc_id=3, text="tiny doc"),
        ]
    )
    direct = sorted(
        map(tuple, benchmark_overlap(train, bench, "doc_id", "text", n=4).collect())
    )
    for m_bits in (64, 8192):
        bloom = sorted(
            map(
                tuple,
                benchmark_overlap_bloom(
                    train, bench, "doc_id", "text", n=4, m_bits=m_bits
                ).collect(),
            )
        )
        assert bloom == direct, m_bits


def test_jsonl_roundtrip(spark, tmp_path):
    from spk_sl_validation_spark.sources.readers import load_jsonl_table

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    src = spark.createDataFrame(
        [Row(doc_id=1, text="hello world", lang="en"), Row(doc_id=2, text="bonjour", lang="fr")],
        schema=schema,
    )
    path = str(tmp_path / "docs_jsonl")
    src.write.mode("overwrite").json(path)
    back = load_jsonl_table(spark, path, schema)
    assert sorted((r.doc_id, r.text, r.lang) for r in back.collect()) == [
        (1, "hello world", "en"),
        (2, "bonjour", "fr"),
    ]


def test_benchmark_overlap_bloom_empty_bench(spark):
    """An empty benchmark set → all-zero mask → zero candidates →
    every train doc uncontaminated (and the driver collect of zero
    positions is fine)."""
    from spk_sl_validation_spark.ext.decontaminate import benchmark_overlap_bloom

    bench = spark.createDataFrame([], "doc_id long, text string")
    train = spark.createDataFrame(
        [Row(doc_id=1, text="some words here to shingle over the set")]
    )
    got = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in benchmark_overlap_bloom(train, bench, "doc_id", "text", n=4).collect()
    }
    assert got == {1: (0, False)}


def test_benchmark_overlap_bloom_null_text_and_duplicate_rows(spark):
    """Row-identity with the direct path on degenerate inputs: a
    NULL-text train row contributes no shingles (both paths omit it)
    and duplicate train rows collapse to one output row."""
    from spk_sl_validation_spark.ext.decontaminate import benchmark_overlap_bloom

    bench = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog")]
    )
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="she saw the quick brown fox jumps over nothing"),
            Row(doc_id=1, text="she saw the quick brown fox jumps over nothing"),
            Row(doc_id=2, text=None),
        ],
        "doc_id long, text string",
    )
    direct = sorted(
        map(tuple, benchmark_overlap(train, bench, "doc_id", "text", n=4).collect())
    )
    bloom = sorted(
        map(
            tuple,
            benchmark_overlap_bloom(train, bench, "doc_id", "text", n=4).collect(),
        )
    )
    assert bloom == direct
    assert [r[0] for r in bloom] == [1]  # doc 2 (NULL text) omitted, doc 1 once
