"""Dataset-assembly operators (ext/assembly.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.assembly import (
    mixture_sample,
    pack_sequences,
    unigram_logprob,
)
from spk_sl_validation_spark.sources.readers import load_table


def test_pack_sequences_chunk_size_invariant(spark, sf_dir):
    """The two-phase prefix sum must produce identical offsets for any
    chunk size (the chunking is physical, not semantic)."""
    docs = load_table(spark, sf_dir, "documents")
    a = pack_sequences(docs, seq_len=512, chunk_size=64).orderBy("doc_id").collect()
    b = pack_sequences(docs, seq_len=512, chunk_size=7).orderBy("doc_id").collect()
    assert a == b


def test_pack_sequences_offsets_are_prefix_sums(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = pack_sequences(docs, seq_len=512).orderBy("doc_id").collect()
    running = 0
    for r in rows:
        assert r.tok_offset == running
        assert r.seq_id == running // 512
        assert r.offset_in_seq == running % 512
        running += r.n_tokens


def test_mixture_sample_fraction_tracks_weight(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    out = mixture_sample(docs, weights)
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {
        r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got.get("src0", 0) == totals["src0"]  # weight 1.0 keeps everything
    assert "src2" not in got  # weight 0 drops everything
    assert "src3" not in got  # unlisted source drops
    if totals.get("src1"):
        frac = got.get("src1", 0) / totals["src1"]
        assert 0.1 <= frac <= 0.9  # hash-threshold ≈ 0.5 (loose at tiny n)


def test_unigram_logprob_monotone_in_rarity(spark):
    """A doc of one very common token must outscore a doc of one rare
    token (higher avg_logprob = more probable under the corpus LM)."""
    docs = spark.createDataFrame(
        [(0, "the the the the the the the the"), (1, "the the the rare")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.avg_logprob for r in unigram_logprob(docs).collect()}
    assert rows[0] > rows[1]


def test_mixture_samples_are_nested(spark, sf_dir):
    """Hash-threshold sampling is MONOTONE in the weight: the rows kept
    at weight w1 are a subset of those kept at w2 > w1 — so downsampling
    ladders (10% → 25% → 50%) are nested, reproducible subsets rather
    than independent draws."""
    docs = load_table(spark, sf_dir, "documents")
    lo = mixture_sample(docs, {f"src{i}": 0.2 for i in range(20)})
    hi = mixture_sample(docs, {f"src{i}": 0.6 for i in range(20)})
    lo_ids = {r.doc_id for r in lo.select("doc_id").collect()}
    hi_ids = {r.doc_id for r in hi.select("doc_id").collect()}
    assert lo_ids < hi_ids  # strict subset (and non-empty gap at these sizes)


def test_bigram_logprob_matches_python_reference(spark):
    """End-to-end replication of the round-then-exact-decimal-sum rule
    in plain python: MLE bigram model over the corpus, per-doc mean of
    round(ln P(tok|prev), 12), rounded to 6."""
    import math
    from collections import Counter
    from decimal import Decimal

    from spk_sl_validation_spark.ext.assembly import bigram_logprob

    texts = {
        1: "a b a b a c",
        2: "a b a b a b a b",
        3: "c c c a",
        4: "b a",
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"]) for r in bigram_logprob(docs).collect()}

    bi = Counter()
    for t in texts.values():
        toks = t.split()
        for p, n in zip(toks, toks[1:]):
            bi[(p, n)] += 1
    ctx = Counter()
    for (p, _), c in bi.items():
        ctx[p] += c
    for doc_id, t in texts.items():
        toks = t.split()
        pairs = list(zip(toks, toks[1:]))
        s = sum(
            Decimal(str(round(math.log(bi[pr] / ctx[pr[0]]), 12))) for pr in pairs
        )
        expected = round(float(s) / len(pairs), 6)
        assert got[doc_id] == (len(pairs), expected), doc_id


def test_fim_split_boundaries_and_edges(spark):
    from spk_sl_validation_spark.ext.assembly import fim_split

    rows = [
        (0, "a b c d e f g h i"),  # n=9: lo=3, hi=6
        (1, "a b"),                # n=2: lo=0, hi=1 -> empty prefix
        (2, "a"),                  # n=1: lo=0, hi=0 -> all in suffix
        (3, ""),                   # split('') -> [''] (n=1, empty token)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in fim_split(df).collect()}
    r0 = got[0]
    assert (r0.prefix, r0.middle, r0.suffix) == ("a b c", "d e f", "g h i")
    assert r0.psm_text == "<fim_prefix>a b c<fim_suffix>g h i<fim_middle>d e f"
    assert r0.n_tokens == 9
    r1 = got[1]
    assert (r1.prefix, r1.middle, r1.suffix) == ("", "a", "b")
    r2 = got[2]
    assert (r2.prefix, r2.middle, r2.suffix) == ("", "", "a")
    # reassembly invariant: tokens(prefix+middle+suffix) == tokens(text)
    for r in got.values():
        joined = " ".join(x for x in (r.prefix, r.middle, r.suffix) if x)
        assert joined.split() == (rows[r.doc_id][1]).split()


def test_fim_split_rejects_bad_ratios(spark):
    import pytest as _pytest

    from spk_sl_validation_spark.ext.assembly import fim_split

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        fim_split(df, lo=(2, 3), hi=(1, 3))
    with _pytest.raises(ValueError):
        fim_split(df, lo=(0, 3), hi=(2, 3))


def test_chat_template_render_and_offsets_consistency(spark):
    from spk_sl_validation_spark.ext.assembly import (
        chat_turn_offsets,
        render_chat_template,
    )

    turns = [
        ("system", "Be brief."),
        ("user", "Hi?"),
        ("assistant", "Hello."),
        ("user", "Bye?"),
        ("assistant", "Bye."),
    ]
    df = spark.createDataFrame(
        [(0, turns)],
        "doc_id long, turns array<struct<role string, content string>>",
    )
    rendered = render_chat_template(df).first()
    assert rendered.n_turns == 5
    assert rendered.text.startswith("<|system|>\nBe brief.<|end|>\n<|user|>\nHi?")
    offs = sorted(chat_turn_offsets(df).collect(), key=lambda r: r.turn_idx)
    # spans tile the rendered text exactly, in order, with no gaps
    assert offs[0].start_char == 0
    for a, b in zip(offs, offs[1:]):
        assert a.end_char == b.start_char
    assert offs[-1].end_char == rendered.n_chars
    # each span slices back to its own rendered turn
    for o, (role, content) in zip(offs, turns):
        frag = rendered.text[o.start_char : o.end_char]
        assert frag == f"<|{role}|>\n{content}<|end|>\n"
        assert o.role == role
