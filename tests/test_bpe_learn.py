"""Iterative BPE merge-loop training (ext.text.learn_bpe_merges,
text_bpe_learn): golden Sennrich example, pure-python reference parity,
and segment-inference roundtrip.
"""

from __future__ import annotations

import collections

from spk_sl_validation_spark.ext import text as X


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Classic BPE (Sennrich et al. 2016) on a word-frequency table:
    greedy left-to-right merge application, argmax by (count desc,
    (lhs, rhs) asc)."""
    seqs = {w: tuple(w) for w in word_counts}
    merges = []
    for step in range(1, n_merges + 1):
        counts: collections.Counter = collections.Counter()
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] += word_counts[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (lhs, rhs), n = best
        merges.append((step, lhs, rhs, lhs + rhs, n))
        new_seqs = {}
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == lhs and seq[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return merges, seqs


def test_bpe_golden_sennrich_example(spark):
    df = spark.createDataFrame(
        [(1, "low lower lowest low low newer new")], "doc_id long, text string"
    )
    got = [tuple(r) for r in X.learn_bpe_merges(df, n_merges=5).collect()]
    assert got == [
        (1, "l", "o", "lo", 5),
        (2, "lo", "w", "low", 5),
        (3, "e", "r", "er", 2),
        (4, "e", "w", "ew", 2),
        (5, "n", "ew", "new", 2),
    ]


def test_bpe_matches_python_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    from spk_sl_validation_spark.ext.hashing import ws_tokens
    from spk_sl_validation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(80)
    words = {
        r.w: r.cnt
        for r in docs.select(F.explode(ws_tokens("text")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    want, _ = _python_bpe(words, 5)
    got = [tuple(r) for r in X.learn_bpe_merges(docs, n_merges=5).collect()]
    assert got == want


def test_bpe_consecutive_pair_merging(spark):
    """'a a a a' under merge (a,a): greedy left-to-right gives
    [aa, aa], and 'a a a' gives [aa, a] — the double-space replace
    invariant must reproduce both (the failure mode of naive
    single-space string replacement)."""
    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaa")], "doc_id long, text string"
    )
    got = [tuple(r) for r in X.learn_bpe_merges(df, n_merges=2).collect()]
    # iter 1: pairs (a,a) count 3+3+2=8 -> merge to 'aa'
    assert got[0] == (1, "a", "a", "aa", 8)
    # iter 2: 'aaaa'->[aa,aa] (pair (aa,aa) x2), 'aaa'->[aa,a] (pair (aa,a) x1)
    assert got[1] == (2, "aa", "aa", "aaaa", 2)


def _py_apply(seq, merges):
    for _, lhs, rhs, _, _ in merges:
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == lhs and seq[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = tuple(out)
    return seq


def test_bpe_encode_stats_python_parity(spark, sf_dir):
    """bpe_encode_stats encodes EVERY word (including the <2-char words
    training drops — they stay one symbol) and its per-doc counts match
    a pure-python replay of the learned table."""
    from pyspark.sql import functions as F

    from spk_sl_validation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    merges = [tuple(r) for r in X.learn_bpe_merges(docs, n_merges=4).collect()]
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in X.bpe_encode_stats(docs, merges).collect()
    }
    import re

    want = {}
    for r in docs.select("doc_id", "text").collect():
        words = re.split(r"\s+", r.text.strip())
        n_bpe = sum(len(_py_apply(tuple(w), merges)) for w in words)
        want[r.doc_id] = (len(words), n_bpe)
    assert got == want


def test_bpe_segment_inference_roundtrip(spark, sf_dir):
    """bpe_segment applies the learned table in training order: the
    symbol sequences must equal the python reference's final state."""
    from pyspark.sql import functions as F

    from spk_sl_validation_spark.ext.hashing import ws_tokens
    from spk_sl_validation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    merges = [tuple(r) for r in X.learn_bpe_merges(docs, n_merges=4).collect()]
    words_df = (
        docs.select(F.explode(ws_tokens("text")).alias("w"))
        .where(F.length("w") >= 2)
        .distinct()
    )
    got = {
        r.w: tuple(r.seq)
        for r in words_df.select("w", X.bpe_segment("w", merges).alias("seq")).collect()
    }
    counts = {w: 1 for w in got}
    py_merges, py_seqs = _python_bpe(counts, 0)  # no training, just init
    # replay the learned merges with the python applier
    seqs = {w: tuple(w) for w in counts}
    for _, lhs, rhs, _, _ in merges:
        new_seqs = {}
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == lhs and seq[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    assert got == seqs
