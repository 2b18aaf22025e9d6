"""DSIR importance weighting and CCNet perplexity bucketing vs
independent in-Python references (SQL-free second oracle, same pattern
as tests/test_retrieval.py)."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.assembly import ccnet_buckets, dsir_importance

DOCS = [
    # (doc_id, text, source) — two "target" sources and two raw ones
    (1, "alpha beta gamma alpha", "tgt"),
    (2, "alpha beta beta", "tgt"),
    (3, "delta epsilon zeta", "raw1"),
    (4, "alpha delta delta epsilon", "raw1"),
    (5, "zeta zeta zeta eta", "raw2"),
    (6, "beta gamma eta theta", "raw2"),
    (7, "alpha", "raw2"),
]


def _rhu(x: float, nd: int) -> float:
    return float(Decimal(str(x)).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP))


def _md5_long(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _dsir_reference(docs, target_sources, n_buckets):
    tok_rows = [
        (d, src in target_sources, _md5_long(t) % n_buckets)
        for d, text, src in docs
        for t in text.split(" ")
    ]
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for _, tgt, b in tok_rows:
        (ct if tgt else cr)[b] = (ct if tgt else cr).get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    lam = {
        b: _rhu(
            math.log((ct.get(b, 0) + 1) / (nt + n_buckets))
            - math.log((cr.get(b, 0) + 1) / (nr + n_buckets)),
            12,
        )
        for b in range(n_buckets)
    }
    out = {}
    for d, text, _ in docs:
        bs = [_md5_long(t) % n_buckets for t in text.split(" ")]
        s = sum((Decimal(str(lam[b])) for b in bs), Decimal(0))
        out[d] = (len(bs), _rhu(float(s), 6))
    return out


def test_dsir_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logratio"])
        for r in dsir_importance(
            df, F.col("source") == "tgt", n_buckets=64
        ).collect()
    }
    expected = _dsir_reference(DOCS, {"tgt"}, 64)
    assert got == expected


def test_dsir_target_docs_score_higher(spark):
    """Sanity: target documents' mean weight exceeds raw documents'
    (they are literally what the target LM was fit on)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    rows = dsir_importance(df, F.col("source") == "tgt", n_buckets=64).collect()
    src = {d: s for d, _, s in DOCS}
    tgt = [r["logratio"] for r in rows if src[r["doc_id"]] == "tgt"]
    raw = [r["logratio"] for r in rows if src[r["doc_id"]] != "tgt"]
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)


def test_ccnet_buckets_thirds(spark, sf_dir):
    """Every (source) slice splits into nonempty head/middle/tail with
    head ≥ middle ≥ tail scores (by construction of the quantile cuts),
    and every document gets exactly one bucket."""
    from spk_sl_validation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = ccnet_buckets(docs)
    assert out.count() == docs.count()
    per = {
        (r["source"], r["ppl_bucket"]): r["n"]
        for r in out.groupBy("source", "ppl_bucket").agg(F.count("*").alias("n")).collect()
    }
    sources = {s for s, _ in per}
    for s in sources:
        # with >= 3 docs per source all three buckets are populated
        total = sum(per.get((s, b), 0) for b in ("head", "middle", "tail"))
        if total >= 3:
            assert per.get((s, "tail", ), 0) > 0 and per.get((s, "head"), 0) > 0
