"""Convergence-mode iteration (until_delta) for the three iterative
algorithms — the production story at 100 TB, alongside the pinned
fixed-iteration oracle mode.

Two properties per algorithm:
1. parity — with ``eps=0`` and the fixed count as the cap, the
   convergence mode returns exactly the fixed-mode result (identical
   per-iteration arithmetic);
2. convergence — with a loose eps it stops before the cap, and the
   converged values are a fixed point (one more iteration moves every
   value ≤ eps).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.graph import (
    ITERATIONS,
    pagerank,
    pagerank_until_delta,
    transition_edges,
)
from spk_sl_validation_spark.ext.textrank import textrank_scores, textrank_scores_until_delta
from spk_sl_validation_spark.sources.readers import load_table


def _ranks(df):
    return dict(df.collect())


def test_pagerank_until_delta_parity_with_fixed(spark, sf_dir):
    edges = transition_edges(load_table(spark, sf_dir, "events"))
    fixed = _ranks(pagerank(edges, iterations=ITERATIONS))
    conv, n_run = pagerank_until_delta(edges, eps=0.0, max_iter=ITERATIONS)
    assert n_run <= ITERATIONS
    assert _ranks(conv) == fixed


def test_pagerank_until_delta_converges_before_cap(spark, sf_dir):
    edges = transition_edges(load_table(spark, sf_dir, "events"))
    conv, n_run = pagerank_until_delta(edges, eps=1e-7, max_iter=40, checkpoint_every=4)
    assert n_run < 40, "did not converge within the cap"
    # ranks still sum to ~1 after many iterations
    total = conv.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-3
    # converged = one more until_delta run from scratch with a larger
    # budget lands on the same values (the fixed point is stable)
    conv2, n2 = pagerank_until_delta(edges, eps=1e-7, max_iter=n_run + 5, checkpoint_every=3)
    assert _ranks(conv2) == _ranks(conv)


def test_textrank_until_delta_parity_with_fixed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    fixed = {r["tok"]: r["score"] for r in textrank_scores(docs, n_iter=3).collect()}
    conv, n_run = textrank_scores_until_delta(docs, eps=0.0, max_iter=3)
    assert n_run <= 3
    got = {r["tok"]: r["score"] for r in conv.collect()}
    assert got == fixed


def test_textrank_until_delta_converges(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    conv, n_run = textrank_scores_until_delta(docs, eps=1e-6, max_iter=60, checkpoint_every=5)
    assert n_run < 60, "did not converge within the cap"
    scores = [r["score"] for r in conv.collect()]
    assert all(s > 0 for s in scores)


def test_kmeans_eps_parity_and_early_stop(spark, sf_dir):
    from spk_sl_validation_spark.ext.cluster import kmeans

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    _, fixed_c = kmeans(emb, "vec_id", "embedding", k=4, n_iter=3)
    _, conv_c = kmeans(emb, "vec_id", "embedding", k=4, n_iter=3, eps=0.0)
    assert np.array_equal(fixed_c, conv_c)
    # loose eps: converges well before a generous cap
    _, c1 = kmeans(emb, "vec_id", "embedding", k=4, n_iter=60, eps=1e-9)
    _, c2 = kmeans(emb, "vec_id", "embedding", k=4, n_iter=80, eps=1e-9)
    assert np.allclose(c1, c2, atol=1e-8)
