"""Trainable logistic quality classifier (ext.text.train_quality_model,
text_quality_train): python-reference parity, until_delta production
mode, and learned-weight inference through quality_model_prob.
"""

from __future__ import annotations

import math

import pytest

from spk_sl_validation_spark.ext import text as X

FEATS = X.QUALITY_FEATURES


def _collect_features(spark, df):
    rows = X._quality_training_set(df, "text", None).collect()
    return [
        (
            {"bias": 1.0, "length": r.x_length, "stopword": r.x_stopword,
             "punct": r.x_punct, "distinct": r.x_distinct},
            r.y,
        )
        for r in rows
    ]


def _python_gd(samples, iters, lr):
    """Pure-python replay of the 12-decimal-grid batch GD: p rounded to
    12 before the residual, contributions rounded to 12 and summed
    exactly (integer micro-units stand in for decimal(38,12)), update
    rounded to 12."""
    w = {k: 0.0 for k in FEATS}
    n = len(samples)
    for _ in range(iters):
        sums = {k: 0 for k in FEATS}  # scaled by 1e12, exact ints
        for x, y in samples:
            z = (
                w["bias"]
                + w["length"] * x["length"]
                + w["stopword"] * x["stopword"]
                + w["punct"] * x["punct"]
                + w["distinct"] * x["distinct"]
            )
            p12 = round(1.0 / (1.0 + math.exp(-z)), 12)
            err = p12 - y
            for k in FEATS:
                contrib = err if k == "bias" else err * x[k]
                sums[k] += int(round(round(contrib, 12) * 1e12))
        w = {
            k: round(w[k] - lr * ((sums[k] / 1e12) / n), 12)
            for k in FEATS
        }
    return w


def test_train_matches_python_reference(spark, sf_dir):
    from spk_sl_validation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r.feature: float(r.weight)
        for r in X.train_quality_model(docs, "text", iters=3).collect()
    }
    samples = _collect_features(spark, docs)
    want = _python_gd(samples, iters=3, lr=X.QUALITY_TRAIN_LR)
    for k in FEATS:
        assert got[k] == pytest.approx(want[k], abs=2e-12), (k, got, want)


def test_training_reduces_log_loss(spark, sf_dir):
    """Sanity: 3 GD steps from zero must beat the zero model's log
    loss on its own training labels (otherwise the gradient sign or
    the update direction is wrong)."""
    from spk_sl_validation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    samples = _collect_features(spark, docs)
    trained = {
        r.feature: float(r.weight)
        for r in X.train_quality_model(docs, "text", iters=3).collect()
    }

    def loss(w):
        tot = 0.0
        for x, y in samples:
            z = sum(w[k] * x[k] for k in FEATS)
            p = min(max(1.0 / (1.0 + math.exp(-z)), 1e-12), 1 - 1e-12)
            tot -= y * math.log(p) + (1 - y) * math.log(1 - p)
        return tot / len(samples)

    assert loss(trained) < loss({k: 0.0 for k in FEATS})


def test_until_delta_converges_and_extends_fixed_mode(spark, sf_dir):
    """Production mode: the until_delta loop runs the identical step —
    its weights after k iterations equal fixed-mode iters=k — and it
    stops once the max weight delta drops below tol."""
    from spk_sl_validation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    w_fixed = {
        r.feature: float(r.weight)
        for r in X.train_quality_model(docs, "text", iters=6).collect()
    }
    w_delta, n_iters = X.train_quality_model_until_delta(
        docs, "text", tol=1e-30, max_iters=6
    )
    assert n_iters == 6
    for k in FEATS:
        assert w_delta[k] == pytest.approx(w_fixed[k], abs=2e-12)
    # a loose tol stops early
    _, n_loose = X.train_quality_model_until_delta(docs, "text", tol=0.5, max_iters=50)
    assert n_loose < 50


def test_learned_weights_drive_inference(spark, sf_dir):
    """quality_model_prob accepts the trained vector: scoring with the
    learned weights must equal a hand-built sigmoid over the same
    features (so the registered scorer and the trainer share one
    feature contract)."""
    from pyspark.sql import functions as F

    from spk_sl_validation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    learned = {
        r.feature: float(r.weight)
        for r in X.train_quality_model(docs, "text", iters=2).collect()
    }
    scored = {
        r.doc_id: r.p
        for r in docs.select(
            "doc_id", X.quality_model_prob("text", weights=learned).alias("p")
        ).collect()
    }
    samples = {
        r.doc_id: {"bias": 1.0, "length": r.x_length, "stopword": r.x_stopword,
                   "punct": r.x_punct, "distinct": r.x_distinct}
        for r in docs.select(
            F.col("doc_id"), *[v.alias(f"x_{k}") for k, v in X.quality_feature_cols("text").items()]
        ).collect()
    }
    for doc_id, x in samples.items():
        z = sum(learned[k] * x[k] for k in FEATS)
        assert scored[doc_id] == pytest.approx(1.0 / (1.0 + math.exp(-z)), rel=1e-9)


def test_default_weights_unchanged(spark, sf_dir):
    """The refactor (weights parameter) must not move the shipped
    fixed-weight scorer: spot-check quality_model_prob() against the
    hand-evaluated fixed vector."""
    from spk_sl_validation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    got = {
        r.doc_id: r.p
        for r in docs.select(
            "doc_id", X.quality_model_prob("text").alias("p")
        ).collect()
    }
    w = X.QUALITY_MODEL_WEIGHTS
    feats = {
        r.doc_id: r
        for r in docs.select(
            "doc_id", *[v.alias(f"x_{k}") for k, v in X.quality_feature_cols("text").items()]
        ).collect()
    }
    for doc_id, r in feats.items():
        z = (
            w["bias"] + w["length"] * r.x_length + w["stopword"] * r.x_stopword
            + w["punct"] * r.x_punct + w["distinct"] * r.x_distinct
        )
        assert got[doc_id] == pytest.approx(1.0 / (1.0 + math.exp(-z)), rel=1e-9)
