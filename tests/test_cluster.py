"""k-means vs a pure-numpy Lloyd reference on the same data + init."""

from __future__ import annotations

import numpy as np
import pytest

from spk_sl_validation_spark.ext.cluster import kmeans
from spk_sl_validation_spark.sources.readers import load_table

K, ITERS = 4, 3


def _numpy_lloyd(X: np.ndarray, k: int, n_iter: int) -> tuple[np.ndarray, np.ndarray]:
    C = X[:k].copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            if (a == j).any():
                C[j] = X[a == j].mean(axis=0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), C


@pytest.fixture(scope="module")
def data(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return emb, X


def test_kmeans_matches_numpy_reference(data):
    emb, X = data
    assigned, centroids = kmeans(emb, "vec_id", "embedding", k=K, n_iter=ITERS)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    ref_assign, ref_C = _numpy_lloyd(X, K, ITERS)

    agree = np.mean([got[i] == ref_assign[i] for i in range(len(ref_assign))])
    assert agree >= 0.99  # boundary points may flip on float-sum order
    np.testing.assert_allclose(centroids, ref_C, rtol=1e-9, atol=1e-9)


def test_kmeans_inertia_decreases(data):
    emb, X = data
    _, c1 = kmeans(emb, "vec_id", "embedding", k=K, n_iter=1)
    _, c3 = kmeans(emb, "vec_id", "embedding", k=K, n_iter=ITERS)

    def inertia(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    assert inertia(c3) <= inertia(c1) + 1e-9
