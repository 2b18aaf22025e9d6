"""Iterative clustering over embedding columns (north-star set).

Lloyd's k-means expressed Spark-first: the *data* never leaves the
executors — each iteration broadcasts the tiny k x dim centroid matrix,
assigns points with one Arrow-batched pandas UDF (vectorized numpy
distance, no per-row Python), and recomputes centroids with a native
(cluster, dim) hash aggregate whose k*dim-row result is all the driver
ever collects. At 100 TB that is n_iter linear scans + n_iter
k*dim-sized collects — the canonical scalable pattern for iterative
algorithms on Spark (same shape as MLlib's own implementation).

Determinism: init is the k lowest-id vectors, assignment ties break to
the lower centroid id (numpy argmin), and the update aggregates in
float64 — runs are reproducible on the same data/partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _assign_udf(centroids: np.ndarray):
    """Vectorized nearest-centroid assignment: ||x-c||^2 = |x|^2 - 2xC + |c|^2
    (the |x|^2 term is argmin-invariant and dropped)."""
    C = centroids.astype(np.float64)
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def assign(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.to_numpy()).astype(np.float64)
        scores = X @ C.T * -2.0 + c_sq
        return pd.Series(np.argmin(scores, axis=1).astype(np.int32))

    return assign


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    n_iter: int = 3,
    eps: float | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Run Lloyd iterations; returns (assignments, centroids).

    ``n_iter`` fixed iterations (the oracle mode), or — when ``eps``
    is given — iterate until the max centroid L∞ shift ≤ ``eps``, with
    ``n_iter`` as the cap (the production convergence mode; the
    centroid matrix is already driver-resident each iteration, so the
    check costs nothing extra). With ``eps=0.0`` and the same cap the
    result is bit-identical to the fixed mode unless a true fixed
    point is reached early, in which case further iterations are the
    identity — pinned by test.

    assignments: ``id_col, cluster`` (one row per input row, lazily
    recomputable); centroids: the final ``k x dim`` numpy matrix.
    Init = the vectors of the ``k`` lowest ids (deterministic, no RNG).
    """
    init_rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    centroids = np.array([r[vec_col] for r in init_rows], dtype=np.float64)

    assigned = None
    for _ in range(n_iter):
        assigned = df.select(
            id_col, vec_col, _assign_udf(centroids)(F.col(vec_col)).alias("cluster")
        )
        sums = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum(F.col("v").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_c = centroids.copy()  # empty clusters keep their previous centroid
        dim = centroids.shape[1]
        acc = np.zeros((k, dim)), np.zeros((k, dim))
        for r in sums:
            acc[0][r["cluster"], r["pos"]] = r["s"]
            acc[1][r["cluster"], r["pos"]] = r["n"]
        nonempty = acc[1][:, 0] > 0
        new_c[nonempty] = acc[0][nonempty] / acc[1][nonempty]
        shift = float(np.max(np.abs(new_c - centroids))) if eps is not None else None
        centroids = new_c
        if shift is not None and shift <= eps:
            break

    final = df.select(id_col, _assign_udf(centroids)(F.col(vec_col)).alias("cluster"))
    return final, centroids
