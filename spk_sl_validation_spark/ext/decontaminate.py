"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation/benchmark set.

Standard large-scale training-data hygiene (not in the reference —
`/root/reference` is batch ERP validation only; this extends the
north-star text-analysis set): any training document containing an
exact n-gram (n=8..13 in published pipelines) that also appears in a
benchmark document is flagged so it can be dropped or audited.

Scale design (100 TB corpus, ~10⁴–10⁶ benchmark docs):
- The benchmark n-gram set is tiny relative to the corpus → built
  once, deduplicated, and **broadcast**; the corpus side never
  shuffles for the join itself.
- Corpus shingling reuses :func:`~spk_sl_validation_spark.ext.hashing.
  shingle_rows` (posexplode + window-lead — fully codegen'd, one hash
  exchange by doc id), and that same exchange feeds the per-doc
  overlap count, so the whole check costs one shuffle over the corpus.
- For corpora where even distinct shingle *strings* are too wide,
  join on ``xxhash64(shingle)`` instead (64-bit, collision odds
  negligible at benchmark-set sizes); the contract query joins on the
  raw string so the DuckDB oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.hashing import shingle_rows


def benchmark_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-training-doc count of distinct word n-grams shared with the
    benchmark set.

    Returns ``(id_col, n_overlap, contaminated)`` — one row per train
    doc, ``n_overlap = |distinct n-grams(doc) ∩ n-grams(bench)|``,
    ``contaminated = n_overlap > 0``. Docs shorter than ``n`` tokens
    contribute one whole-doc shingle (shingle_rows semantics).
    """
    train_g = shingle_rows(train, id_col, text_col, n).distinct()
    bench_g = (
        shingle_rows(bench, id_col, text_col, n)
        .select("s")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        train_g.join(F.broadcast(bench_g), "s", "left")
        .groupBy(id_col)
        .agg(F.count("__hit").alias("n_overlap"))
        .withColumn("contaminated", F.col("n_overlap") > 0)
    )
