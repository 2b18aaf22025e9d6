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


def benchmark_overlap_bloom(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 8,
    m_bits: int = 8192,
    k: int = 5,
) -> DataFrame:
    """EXACTLY :func:`benchmark_overlap`'s output through a Bloom
    prefilter — the 100 TB shape when the benchmark n-gram STRING set
    is too wide to broadcast comfortably (published held-out suites
    reach 10⁶+ docs ⇒ multi-GB distinct-shingle relations; a Bloom of
    them is ``m_bits/8`` bytes, period).

    Three stages:
    1. Bench shingles → Bloom BITMASK (``m_bits/64`` longs), collected
       to the driver (a bounded fan-in, ≤ m_bits set positions by
       construction — the k-means-centroid pattern) and shipped back
       as a ONE-ROW broadcast crossJoin, so the corpus-side probe is
       k ``element_at``+bit-test conditions per shingle: NO shuffle,
       NO higher-order functions, and m_bits scales to millions of
       bits (m_bits/8 bytes per executor) where a plan-text literal
       would hit the codegen method limit around 2^17.
    2. Corpus shingles that pass all k bit-tests become candidates —
       Bloom has no false negatives, so candidates ⊇ true matches and
       the (tunable) false-positive rate only costs verify work.
    3. Candidates alone exact-verify against the bench string set
       (broadcast join over the Bloom-selected sliver), then fold
       back onto the full train-doc universe with zero-overlap rows —
       false positives die here, which is why the output is
       row-identical to the direct path and shares its oracle.
    """
    from spk_sl_validation_spark.ext.hashing import md5_long, seeded_perm, seeded_perm_sql

    bench_g = shingle_rows(bench, id_col, text_col, n).select("s").distinct()
    h_b = md5_long(F.col("s").cast("string"))
    bit_rows = (
        bench_g.select(
            F.explode(
                F.array(*[(seeded_perm(h_b, i) % F.lit(m_bits)) for i in range(k)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    mask = [0] * ((m_bits + 63) // 64)
    for r in bit_rows:
        mask[r.pos // 64] |= 1 << (r.pos % 64)
    # two's-complement to fit Spark's signed LongType. The mask ships
    # as a ONE-ROW broadcast crossJoin (the house 1-row fan-in
    # pattern), NOT a SQL literal: a literal caps m_bits at what the
    # plan text / codegen method limit tolerates (~2^17), while a
    # broadcast row carries a multi-million-bit filter for free
    # (m_bits/8 bytes once per executor).
    mask_row = train.sparkSession.createDataFrame(
        [([v - (1 << 64) if v >= (1 << 63) else v for v in mask],)],
        "__mask array<bigint>",
    )

    train_g = (
        shingle_rows(train, id_col, text_col, n)
        .distinct()
        .withColumn("__h", md5_long(F.col("s").cast("string")))
        .crossJoin(F.broadcast(mask_row))
    )
    # shiftright(word, pos % 64) & 1: arithmetic shift is bit-test-safe
    # (the & 1 reads only the lowest post-shift bit, sign fill never
    # reaches it for shifts < 64).
    tests = []
    for i in range(k):
        pos = f"({seeded_perm_sql('__h', i)} % {m_bits})"
        tests.append(
            f"(shiftright(element_at(__mask, CAST({pos} / 64 AS INT) + 1),"
            f" CAST({pos} % 64 AS INT)) & 1) = 1"
        )
    cand = train_g.filter(F.expr(" AND ".join(tests))).drop("__h", "__mask")

    overlap = (
        cand.join(F.broadcast(bench_g.withColumn("__hit", F.lit(1))), "s")
        .groupBy(id_col)
        .agg(F.count("__hit").alias("n_overlap"))
    )
    return (
        train.select(id_col)
        .join(overlap.hint("shuffle_hash"), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
        )
        .withColumn("contaminated", F.col("n_overlap") > 0)
    )
