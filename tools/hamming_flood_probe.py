"""Exact-duplicate fingerprint FLOOD probe for the banded Hamming
near-dup join (SCALE.md; round-11 verdict task #2).

The degenerate real-crawl case for image dedup: a dominant exact
duplicate (blank/logo image) puts EVERY copy at the same dHash. In
the pre-round-11 shape each copy landed in the same collect_list
bucket on all max_hamming+1 bands — one aggregation row holding the
whole flood, then an O(m²) in-bucket HOF pair expansion inside one
task that AQE cannot split. Round 11 pre-collapses identical
fingerprints (groupBy(fp)) so banding sees each fingerprint ONCE, and
re-expands members with JOINS (AQE-skew-splittable). This probe
measures each claim:

1. ``edges_flood``  — hamming_near_dup_edges on n fingerprints with
                      flood_frac sharing ONE value: output must be
                      m−1 star edges (+ rep-level near-dup pairs, ~0
                      for random tails), never m(m−1)/2. End-to-end
                      CC (stars) on top: one mega-group, bounded wall.
2. ``bucket_census`` — post-collapse band buckets over the SAME flood
                      corpus: max bucket size is the number of
                      DISTINCT fingerprints per band value (~1 for
                      random tails), proving the flood never enters a
                      bucket row.
3. ``pairs_ab``     — the full pair relation (lossless contract) at
                      growing flood sizes, NEW shape vs the OLD
                      single-bucket HOF shape (re-created inline):
                      wall-clock slope as the flood doubles. The new
                      shape streams C(m,2) join rows through a count;
                      the old shape materializes C(m,2) structs in
                      one array in one task.

Usage: python tools/hamming_flood_probe.py [--n 1000000]
           [--flood-frac 0.5] [--ops edges_flood,bucket_census,pairs_ab]
Prints one JSON line per op.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

BITS = 64
MAX_HAMMING = 2


def synth_flood_fps(spark, n: int, flood: int):
    """(doc_id, fp): ids [0, flood) share fp=42; the rest get a
    bit-mixed unique fingerprint (splitmix-style), so random tails
    are pairwise-far in Hamming distance with overwhelming odds."""
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    mixed = F.xxhash64(F.col("doc_id"))
    return base.select(
        "doc_id",
        F.when(F.col("doc_id") < flood, F.lit(42).cast("long"))
        .otherwise(mixed)
        .alias("fp"),
    )


def old_shape_pairs(fp_df, bits: int, max_hamming: int):
    """The pre-round-11 hamming_near_dup_pairs, verbatim shape: per-id
    banding, collect_list buckets over (band, band-bits), in-bucket
    HOF pair expansion. Kept here ONLY as the probe's A/B baseline."""
    n_bands = max_hamming + 1
    width = (bits + n_bands - 1) // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("fp"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bh"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = fp_df.select(
        F.col("doc_id"), F.col("fp").alias("simhash"), F.explode(bands).alias("bk")
    ).select("doc_id", "simhash", "bk.band", "bk.bh")
    buckets = (
        exploded.groupBy("band", "bh")
        .agg(
            F.collect_list(
                F.struct(F.col("doc_id").alias("id"), F.col("simhash").alias("fp"))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    pair_expr = F.expr(
        "flatten(transform(members, (m1, i) -> "
        "filter(transform(members, (m2, j) -> IF(j > i AND m1.id < m2.id, struct(m1 AS a, m2 AS b), "
        "IF(j > i AND m2.id < m1.id, struct(m2 AS a, m1 AS b), NULL))), p -> p IS NOT NULL)))"
    )
    pairs = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.col("p.a.fp").alias("sh_a"),
            F.col("p.b.fp").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def op_edges_flood(spark, n: int, flood: int) -> dict:
    from spk_sl_validation_spark.ext.dedup import hamming_near_dup_edges
    from spk_sl_validation_spark.ext.graph import connected_components_stars

    fps = synth_flood_fps(spark, n, flood)
    t0 = time.time()
    edges = hamming_near_dup_edges(fps, "doc_id", "fp", BITS, MAX_HAMMING)
    n_edges = edges.count()
    t_edges = time.time() - t0

    t0 = time.time()
    labels, rounds = connected_components_stars(edges.select("src", "dst"))
    top = (
        labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .orderBy(F.desc("sz"))
        .limit(1)
        .collect()
    )
    t_cc = time.time() - t0
    return {
        "op": "edges_flood",
        "n": n,
        "flood": flood,
        "edges": n_edges,
        "star_edges_expected": flood - 1,
        "quadratic_would_be": flood * (flood - 1) // 2,
        "cc_rounds": rounds,
        "top_component": top[0]["sz"] if top else 0,
        "sec_edges": round(t_edges, 2),
        "sec_cc": round(t_cc, 2),
    }


def op_bucket_census(spark, n: int, flood: int) -> dict:
    fps = synth_flood_fps(spark, n, flood)
    n_bands = MAX_HAMMING + 1
    width = (BITS + n_bands - 1) // n_bands
    reps = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("m"))
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("fp"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bh"),
            )
            for b in range(n_bands)
        ]
    )
    t0 = time.time()
    census = (
        reps.select("fp", F.explode(bands).alias("bk"))
        .groupBy("bk.band", "bk.bh")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.max("sz").alias("max_bucket"), F.count(F.lit(1)).alias("n_buckets"))
        .collect()[0]
    )
    return {
        "op": "bucket_census",
        "n": n,
        "flood": flood,
        "max_post_collapse_bucket": census["max_bucket"],
        "pre_collapse_hot_bucket_would_be": flood,
        "n_buckets": census["n_buckets"],
        "sec": round(time.time() - t0, 2),
    }


def op_pairs_ab(spark, n: int, floods: list[int]) -> dict:
    from spk_sl_validation_spark.ext.dedup import hamming_near_dup_pairs

    # New shape first for every flood size (session-safe), then the
    # old single-bucket shape ascending until it dies — at flood m the
    # old shape materializes C(m, 2) structs in ONE array in ONE task,
    # and past ~10⁸ pairs that is a JVM heap OOM that can take the
    # whole SparkContext down. Catch and record; stop the old side at
    # the first failure.
    rows = []
    for flood in floods:
        fps = synth_flood_fps(spark, n, flood)
        t0 = time.time()
        c_new = hamming_near_dup_pairs(fps, "doc_id", "fp", BITS, MAX_HAMMING).count()
        rows.append(
            {
                "flood": flood,
                "pairs_new": c_new,
                "within_expected": flood * (flood - 1) // 2,
                "sec_new": round(time.time() - t0, 2),
            }
        )
    for row in rows:
        fps = synth_flood_fps(spark, n, row["flood"])
        t0 = time.time()
        try:
            c_old = old_shape_pairs(fps, BITS, MAX_HAMMING).count()
            row["pairs_old"] = c_old
            row["lossless"] = c_old == row["pairs_new"]
            row["sec_old"] = round(time.time() - t0, 2)
        except Exception as ex:  # noqa: BLE001 — OOM/agg-buffer death is the datum
            row["pairs_old"] = f"FAILED: {type(ex).__name__}: {str(ex)[:160]}"
            row["sec_old"] = round(time.time() - t0, 2)
            break
    return {"op": "pairs_ab", "n": n, "rows": rows}


def main() -> None:
    n = 1_000_000
    frac = 0.5
    ops = ["edges_flood", "bucket_census", "pairs_ab"]
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--n":
            n = int(args[i + 1]); i += 2
        elif args[i] == "--flood-frac":
            frac = float(args[i + 1]); i += 2
        elif args[i] == "--ops":
            ops = args[i + 1].split(","); i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    from spk_sl_validation_spark.session import build_session

    spark = build_session(app_name="hamming-flood-probe")
    flood = int(n * frac)
    for op in ops:
        if op == "edges_flood":
            out = op_edges_flood(spark, n, flood)
        elif op == "bucket_census":
            out = op_bucket_census(spark, n, flood)
        elif op == "pairs_ab":
            # the lossless pair relation is itself O(flood²) rows, so
            # the A/B uses growing-but-countable floods in a smaller
            # corpus; the point is the SLOPE and where the work lands
            out = op_pairs_ab(spark, min(n, 200_000), [2_000, 4_000, 8_000, 16_000])
        else:
            raise SystemExit(f"unknown op {op}")
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
