"""Adversarial-skew dedup probe (SCALE.md §7).

Corpus: n docs where ONE near-dup cluster is 50% of ALL docs — every
even id is a near-duplicate of doc 0's body plus a unique one-token
tail; odd ids are unique bodies. This is the worst input for LSH
banding: each band's hot bucket holds n/2 members, so UNCAPPED
in-bucket pair expansion would be C(n/2, 2) — quadratic in corpus
size. The probe measures each layer of the defense in isolation:

1. ``census``      — pre-cap bucket census: the hot bucket really is
                     n/2 in every band (the adversarial input is real).
2. ``clusters``    — dedup_clusters end-to-end (stars CC) on the hot
                     corpus AND a same-size uniform corpus: with the
                     hot-bucket cap (ext/dedup.py MAX_BUCKET_SIZE) the
                     two should cost about the same — the cap absorbs
                     the skew; reports post-cap max bucket (== cap),
                     verified-pair mass, and the max component size.
3. ``verify_skew`` — the verify join under the 100 TB regime (doc-set
                     broadcast disabled, AQE skew thresholds sized to
                     probe bytes) with a RAISED cap so the pair
                     relation carries a genuinely heavy head key:
                     reports whether AQE emitted skewed-partition
                     splits (AQEShuffleRead ... skewed) in the final
                     adaptive plan. The cap bounds per-key pair
                     multiplicity by design; AQE skew-split is the
                     backstop underneath it.
4. ``megastar``    — stars-CC directly on a synthesized mega-component
                     (one hub with n/2 spokes welded to a 64-long
                     chain): the component shape a 50%-dup corpus
                     collapses into. Measures round count (≈2·log d,
                     not diameter) and wall on the groupBy-min hot key.
5. ``propagation_skew`` — the one join in the engine where a
                     mega-component concentrates on a single shuffle
                     key (min-label propagation's edges⋈labels round):
                     AQE skew-split A/B (on vs off) + the skew=true
                     plan marker.

Usage: python tools/skew_probe.py [--docs 2000000] \
           [--ops census,clusters,verify_skew,megastar,propagation_skew]
Prints one JSON line per op.
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

BANDS = 6
NUM_HASHES = 12
SHINGLE_N = 3


def synth_hot_corpus(spark, n: int, hot: bool = True):
    """(doc_id, text). hot=True: every EVEN id shares doc 0's 45-word
    body plus a unique tail token (pairwise Jaccard ≈ 0.93 ≥ 0.8 —
    one near-dup cluster spanning 50% of the corpus). hot=False: all
    ids get unique bodies (the uniform control, same sizes)."""
    base = spark.range(n).withColumnRenamed("id", "doc_id")

    def body(seed_col):
        # xxhash64-mixed words: affine formulas in (seed, i) alias
        # across seeds (shifted-parabola overlap makes "unique" bodies
        # accidentally near-duplicate); a hash mix cannot.
        return F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    F.xxhash64(
                        F.concat(seed_col.cast("string"), F.lit(f"_{i}"))
                    ).cast("string"),
                )
                for i in range(40)
            ],
        )

    uniq = F.concat(F.lit("hdr shared span marker "), body(F.col("doc_id")))
    if not hot:
        return base.select("doc_id", uniq.alias("text"))
    hot_body = F.concat(
        F.lit("hdr shared span marker "),
        body(F.lit(0)),
        F.lit(" tail"),
        F.col("doc_id").cast("string"),
    )
    text = F.when(F.col("doc_id") % 2 == 0, hot_body).otherwise(uniq)
    return base.select("doc_id", text.alias("text"))


def final_plan(df) -> str:
    """Execute the DataFrame's OWN QueryExecution and return the final
    adaptive plan (a `.write.noop` would execute a separate
    QueryExecution and leave this one at isFinalPlan=false)."""
    qe = df._jdf.queryExecution()
    qe.toRdd().count()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(qe, "formatted")


def run(spark, op: str, n: int) -> dict:
    from spk_sl_validation_spark.ext.dedup import (
        MAX_BUCKET_SIZE,
        capped_band_rows,
        dedup_clusters,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_for_pairs,
    )

    docs = synth_hot_corpus(spark, n, hot=True).localCheckpoint(eager=True)

    if op == "census":
        sig = minhash_signatures(docs, "doc_id", "text", NUM_HASHES, SHINGLE_N)
        # UNCAPPED band rows: cap = n means no row is dropped.
        rows = capped_band_rows(sig, "doc_id", NUM_HASHES // BANDS, BANDS, n)
        t0 = time.time()
        pre = (
            rows.groupBy("band", "h0", "h1")
            .count()
            .agg(
                F.max("count").alias("max_bucket"),
                F.sum(F.when(F.col("count") > MAX_BUCKET_SIZE, 1).otherwise(0)).alias(
                    "buckets_over_cap"
                ),
            )
            .first()
        )
        capped = capped_band_rows(sig, "doc_id", NUM_HASHES // BANDS, BANDS, MAX_BUCKET_SIZE)
        post = (
            capped.groupBy("band", "h0", "h1").count().agg(F.max("count").alias("m")).first()
        )
        wall = time.time() - t0
        return {
            "op": op,
            "docs": n,
            "wall_sec": round(wall, 1),
            "pre_cap_max_bucket": pre["max_bucket"],
            "pre_cap_buckets_over_cap": int(pre["buckets_over_cap"]),
            "post_cap_max_bucket": post["m"],
            "cap": MAX_BUCKET_SIZE,
            "uncapped_pair_upper": (n // 2) * (n // 2 - 1) // 2,
            "capped_pair_upper": BANDS * MAX_BUCKET_SIZE * (MAX_BUCKET_SIZE - 1) // 2,
        }

    if op == "clusters":
        out = {}
        for label, hot in (("hot", True), ("uniform", False)):
            corpus = docs if hot else synth_hot_corpus(spark, n, hot=False).localCheckpoint(
                eager=True
            )
            t0 = time.time()
            clusters = dedup_clusters(corpus, "doc_id", "text", method="stars")
            sizes = (
                clusters.groupBy("cluster_id")
                .count()
                .agg(
                    F.max("count").alias("max_comp"),
                    F.sum(F.when(F.col("count") > 1, 1).otherwise(0)).alias("n_nontrivial"),
                )
                .first()
            )
            out[label] = {
                "wall_sec": round(time.time() - t0, 1),
                "max_component": sizes["max_comp"],
                "nontrivial_components": int(sizes["n_nontrivial"]),
            }
        out.update(
            {
                "op": op,
                "docs": n,
                "cap": MAX_BUCKET_SIZE,
                "hot_over_uniform": round(
                    out["hot"]["wall_sec"] / max(out["uniform"]["wall_sec"], 1e-9), 2
                ),
            }
        )
        return out

    if op == "verify_skew":
        # The 100 TB regime: doc_sets too big to broadcast; skew
        # thresholds sized to probe bytes — at cluster scale the
        # defaults (256 MB) play the same role against multi-GB
        # partitions. Two caps: the production default (per-key pair
        # multiplicity bounded ≈ cap·bands — AQE should find NOTHING
        # to split) and a raised cap (the heavy head key reappears —
        # AQE's skew-split is the backstop underneath the cap).
        conf = spark.conf
        saved = {
            k: conf.get(k)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            )
        }
        out = {"op": op, "docs": n}
        try:
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
            conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
            for label, cap in (("default_cap", MAX_BUCKET_SIZE), ("raised_cap", 4096)):
                pairs = lsh_candidate_pairs(
                    docs, "doc_id", "text", NUM_HASHES, BANDS, SHINGLE_N,
                    max_bucket_size=cap, with_estimate=False,
                ).localCheckpoint(eager=True)
                n_pairs = pairs.count()
                # Per-join-key multiplicity: the cap bounds how many
                # pairs any single doc id can appear in (≲ cap·bands).
                key_mult = (
                    pairs.groupBy("id_a").count().agg(F.max("count").alias("m")).first()["m"]
                )
                t0 = time.time()
                verified = ngram_jaccard_for_pairs(docs, pairs, "doc_id", "text", SHINGLE_N)
                plan = final_plan(verified.filter(F.col("jaccard") >= 0.8))
                out[label] = {
                    "cap": cap,
                    "candidate_pairs": n_pairs,
                    "max_key_multiplicity": key_mult,
                    "wall_sec": round(time.time() - t0, 1),
                    "final_adaptive_plan": "isFinalPlan=true" in plan,
                    "skew_true_joins": len(re.findall(r"skew=true", plan)),
                    "sort_merge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
                }
        finally:
            for k, v in saved.items():
                conf.set(k, v)
        return out

    if op == "megastar":
        # One hub (node 0) with n/2 spokes, welded to a 64-node chain:
        # the mega-component a 50%-dup corpus collapses into, with
        # enough diameter that propagation would need ~64 rounds.
        from spk_sl_validation_spark.ext.graph import connected_components_stars

        half = n // 2
        spokes = spark.range(1, half).select(
            F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
        )
        chain = spark.range(64).select(
            (F.col("id") + half).alias("src"), (F.col("id") + half + 1).alias("dst")
        )
        weld = spark.range(1).select(
            F.lit(0).cast("long").alias("src"), F.lit(half).cast("long").alias("dst")
        )
        edges = spokes.unionAll(chain).unionAll(weld).localCheckpoint(eager=True)
        n_edges = edges.count()
        t0 = time.time()
        labels, rounds = connected_components_stars(edges)
        comp = (
            labels.groupBy("cluster_id")
            .count()
            .agg(F.max("count").alias("max_comp"), F.count(F.lit(1)).alias("n_comp"))
            .first()
        )
        wall = time.time() - t0
        return {
            "op": op,
            "nodes": half + 65,
            "edges": n_edges,
            "wall_sec": round(wall, 1),
            "rounds": rounds,
            "max_component": comp["max_comp"],
            "n_components": comp["n_comp"],
        }

    if op == "propagation_skew":
        # The one place in the engine where a mega-component DOES put
        # all its mass on a single shuffle key: min-label propagation's
        # per-round edges⋈labels join — a hub node with n spokes means
        # n symmetric-edge rows carry src=hub into ONE reduce
        # partition. The join matches AQE's skew pattern
        # (SMJ(Sort(Shuffle), Sort(Shuffle)) — labels is a checkpointed
        # table, not an aggregate), so OptimizeSkewedJoin splits the
        # hub partition by mapper ranges. Measures one propagation
        # round's join with skew handling ON vs OFF, and asserts the
        # skew=true marker in the final adaptive plan.
        half = n
        spokes = spark.range(1, half).select(
            F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
        )
        sym = spokes.unionAll(
            spokes.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        edges = sym.localCheckpoint(eager=True)
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        conf = spark.conf
        saved = {
            k: conf.get(k)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.adaptive.skewJoin.enabled",
            )
        }
        out = {"op": op, "nodes": half, "edges": half - 1}
        try:
            # labels can't broadcast at 100 TB (one row per corpus
            # doc); thresholds sized to probe bytes — defaults (256 MB)
            # play the same role against multi-GB hub partitions.
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
            conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
            for enabled in (True, False):
                conf.set("spark.sql.adaptive.skewJoin.enabled", str(enabled).lower())
                nbr = (
                    edges.join(labels, edges.src == F.col("node"))
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.min("cluster_id").alias("nbr_min"))
                )
                t0 = time.time()
                plan = final_plan(nbr)
                key = "skew_on" if enabled else "skew_off"
                out[key + "_wall_sec"] = round(time.time() - t0, 1)
                if enabled:
                    out["skew_true_joins"] = len(re.findall(r"skew=true", plan))
                    out["final_adaptive_plan"] = "isFinalPlan=true" in plan
        finally:
            for k, v in saved.items():
                conf.set(k, v)
        out["skew_speedup"] = round(
            out["skew_off_wall_sec"] / max(out["skew_on_wall_sec"], 1e-9), 2
        )
        return out

    if op == "substr_hot":
        # ExactSubstr ownership under mega-hot fingerprints: one
        # 16-token boilerplate phrase (>= min_len, so its spans
        # actually get removed) appears in 50% of all docs, so each of
        # its nine sliding w-gram hashes carries n/2 (id,pos) rows. The legacy
        # min-over-Window.partitionBy(h) shape pins all of them to a
        # single task (AQE cannot split window partitions); the
        # groupBy(h)+join-back shape absorbs the key in map-side
        # partials and leaves only an AQE-splittable join. Interleaved
        # A/B (3 alternating runs each, same session), identical output
        # row counts asserted.
        from spk_sl_validation_spark.ext.text import substring_dedup

        uniq = (
            "concat_ws(' ', transform(sequence(0, {k} - 1),"
            " i -> concat('t', CAST(id AS STRING), 'x', CAST(i + {off} AS STRING))))"
        )
        boiler = " ".join(f"boiler{i}" for i in range(16))
        corpus = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.when(
                    F.col("id") % 2 == 0,
                    F.expr(
                        f"concat({uniq.format(k=4, off=0)}, ' {boiler} ',"
                        f" {uniq.format(k=4, off=100)})"
                    ),
                ).otherwise(F.expr(uniq.format(k=24, off=0))).alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        out = {"op": op, "docs": n, "hot_fingerprint_rows": n // 2}
        walls: dict[str, list] = {"groupby": [], "window": []}
        counts: dict[str, int] = {}
        for rep in range(3):
            for shape in ("groupby", "window"):
                res = substring_dedup(corpus, "doc_id", "text", ownership=shape)
                t0 = time.time()
                c = res.where(F.col("n_spans_removed") > 0).count()
                walls[shape].append(round(time.time() - t0, 1))
                counts[shape] = c
        assert counts["groupby"] == counts["window"], counts
        out["docs_with_removed_spans"] = counts["groupby"]
        for shape in ("groupby", "window"):
            out[f"{shape}_walls_sec"] = walls[shape]
            out[f"{shape}_median_sec"] = sorted(walls[shape])[1]
            out[f"{shape}_min_sec"] = min(walls[shape])
        out["speedup_groupby_vs_window"] = round(
            out["window_median_sec"] / max(out["groupby_median_sec"], 1e-9), 2
        )
        # Structural half of the argument (drift-proof): with skew
        # thresholds sized to probe bytes, the groupby shape's
        # ownership join-back is AQE-skew-SPLIT (skew=true in the final
        # adaptive plan); the window shape funnels the same hot rows
        # into Window nodes behind a plain exchange AQE can never split
        # — zero skew markers by construction, not by luck.
        # (In the unforced plan AQE *broadcasts* the count>1-gated cand
        # side — 9 rows here — so the probe arm never shuffles on h at
        # all; broadcast is disabled below to force the shuffle join
        # and show the skew split that backstops the big-cand case.)
        conf = spark.conf
        saved = {
            k: conf.get(k)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            )
        }
        try:
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
            conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
            for shape in ("groupby", "window"):
                plan = final_plan(
                    substring_dedup(corpus, "doc_id", "text", ownership=shape).where(
                        F.col("n_spans_removed") > 0
                    )
                )
                out[f"{shape}_skew_true_joins"] = len(re.findall(r"skew=true", plan))
                out[f"{shape}_window_nodes"] = len(re.findall(r"\(\d+\) Window", plan))
        finally:
            for k, v in saved.items():
                conf.set(k, v)
        return out

    if op == "span_hot":
        # span_dedup ownership under ONE mega-hot span: the same
        # 8-word boilerplate span opens 50% of all docs, so its hash
        # carries n/2 (id, span_idx) rows. The legacy
        # min-over-Window.partitionBy(h) shape pins all of them to a
        # single task carrying span text (AQE cannot split window
        # partitions); the round-9 groupBy(h)+gated-join-back shape
        # hashes spans to longs first, absorbs the hot key in map-side
        # partials, and leaves only an AQE-splittable skinny join.
        # Interleaved A/B (3 alternating runs each, same session),
        # identical aggregate outputs asserted.
        from spk_sl_validation_spark.ext.text import span_dedup

        uniq = (
            "concat_ws(' ', transform(sequence(0, {k} - 1),"
            " i -> concat('t', CAST(id AS STRING), 'x', CAST(i + {off} AS STRING))))"
        )
        boiler = " ".join(f"boiler{i}" for i in range(8))
        corpus = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.when(
                    F.col("id") % 2 == 0,
                    F.expr(f"concat('{boiler} ', {uniq.format(k=8, off=0)})"),
                ).otherwise(F.expr(uniq.format(k=16, off=0))).alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        out = {"op": op, "docs": n, "hot_span_rows": n // 2}
        walls: dict[str, list] = {"groupby": [], "window": []}
        sums: dict[str, tuple] = {}
        for rep in range(3):
            for shape in ("groupby", "window"):
                res = span_dedup(corpus, "doc_id", "text", ownership=shape)
                t0 = time.time()
                row = res.selectExpr(
                    "sum(n_spans_dropped) AS d", "sum(n_spans_kept) AS k"
                ).collect()[0]
                walls[shape].append(round(time.time() - t0, 1))
                sums[shape] = (row["d"], row["k"])
        assert sums["groupby"] == sums["window"], sums
        out["spans_dropped"], out["spans_kept"] = sums["groupby"]
        for shape in ("groupby", "window"):
            out[f"{shape}_walls_sec"] = walls[shape]
            out[f"{shape}_median_sec"] = sorted(walls[shape])[1]
            out[f"{shape}_min_sec"] = min(walls[shape])
        out["speedup_groupby_vs_window"] = round(
            out["window_median_sec"] / max(out["groupby_median_sec"], 1e-9), 2
        )
        # Structural half (drift-proof, same setup as substr_hot):
        # with skew thresholds sized to probe bytes and broadcast
        # disabled (AQE otherwise broadcasts the tiny gated cand side
        # here), the groupby shape's ownership join-back shows
        # skew=true splits in the final adaptive plan; the window
        # shape funnels the same hot rows into a Window node behind a
        # plain exchange AQE can never split — zero markers by
        # construction.
        conf = spark.conf
        saved = {
            k: conf.get(k)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            )
        }
        try:
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
            conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
            for shape in ("groupby", "window"):
                plan = final_plan(
                    span_dedup(corpus, "doc_id", "text", ownership=shape).where(
                        F.col("n_spans_dropped") > 0
                    )
                )
                out[f"{shape}_skew_true_joins"] = len(re.findall(r"skew=true", plan))
                out[f"{shape}_window_nodes"] = len(re.findall(r"\(\d+\) Window", plan))
        finally:
            for k, v in saved.items():
                conf.set(k, v)
        return out

    if op == "politeness_hot":
        # Crawl politeness scheduling under a mega-domain (80% of the
        # manifest on ONE host): the shipped salt-blocked enumeration
        # (pmod(id, S) splits the domain across S window partitions)
        # vs the naive per-domain window (every hot row in ONE
        # unsplittable task). Both produce VALID schedules (<= rate
        # per (domain, wave), every url scheduled once — asserted
        # in-probe); they differ only in wave assignment, so the A/B
        # compares validity + wall, not byte equality.
        from pyspark.sql import Window as W_

        from spk_sl_validation_spark.ext.webcure import (
            _with_domain,
            politeness_schedule,
        )

        rate = 100
        crawl = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.when(
                    F.col("id") % 5 < 4, F.lit("https://hot.example.com/p/")
                )
                .otherwise(
                    F.concat(
                        F.lit("https://cold"),
                        (F.col("id") % 997).cast("string"),
                        F.lit(".org/p"),
                    )
                )
                .alias("url"),
            )
            .localCheckpoint(eager=True)
        )

        def naive(df):
            dom = _with_domain(df, "url", False)
            w = W_.partitionBy("__dom").orderBy("doc_id")
            return (
                dom.withColumn(
                    "wave",
                    ((F.row_number().over(w) - 1) / rate).cast("bigint"),
                )
                .withColumnRenamed("__dom", "domain")
            )

        def validity(df):
            agg = df.groupBy("domain", "wave").count()
            row = agg.agg(
                F.max("count").alias("mx"), F.sum("count").alias("total")
            ).first()
            return int(row["mx"]), int(row["total"])

        out = {"op": op, "docs": n, "hot_rows": n * 4 // 5, "rate": rate}
        walls: dict[str, list] = {"salt_blocked": [], "naive_window": []}
        checks: dict[str, tuple] = {}
        for rep in range(3):
            for shape in ("salt_blocked", "naive_window"):
                res = (
                    politeness_schedule(crawl, rate)
                    if shape == "salt_blocked"
                    else naive(crawl)
                )
                t0 = time.time()
                checks[shape] = validity(res)
                walls[shape].append(round(time.time() - t0, 1))
        for shape, (mx, total) in checks.items():
            assert mx <= rate, (shape, mx)
            assert total == n, (shape, total)
        out["max_per_domain_wave"] = {k: v[0] for k, v in checks.items()}
        for shape in walls:
            out[f"{shape}_walls_sec"] = walls[shape]
            out[f"{shape}_median_sec"] = sorted(walls[shape])[1]
            out[f"{shape}_min_sec"] = min(walls[shape])
        out["speedup_salted_vs_naive"] = round(
            out["naive_window_median_sec"] / max(out["salt_blocked_median_sec"], 1e-9), 2
        )
        # Structural half: the naive plan's window partitions by the
        # domain alone (hot key -> one task, AQE cannot split window
        # partitions); the shipped plan's window spec carries __salt.
        for shape, df in (("salt_blocked", politeness_schedule(crawl, rate)),
                          ("naive_window", naive(crawl))):
            fmt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            specs = re.findall(r"windowspecdefinition\(([^)]*)\)", fmt)
            out[f"{shape}_salted_window_specs"] = sum("__salt" in x for x in specs)
        return out

    if op == "domain_cap_hot":
        # URL-curation skew probe: 80% of the crawl on ONE domain. The
        # shipped domain_cap is the PLAIN rank-limit window — Catalyst
        # rewrites it to a WindowGroupLimit pair (map-side partial +
        # final), bounding the hot domain's shuffle mass at k rows per
        # input partition. The contender here is the hand-salted
        # two-phase top-k this repo almost shipped instead; the probe
        # is the evidence it would have been redundant machinery.
        # Interleaved A/B, identical keep sets asserted.
        from spk_sl_validation_spark.ext.webcure import (
            domain_cap,
            extract_domain,
            normalize_url,
        )
        from pyspark.sql import Window as W

        crawl = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.when(
                    F.col("id") % 5 < 4, F.lit("https://hot.example.com/p/")
                )
                .otherwise(
                    F.concat(
                        F.lit("https://cold"),
                        (F.col("id") % 997).cast("string"),
                        F.lit(".org/p"),
                    )
                )
                .alias("url"),
            )
            .localCheckpoint(eager=True)
        )
        k = 100
        out = {"op": op, "docs": n, "hot_rows": n * 4 // 5, "k": k}
        walls: dict[str, list] = {"window_group_limit": [], "hand_salted": []}
        counts: dict[str, int] = {}

        def hand_salted(df, k, n_salts=64):
            dom = df.withColumn("__dom", extract_domain(normalize_url("url")))
            salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts))
            w1 = W.partitionBy("__dom", "__salt").orderBy("doc_id")
            surv = (
                dom.withColumn("__salt", salt)
                .withColumn("__rn1", F.row_number().over(w1))
                .filter(F.col("__rn1") <= k)
                .drop("__rn1", "__salt")
            )
            w2 = W.partitionBy("__dom").orderBy("doc_id")
            return (
                surv.withColumn("__rn", F.row_number().over(w2))
                .filter(F.col("__rn") <= k)
                .drop("__rn", "__dom")
            )

        for rep in range(3):
            for shape in ("window_group_limit", "hand_salted"):
                res = domain_cap(crawl, k) if shape == "window_group_limit" else hand_salted(crawl, k)
                t0 = time.time()
                counts[shape] = res.count()
                walls[shape].append(round(time.time() - t0, 1))
        assert counts["window_group_limit"] == counts["hand_salted"], counts
        out["kept"] = counts["window_group_limit"]
        for shape, ws in walls.items():
            out[f"{shape}_walls_sec"] = ws
            out[f"{shape}_median_sec"] = sorted(ws)[1]
            out[f"{shape}_min_sec"] = min(ws)
        out["shipped_vs_salted"] = round(
            out["hand_salted_median_sec"] / max(out["window_group_limit_median_sec"], 1e-9), 2
        )
        return out

    raise SystemExit(f"unknown op {op!r}")


def main() -> None:
    n = 2_000_000
    ops = ["census", "clusters", "verify_skew", "megastar", "propagation_skew"]
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--docs" and i + 1 < len(args):
            n = int(args[i + 1])
        if a == "--ops" and i + 1 < len(args):
            ops = args[i + 1].split(",")

    import os

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    from spk_sl_validation_spark.session import build_session

    spark = build_session(
        app_name="skew-probe",
        extra_conf={"spark.sql.shuffle.partitions": "256"},
    )
    for op in ops:
        print(json.dumps(run(spark, op, n)), flush=True)


if __name__ == "__main__":
    main()
