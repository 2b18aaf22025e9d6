"""Scale probe: run the heavy corpus operators on a synthesized corpus
hundreds of times larger than sf0.1 and record wall clock + throughput.

The sf tests prove CORRECTNESS; this probe provides measured evidence
for the SCALE story — that the dedup/span operators complete with
bounded memory and near-linear cost when the corpus is 2–3 orders of
magnitude past the bench scale, on the same local[32] profile. Results
are recorded in SCALE.md §"Measured scale probe".

Synthesized corpus (deterministic, seedless — pure id arithmetic):
- ~55 words/doc drawn from a small vocabulary by affine hashing;
- 10% of docs are EXACT duplicates of a base doc (id - id%7 when
  id%7 aints to a dup slot);
- 5% are NEAR duplicates (base text + a unique tail);
- every doc shares one corpus-wide boilerplate span (hot-bucket /
  hot-span pressure on LSH banding and span ownership).

Usage:  python tools/scale_probe.py [--docs 2000000] [--ops span,pipeline,incremental]
Prints one JSON line per op: {"op", "docs", "wall_sec", "docs_per_sec"}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def synth_docs(spark, n: int):
    """(doc_id, text): deterministic corpus with dup structure."""
    from pyspark.sql import functions as F

    base = spark.range(n).withColumnRenamed("id", "doc_id")
    # 40 payload words from a 4096-word hashed vocabulary + shared header
    words = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                ((F.col("doc_id") * (2 * i + 1) + i * i) % 4096).cast("string"),
            )
            for i in range(40)
        ],
    )
    body = F.concat(F.lit("corpus shared header boilerplate span marker "), words)
    is_exact_dup = (F.col("doc_id") % 10 == 9) & (F.col("doc_id") % 7 != 0)
    is_near_dup = F.col("doc_id") % 20 == 10
    base_id = F.col("doc_id") - (F.col("doc_id") % 7)
    base_words = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                ((base_id * (2 * i + 1) + i * i) % 4096).cast("string"),
            )
            for i in range(40)
        ],
    )
    base_body = F.concat(F.lit("corpus shared header boilerplate span marker "), base_words)
    text = (
        F.when(is_exact_dup, base_body)
        .when(is_near_dup, F.concat(base_body, F.lit(" tail"), F.col("doc_id").cast("string")))
        .otherwise(body)
    )
    return base.select("doc_id", text.alias("text"))


def spark_of(df):
    return df.sparkSession


def run(op: str, docs, n: int) -> dict:
    from pyspark.sql import functions as F

    from spk_sl_validation_spark.ext.assembly import bigram_logprob
    from spk_sl_validation_spark.ext.dedup import dedup_corpus, dedup_incremental
    from spk_sl_validation_spark.ext.text import span_dedup

    t0 = time.time()
    if op == "span":
        out = span_dedup(docs, "doc_id", "text", 8)
    elif op == "pipeline":
        out = dedup_corpus(docs, "doc_id", "text")
    elif op == "pipeline_exact_first":
        out = dedup_corpus(docs, "doc_id", "text", exact_first=True)
    elif op == "incremental":
        out = dedup_incremental(docs, is_new=F.col("doc_id") % 5 == 0)
    elif op == "bigram":
        out = bigram_logprob(docs, "doc_id", "text")
    elif op == "bm25":
        # Query 2 hits the corpus-wide boilerplate terms, so its tf
        # stream touches EVERY document — the worst-case stop-word
        # query; 1 and 3 are selective hashed-vocab terms.
        from spk_sl_validation_spark.ext.retrieval import bm25_rank

        out = bm25_rank(
            docs,
            [
                (1, "w17 w123 w999"),
                (2, "boilerplate marker w5"),
                (3, "w2048 w1024 w512 w256"),
            ],
        )
    elif op == "incremental_indexed":
        # Index artifacts are PRECOMPUTED (materialized outside the
        # timed window) — measures what a production shard pays when
        # the corpus index already exists. Batch = every 20th doc.
        from spk_sl_validation_spark.ext.dedup import (
            dedup_incremental_indexed,
            dedup_index_tables,
        )

        is_batch = F.col("doc_id") % 20 == 0
        index = tuple(
            t.localCheckpoint(eager=True)
            for t in dedup_index_tables(docs.filter(~is_batch))
        )
        batch = docs.filter(is_batch).localCheckpoint(eager=True)
        t0 = time.time()  # restart the clock: index build is excluded
        out = dedup_incremental_indexed(batch, *index)
        out.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        n_batch = n // 20
        return {
            "op": op,
            "docs": n_batch,
            "wall_sec": round(wall, 1),
            "docs_per_sec": int(n_batch / wall),
            "index_docs": n - n_batch,
        }
    elif op in ("fuzzy", "fuzzy_banded", "fuzzy_collapsed"):
        # 10x the sf0.1 part catalog: the REAL part table replicated
        # 10x with fresh keys (name distribution — and therefore block
        # key cardinality/skew — identical to the bench data). Records
        # the block-size distribution alongside wall time. "fuzzy"
        # keeps the bench blocking key and measures the quadratic
        # blow-up directly; "fuzzy_banded" runs the documented scale
        # dial (length-banded key, ext/linkage.py) on the same catalog
        # so the candidate cut is a same-corpus A/B.
        from spk_sl_validation_spark.ext.linkage import (
            block_firstchar_lasttoken,
            block_firstchar_lasttoken_lenband,
            fuzzy_best_match,
            fuzzy_best_match_collapsed,
        )

        spark = docs.sparkSession
        part = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
        n_rep = 10
        big = (
            part.crossJoin(spark.range(n_rep).withColumnRenamed("id", "__rep"))
            .select(
                (F.col("p_partkey") * n_rep + F.col("__rep")).alias("p_partkey"),
                "p_name",
            )
            .localCheckpoint(eager=True)
        )
        n_parts = big.count()
        blk = (
            block_firstchar_lasttoken_lenband("p_name")
            if op == "fuzzy_banded"
            else block_firstchar_lasttoken("p_name")
        )
        sizes = big.select(blk.alias("blk")).groupBy("blk").count()
        stats = sizes.agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.max("count").alias("max_block"),
            F.sum(F.col("count") * F.col("count")).alias("cand_upper"),
        ).first()
        fn = fuzzy_best_match_collapsed if op == "fuzzy_collapsed" else fuzzy_best_match
        t0 = time.time()
        out = fn(big, "p_partkey", "p_name", blk, max_dist=4)
        out.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        return {
            "op": op,
            "docs": n_parts,
            "wall_sec": round(wall, 1),
            "docs_per_sec": int(n_parts / wall),
            "n_blocks": stats["n_blocks"],
            "max_block": stats["max_block"],
            "cand_pairs_upper": int(stats["cand_upper"]),
        }
    elif op == "pagerank_conv":
        # Convergence-mode PageRank: same 20M-event graph as the
        # "pagerank" op but iterating until_delta with a tolerance
        # tight enough to require >= 10 iterations — the probe that
        # shows plan depth stays bounded (lineage truncated every
        # checkpoint_every iterations) and per-iteration cost stays
        # flat far past the oracle's fixed 3-iteration unroll.
        from spk_sl_validation_spark.ext.graph import pagerank_until_delta, transition_edges

        # SKEWED type distribution (floor(log2) of a hash → geometric):
        # a uniform graph's ranks are uniform from iteration 1 and
        # until_delta would (correctly) stop immediately — skew forces
        # genuine multi-iteration convergence.
        n_users = max(n // 200, 1)
        events = (
            docs.sparkSession.range(n)
            .select(
                (F.col("id") % n_users).alias("user_id"),
                F.col("id").alias("ts"),
                F.col("id").alias("event_id"),
                F.concat(
                    F.lit("e"),
                    F.floor(F.log2(((F.col("id") * 2654435761) % 4096) + 1)).cast("string"),
                ).alias("event_type"),
            )
        )
        t0 = time.time()
        ranks, n_run = pagerank_until_delta(
            transition_edges(events), eps=1e-10, max_iter=15, checkpoint_every=5
        )
        ranks.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        return {
            "op": op,
            "docs": n,
            "wall_sec": round(wall, 1),
            "docs_per_sec": int(n / wall),
            "iterations_run": n_run,
        }
    elif op == "pagerank":
        # Synthesized event stream: n "events" over n/200 users and 64
        # event types; the corpus-scale stage (per-user lag window +
        # edge aggregation) dominates, the power iterations run on the
        # aggregated 64-node graph.
        from spk_sl_validation_spark.ext.graph import pagerank, transition_edges

        n_users = max(n // 200, 1)
        events = (
            docs.sparkSession.range(n)
            .select(
                (F.col("id") % n_users).alias("user_id"),
                F.col("id").alias("ts"),
                F.col("id").alias("event_id"),
                F.concat(F.lit("e"), ((F.col("id") * 2654435761) % 64).cast("string")).alias(
                    "event_type"
                ),
            )
        )
        t0 = time.time()
        out = pagerank(transition_edges(events))
        out.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        return {"op": op, "docs": n, "wall_sec": round(wall, 1), "docs_per_sec": int(n / wall)}
    elif op == "prefix_join":
        # Exact AllPairs prefix-filter Jaccard join on the synthetic
        # corpus (dup structure gives real qualifying pairs; the shared
        # header shingles are the most frequent tokens, so the prefix
        # filter must exclude them or the candidate join goes
        # quadratic). Also records the prefix-bucket candidate upper
        # bound — the dial the docstring claims stays small.
        from pyspark.sql import Window

        from spk_sl_validation_spark.ext.dedup import jaccard_join_prefix
        from spk_sl_validation_spark.ext.hashing import shingle_rows

        sh = shingle_rows(docs, "doc_id", "text", 3).distinct()
        freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"))
        w_doc = Window.partitionBy("doc_id")
        ranked = (
            sh.join(freq.hint("shuffle_hash"), "s")
            .withColumn(
                "pos",
                F.row_number().over(w_doc.orderBy(F.col("cnt").asc(), F.col("s").asc())),
            )
            .withColumn("n_sh", F.count(F.lit(1)).over(w_doc))
        )
        prefix = ranked.filter(
            F.col("pos") <= F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(0.5)) + 1
        )
        pstats = (
            prefix.groupBy("s")
            .count()
            .agg(
                F.count(F.lit(1)).alias("n_buckets"),
                F.max("count").alias("max_bucket"),
                F.sum(F.col("count") * F.col("count")).alias("cand_upper"),
            )
            .first()
        )
        t0 = time.time()
        out = jaccard_join_prefix(docs, "doc_id", "text", 3, 0.5)
        n_pairs = out.count()
        wall = time.time() - t0
        return {
            "op": op,
            "docs": n,
            "wall_sec": round(wall, 1),
            "docs_per_sec": int(n / wall),
            "n_pairs": n_pairs,
            "prefix_buckets": pstats["n_buckets"],
            "max_prefix_bucket": pstats["max_bucket"],
            "cand_pairs_upper": int(pstats["cand_upper"]),
        }
    elif op == "rate_limit":
        # Arrow-batched per-key ordered fold (applyInPandas): n events
        # over n/10000 users — measures the sequential-fold class's
        # throughput (one Python pass per user's sorted events, keys in
        # parallel; the per-task cost is Arrow transfer + a tight
        # Python loop).
        from pyspark.sql import functions as F

        from spk_sl_validation_spark.ext.events import rate_limit_accept

        n_users = max(n // 10_000, 1)
        events = (
            docs.sparkSession.range(n)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % n_users).alias("user_id"),
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000
                ).alias("ts"),
            )
            .localCheckpoint(eager=True)
        )
        t0 = time.time()
        out = rate_limit_accept(events, 5.0, 0.01)
        out.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        return {
            "op": op,
            "docs": n,
            "wall_sec": round(wall, 1),
            "docs_per_sec": int(n / wall),
            "n_users": n_users,
        }
    elif op == "incremental_exact":
        # One-sided prefix-filter exact dedup, batch vs PREBUILT index
        # (prefix_index_tables materialized outside the timed window).
        # Own corpus synthesis: word residues mod n//8 keep near-dup
        # clusters ~8 strong so output pair mass stays bounded and the
        # measurement reads probe cost, not result writing (synth_docs'
        # fixed mod-4096 structure would put every doc in a ~n/4096
        # clique — the output-bound regime the prefix_join probe
        # already covers).
        from spk_sl_validation_spark.ext.dedup import (
            jaccard_incremental_prefix_indexed,
            prefix_index_tables,
        )

        mod = max(4096, n // 8)
        words = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    (((F.col("doc_id") % mod) * (2 * i + 1) + i * i) % 65536).cast("string"),
                )
                for i in range(40)
            ],
        )
        big = (
            docs.sparkSession.range(n)
            .withColumnRenamed("id", "doc_id")
            .select("doc_id", F.concat(F.lit("hdr shared span marker "), words).alias("text"))
            .localCheckpoint(eager=True)
        )
        is_batch = F.col("doc_id") % 20 == 0
        sh, freq = (
            t.localCheckpoint(eager=True)
            for t in prefix_index_tables(big.filter(~is_batch))
        )
        batch = big.filter(is_batch).localCheckpoint(eager=True)
        t0 = time.time()  # index build excluded — the production shard cost
        out = jaccard_incremental_prefix_indexed(batch, sh, freq)
        n_pairs = out.count()
        wall = time.time() - t0
        n_batch = n // 20
        return {
            "op": op,
            "docs": n_batch,
            "wall_sec": round(wall, 1),
            "docs_per_sec": int(n_batch / wall),
            "index_docs": n - n_batch,
            "n_pairs": n_pairs,
        }
    elif op == "novelty":
        # Marginal n-gram novelty: synthesize a source label (16
        # sources by doc_id band so "later" sources repeat earlier
        # content via the dup structure) and run the registered shape.
        from spk_sl_validation_spark.ext.hashing import md5_long, word_shingles, ws_tokens

        src_docs = docs.withColumn(
            "source", F.concat(F.lit("s"), F.lpad((F.col("doc_id") % 16).cast("string"), 2, "0"))
        )
        t0 = time.time()
        grams = (
            src_docs.select("source", ws_tokens("text").alias("t"))
            .select("source", F.explode(word_shingles("t", 3)).alias("sg"))
            .select("source", md5_long("sg").alias("h"))
            .distinct()
        )
        d = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n_distinct"))
        nov = (
            grams.groupBy("h")
            .agg(F.min("source").alias("source"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_novel"))
        )
        out = d.join(nov, "source", "left")
    elif op == "substring_dedup":
        # ExactSubstr maximal-span dedup (Lee et al. 2022): the span
        # relation is the scale object (~tokens/8 rows per doc); the
        # probe corpus's 15% dup mass gives real multi-span merges.
        from spk_sl_validation_spark.ext.text import substring_dedup

        out = substring_dedup(docs, "doc_id", "text")
    elif op == "web_curation":
        # The URL-layer curation pass composed end-to-end (robots.txt
        # longest-match gate -> blocklist -> URL dedup -> domain cap):
        # ONLY (id, url) rows move — no text column exists in this
        # probe on purpose: at 100 TB the URL layer runs on the
        # crawl manifest, not the page bodies. Probe URLs follow the
        # webcure fixture law, so normalized classes repeat every 60
        # ids and the dedup/cap stages do real work at any n.
        from spk_sl_validation_spark.ext import webcure as W

        spark = spark_of(docs)
        urls = W.synthesize_url_table(docs.select("doc_id"))
        robots = W.synthesize_robots_table(urls)
        blocked = spark.createDataFrame(
            [("site0.com",), ("site3.co.uk",)], "domain string"
        )
        kept = W.domain_cap(
            W.url_dedup(W.blocklist_filter(W.robots_txt_filter(urls, robots), blocked)),
            3,
        )
        out = kept
    elif op == "ingest_text":
        # The round-9 page-text layer end-to-end as pure narrow maps
        # (zero exchanges by construction): synthesize main-content-law
        # pages, extract main content, then C4-gate the result. The
        # probe measures per-core throughput — at 100 TB these scale
        # out embarrassingly, so pages/s here IS the cluster story
        # divided by core count.
        from spk_sl_validation_spark.ext import webcure as W

        pages = W.synthesize_main_content_table(docs.select("doc_id"))
        mc = W.main_content_extract(pages)
        out = W.c4_clean(mc, "doc_id", "main_text")
    elif op == "web_corpus":
        # The round-10 composed crawl→corpus pipeline end-to-end:
        # WARC parse (Arrow map) → 200 gate → main content →
        # paragraph dedup → C4 → lang-id + Gopher gates, all narrow
        # (zero exchanges by construction; evaluate_once barriers keep
        # each interpreted-HOF text stage single-evaluation). Pages/s
        # here IS the cluster story divided by core count.
        from spk_sl_validation_spark.plans.webcure_queries import (
            _corpus_pipeline_over,
        )

        out = _corpus_pipeline_over(docs.select("doc_id"))
    elif op == "warc_parse":
        # WARC record explode at archive scale (Arrow-batched map):
        # fixture archives carry 1-3 response records each.
        from spk_sl_validation_spark.ext import warc as WC

        out = WC.warc_records(WC.synthesize_warc_table(docs.select("doc_id")))
    elif op == "psl_lookup":
        # The PSL broadcast-join cascade on a host manifest: six
        # broadcast joins of a 9.5k-row relation, zero shuffles — the
        # probe pins the per-row cost of the cascade.
        from spk_sl_validation_spark.ext import psl as P

        hosts = P.synthesize_psl_host_table(docs.select("doc_id"))
        out = P.registrable_domain(hosts, "host")
    elif op == "url_dedup":
        # URL dedup alone at crawl-manifest scale: groupBy-min on the
        # normalized key + keep semi join.
        from spk_sl_validation_spark.ext import webcure as W

        out = W.url_dedup(W.synthesize_url_table(docs.select("doc_id")))
    elif op == "winnowing":
        # Winnowing fingerprint selection + cross-doc match groupBy:
        # per-row array HOFs (evaluate_once-barriered hash array) into
        # one map-side-combined agg on the 8-byte fp key. The probe
        # corpus's 15% dup mass yields real shared fingerprints.
        from spk_sl_validation_spark.ext.text import winnowing_fingerprints

        fps = winnowing_fingerprints(docs, k=3, w=4)
        out = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
            .filter(F.col("n_docs") >= 2)
        )
    elif op == "phrase":
        # Direct phrase search: one corpus scan, per-row HOF position
        # enumeration for 3 phrases at once — the grep shape.
        from spk_sl_validation_spark.ext.retrieval import phrase_search

        out = phrase_search(
            docs,
            ((0, "corpus shared header"), (1, "boilerplate span marker"), (2, "w1 w2")),
        )
    elif op == "image_dhash":
        # Perceptual-hash fingerprinting at image-corpus scale: Arrow
        # synth of real BMPs (the group law, 16..31×16..23) → decode +
        # dHash per payload → the 8-byte key relation. Pure map; the
        # probe pins payloads/s/core for the pre-embedding dedup pass.
        from spk_sl_validation_spark.ext import multimodal as M

        out = M.image_dhash(M.synthesize_bmp_group_table(docs.select("doc_id")))
    elif op == "audio_fp":
        # Audio fingerprinting at clip-corpus scale: Arrow synth of
        # real RIFF/WAVE clips (the variant-pair law, 200-256 frames)
        # → RIFF parse + 65-segment energy dHash per payload → the
        # 8-byte near-dup key relation. Pure map; clips/s/core is the
        # pre-transcription dedup constant.
        from spk_sl_validation_spark.ext import multimodal as M

        out = M.audio_fingerprint(M.synthesize_wav_variant_table(docs.select("doc_id")))
    elif op == "audio_near_dup":
        # End-to-end: fingerprints + the pre-collapsed banded Hamming
        # join (round-11 shape) — pairs count is the corpus's
        # constructed-pair mass plus random band collisions.
        from spk_sl_validation_spark.ext import multimodal as M
        from spk_sl_validation_spark.ext.dedup import hamming_near_dup_pairs

        fps = M.audio_fingerprint(
            M.synthesize_wav_variant_table(docs.select("doc_id"))
        ).select("doc_id", "afp")
        out = hamming_near_dup_pairs(fps, "doc_id", "afp", 64, 2)
    elif op == "bpe_learn":
        # Iterative BPE training: the corpus collapses to its
        # DISTINCT-WORD frequency table before any iteration — probe
        # cost should be the one tokenize+groupBy plus 5 vocab-sized
        # iterations, near-independent of corpus duplication.
        from spk_sl_validation_spark.ext.text import learn_bpe_merges

        t0 = time.time()
        merges = learn_bpe_merges(docs, "text", 5)
        n_m = merges.count()
        wall = time.time() - t0
        return {
            "op": op,
            "docs": n,
            "wall_sec": round(wall, 1),
            "docs_per_sec": int(n / wall),
            "merges": n_m,
        }
    elif op == "bpe_encode":
        # Tokenizer serving: learn on a 1% sample (the tokenizer), then
        # encode the WHOLE corpus as a pure narrow map — the timed
        # window is the encode, the shape that runs at 100 TB.
        from spk_sl_validation_spark.ext.text import bpe_encode_stats, learn_bpe_merges

        merges = [
            tuple(r)
            for r in learn_bpe_merges(
                docs.filter(F.col("doc_id") % 100 == 0), "text", 5
            ).collect()
        ]
        t0 = time.time()
        out = bpe_encode_stats(docs, merges)
    elif op == "quality_train":
        # Distributed batch GD for the logistic quality model: per
        # iteration one exact-decimal hash aggregate over the corpus
        # (3 iterations — the bounded oracle mode).
        from spk_sl_validation_spark.ext.text import train_quality_model

        t0 = time.time()
        w = train_quality_model(docs, iters=3)
        w.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        return {"op": op, "docs": n, "wall_sec": round(wall, 1), "docs_per_sec": int(n / wall)}
    elif op == "boilerplate":
        # Worst-case census pressure: EVERY document carries the shared
        # header span, so one hash owns n rows in the distinct-doc
        # census — the hot-key path the two-phase aggregate must absorb.
        from spk_sl_validation_spark.ext.text import boilerplate_removal

        out = boilerplate_removal(docs, "doc_id", "text", 8, min_docs=3)
    elif op == "boilerplate_indexed":
        # The production ingest shape: census artifacts PRECOMPUTED
        # (excluded from the timed window), a 5% fresh batch stripped
        # against the broadcast boilerplate set.
        from spk_sl_validation_spark.ext.text import apply_boilerplate_index, boilerplate_index

        is_batch = F.col("doc_id") % 20 == 0
        index = boilerplate_index(docs.filter(~is_batch), "doc_id", "text", 8, 3).localCheckpoint(
            eager=True
        )
        batch = docs.filter(is_batch).localCheckpoint(eager=True)
        t0 = time.time()
        out = apply_boilerplate_index(batch, index, "doc_id", "text", 8)
    elif op == "soft_weights":
        # Rides dedup_clusters (capped LSH + min-label propagation) —
        # the probe corpus's 7-doc dup families keep the propagation
        # diameter at 1-2 rounds while candidate volume scales with n.
        from spk_sl_validation_spark.ext.dedup import duplicate_soft_weights

        out = duplicate_soft_weights(docs, "doc_id", "text")
    elif op == "triangles":
        # Synthesized basket graph (docs unused): n baskets of 5 items
        # over an n/10-item space with overlapping affine picks — dense
        # enough for real wedge volume. Measures the degree-ordered
        # wedge join, the O(m^1.5) stage.
        from spk_sl_validation_spark.ext.graph import co_occurrence_edges, triangle_counts

        baskets = spark_of(docs).range(n * 5).select(
            (F.col("id") / 5).cast("long").alias("g"),
            ((F.col("id") * 2654435761 + (F.col("id") % 5) * 97) % (n // 10)).alias("item"),
        )
        t0 = time.time()
        out = triangle_counts(co_occurrence_edges(baskets, "g", "item"))
    else:
        raise SystemExit(f"unknown op {op!r}")
    out.write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    return {"op": op, "docs": n, "wall_sec": round(wall, 1), "docs_per_sec": int(n / wall)}


def main() -> None:
    n = 2_000_000
    ops = ["span", "pipeline", "incremental"]
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--docs" and i + 1 < len(args):
            n = int(args[i + 1])
        if a == "--ops" and i + 1 < len(args):
            ops = args[i + 1].split(",")

    import os

    # Size the local profile for a 100–400× bench corpus the same way
    # SCALE.md §1 sizes a cluster: enough heap for 32 concurrent tasks
    # (this box has 128 GiB; the default 16 g is bench-scale) and
    # enough shuffle partitions that per-task sort/agg state stays
    # small — AQE coalesces the excess.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    from spk_sl_validation_spark.session import build_session

    spark = build_session(
        app_name="scale-probe",
        extra_conf={"spark.sql.shuffle.partitions": "256"},
    )
    docs = synth_docs(spark, n)
    # Materialize the corpus once so every op measures ITS cost, not
    # the synthesis projection (localCheckpoint: executor-local blocks,
    # no driver collect).
    docs = docs.localCheckpoint(eager=True)
    for op in ops:
        print(json.dumps(run(op, docs, n)), flush=True)


if __name__ == "__main__":
    main()
