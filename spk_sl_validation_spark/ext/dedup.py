"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

North-star extension (not in the reference, whose only dedup is
key-based ``drop_duplicates`` — SURVEY.md §2.7). These are the
document-level dedup strategies a 100 TB training-corpus pipeline
needs, designed Spark-first:

- **Signatures are narrow maps.** MinHash/SimHash signatures are pure
  array expressions over the tokenized text (no explode, no Python,
  no shuffle) — at scale this is a single codegen'd projection per
  document, embarrassingly parallel.
- **Candidate generation is one banded shuffle.** LSH banding turns
  the O(n²) all-pairs problem into a join keyed on (band, band-hash):
  high-cardinality keys, well-distributed. Hot buckets (boilerplate
  documents sharing a band) are hard-capped to their smallest
  ``MAX_BUCKET_SIZE`` ids before any pair expansion, so one
  degenerate key can never quadratic-blow an executor.
- **Exact verification only on candidates.** n-gram Jaccard is
  computed only for LSH survivors at scale; the standalone
  ``ngram_jaccard_pairs`` exists as the exact/oracle path.

All hashes are the 60-bit md5 family (hashing.py) — deterministic
across engines so the DuckDB oracle can replay every step in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.hashing import md5_long, seeded_perm, ws_tokens
from spk_sl_validation_spark.ext.text import md5_fingerprint


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup on normalized text.

    Returns one row per document with its fingerprint, the group size,
    the group representative (min id), and an ``is_dup`` flag. One
    shuffle on the 128-bit fingerprint — uniformly distributed by
    construction, no skew.
    """
    fp = df.select(F.col(id_col), md5_fingerprint(text_col).alias("exact_fp"))
    groups = fp.groupBy("exact_fp").agg(
        F.count(F.lit(1)).alias("group_size"), F.min(id_col).alias("rep_id")
    )
    return (
        fp.join(groups, "exact_fp")
        .select(
            id_col,
            "exact_fp",
            "group_size",
            "rep_id",
            (F.col("group_size") > 1).alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 12,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig array<bigint> of length num_hashes): per seed i, the
    min permuted hash over word n-gram shingles.

    Shape: shingle rows (hashing.shingle_rows: posexplode + window
    lead, codegen'd, one exchange) → one md5 per shingle → groupBy(id)
    with ``num_hashes`` ``min(perm_i(h))`` aggregates. The aggregate
    reuses the shingle exchange's partitioning, so the whole signature
    computation costs exactly one shuffle of skinny token rows.

    Deliberately NOT an array-expression narrow map: higher-order
    array functions are interpreted (no codegen, no common-subexpr
    elimination), which made the per-row variant ~30× slower. One
    md5 per shingle; seeds are cheap affine permutations
    (hashing.seeded_perm). min() over a multiset equals min() over
    the set, so shingles need no dedup.
    """
    from spk_sl_validation_spark.ext.hashing import shingle_rows

    hashed = shingle_rows(df, id_col, text_col, shingle_n).select(id_col, md5_long("s").alias("h"))
    aggs = [F.min(seeded_perm(F.col("h"), i)).alias(f"mh{i}") for i in range(num_hashes)]
    return (
        hashed.groupBy(id_col)
        .agg(*aggs)
        .select(id_col, F.array(*[f"mh{i}" for i in range(num_hashes)]).alias("sig"))
    )


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 12,
    shingle_n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Append ``sig`` to ``df`` (join-back over :func:`minhash_signatures`)."""
    return df.join(minhash_signatures(df, id_col, text_col, num_hashes, shingle_n), id_col)


#: Default hot-bucket cap for LSH candidate generation. A (band, band
#: hashes) bucket holds one member per near-dup cluster doc; organic
#: clusters are small, but mass boilerplate (empty docs, shared
#: headers/licenses) can put millions of documents into ONE bucket,
#: and the in-bucket pair expansion is quadratic. Buckets are capped
#: to their ``MAX_BUCKET_SIZE`` smallest ids — deterministic, so the
#: DuckDB oracle replays the identical rule.
MAX_BUCKET_SIZE = 256


def capped_band_rows(
    sig_df: DataFrame,
    id_col: str,
    rows_per_band: int,
    bands: int,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, band, h0..h{r-1}, *carry): one row per (doc, band), each
    (band, band-hashes) bucket capped to its ``max_bucket_size``
    smallest ids via row_number BEFORE any downstream expansion.

    Shared by symmetric candidate generation (:func:`lsh_candidate_pairs`)
    and asymmetric batch-vs-index lookup (:func:`dedup_incremental`) so
    the hot-bucket rule — and therefore the oracle replay
    (dedup_shared.capped_bands_cte) — is defined exactly once. The
    window and every consumer group/join on the same bucket key, so
    the cap costs a sort inside the exchange consumers need anyway.
    """
    from pyspark.sql import Window

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                *[F.col("sig")[b * rows_per_band + r].alias(f"h{r}") for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    hcols = [f"h{r}" for r in range(rows_per_band)]
    exploded = sig_df.select(id_col, "sig", F.explode(band_structs).alias("bk")).select(
        id_col, *carry, "bk.band", *[F.col(f"bk.{h}").alias(h) for h in hcols]
    )
    w = Window.partitionBy("band", *hcols).orderBy(id_col)
    return (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_bucket_size)
        .drop("__rn")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    with_estimate: bool = True,
) -> DataFrame:
    """MinHash-LSH candidate pairs: (id_a, id_b, est_jaccard).

    ``with_estimate=False`` bands BARE ids (8 bytes/member through the
    cap window, collect_list, and pair-distinct); callers that
    re-verify candidates with exact Jaccard anyway
    (:func:`dedup_corpus`, :func:`dedup_clusters`) never read the
    estimate — identical output minus the column.
    ``with_estimate=True`` carries the signature arrays through
    banding and computes the estimate in the pair expansion. The
    alternative (band bare ids, checkpoint signatures, join them back
    to the distinct pairs — fewer shuffled bytes: ~352 vs ~768 per
    doc) measured 10% SLOWER at sf0.1 in a cache-cleared interleaved
    A/B (1.22 s vs 1.35 s median of 5): the eager checkpoint barrier
    and two extra shuffle-hash stages cost more than the byte saving
    until signatures dominate the shuffle, which at k=12 they do not.

    Signature → split into ``bands`` bands of ``num_hashes/bands``
    rows → self-join on (band index, band hashes) → distinct pairs,
    with the Jaccard estimate = fraction of agreeing signature slots.
    With r=2 rows/band and b=6 bands the S-curve threshold is
    (1/b)^(1/r) ≈ 0.41.

    Scale: the join key (band, h1, h2) is effectively unique per
    near-dup cluster — the shuffle is uniform; distinct() collapses
    multi-band matches. The probe is sig-only (id + 2 longs + the
    signature array), so shuffled bytes ≈ 8·(k+3) per doc per band,
    independent of document size.

    Hot-bucket protection: each bucket keeps only its
    ``max_bucket_size`` smallest ids (row_number over the bucket key,
    ordered by id, BEFORE collect_list — so both the collected array
    and the quadratic pair expansion are bounded regardless of corpus
    shape; the window sort spills, it cannot OOM). A mass-boilerplate
    bucket therefore yields at most C(cap, 2) pairs per band instead
    of C(millions, 2). Recall note: members beyond the cap lose their
    candidacy *in that bucket* — for true boilerplate the docs are
    byte-identical and exact dedup (exact_dup_groups) is the right
    tool upstream; the cap is the backstop that keeps LSH alive when
    it isn't run. The cap is part of the operator's contract and is
    replayed verbatim in the DuckDB oracles (QUALIFY row_number()).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig_df = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)

    # Candidate generation via groupBy-collect instead of a self-join:
    # a self-join would evaluate the signature subtree twice (Spark
    # does not share non-cached subtrees across join sides), doubling
    # the dominant cost. Here signatures are computed once, exploded
    # into 6 band rows, grouped by the full band key, and pairs are
    # expanded *within* each bucket (capped — see docstring). The
    # window and the aggregate share the same partitioning key, so
    # the cap costs a sort inside the existing exchange, not a new
    # shuffle.
    hcols = [f"h{r}" for r in range(rows_per_band)]
    if not with_estimate:
        capped = capped_band_rows(sig_df, id_col, rows_per_band, bands, max_bucket_size)
        buckets = (
            capped.groupBy("band", *hcols)
            .agg(F.collect_list(F.col(id_col)).alias("members"))
            .filter(F.size("members") > 1)
        )
        # ids within a bucket are distinct, so j > i suffices.
        pair_expr = F.expr(
            "flatten(transform(members, (m1, i) -> "
            "filter(transform(members, (m2, j) -> "
            "IF(j > i, struct(least(m1, m2) AS a, greatest(m1, m2) AS b), NULL)), "
            "p -> p IS NOT NULL)))"
        )
        return (
            buckets.select(F.explode(pair_expr).alias("p"))
            .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
            .distinct()
        )
    capped = capped_band_rows(
        sig_df, id_col, rows_per_band, bands, max_bucket_size, carry=("sig",)
    )
    buckets = (
        capped.groupBy("band", *hcols)
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), F.col("sig").alias("sig"))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    # All ordered pairs (i < j by id) within a bucket, as one array expr.
    pair_expr = F.expr(
        "flatten(transform(members, (m1, i) -> "
        "filter(transform(members, (m2, j) -> IF(j > i AND m1.id < m2.id, struct(m1 AS a, m2 AS b), "
        "IF(j > i AND m2.id < m1.id, struct(m2 AS a, m1 AS b), NULL))), p -> p IS NOT NULL)))"
    )
    pairs = buckets.select(F.explode(pair_expr).alias("p")).select(
        F.col("p.a.id").alias("id_a"),
        F.col("p.b.id").alias("id_b"),
        F.col("p.a.sig").alias("asig"),
        F.col("p.b.sig").alias("bsig"),
    ).distinct()
    matches = F.size(F.filter(F.zip_with("asig", "bsig", lambda x, y: x == y), lambda v: v))
    return pairs.select(
        "id_a",
        "id_b",
        (matches.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
    )


def ngram_jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Exact Jaccard computed ONLY for the given (id_a, id_b) pairs —
    the verification stage of the LSH pipeline.

    Shape: shingle explosion is semi-joined down to documents that
    appear in any pair, each involved doc's distinct shingle HASHES are
    collected into one sorted array (a single groupBy reusing the
    shingle exchange's partitioning), and each candidate pair computes
    ``|A ∩ B|`` via ``array_intersect`` after two id-keyed joins. Cost
    scales with the candidate set: the interpreted array intersection
    runs once per PAIR (LSH keeps pairs ≪ corpus), not per shingle —
    measured ~25% faster than the exploded shingle self-join it
    replaces, with identical output. Per-doc state is one long per
    distinct shingle (bounded by document length).

    Equality note: intersecting 60-bit shingle hashes instead of
    shingle strings changes the count only on an intra-pair hash
    collision (~|A|·|B|/2^60 per pair — vanishing), which the oracle's
    string-set replay would surface as a hash mismatch.

    ``carry`` names extra ``pairs`` columns to pass through to the
    output, so a caller that needs (pair → metadata) after the verify
    can read it off the verified rows directly instead of re-joining
    the pair relation (r12: saved dedup_incremental a shuffle-hash
    semi join and one consumer of the candidate checkpoint).
    """
    joined = _pair_doc_sets(df, pairs, id_col, text_col, n, carry=carry)
    inter = F.size(F.array_intersect("__ha", "__hb"))
    jac = inter.cast("double") / (F.size("__ha") + F.size("__hb") - inter).cast("double")
    return joined.select("id_a", "id_b", *carry, jac.alias("jaccard"))


def _pair_doc_sets(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id_a, id_b, __ha, __hb): each candidate pair joined with both
    documents' sorted distinct shingle-HASH arrays — the shared
    scaffolding of every pair-verification formula (exact Jaccard,
    directional containment).

    Shape: shingle explosion is semi-joined down to documents that
    appear in any pair; each involved doc's distinct shingle hashes
    collect into one sorted array (a single groupBy reusing the
    shingle exchange's partitioning); the pair relation then picks
    both arrays up via two id-keyed joins. doc_sets feeds BOTH join
    sides; Spark evaluates unshared subtrees once per consumer, so
    without materialization the whole shingle→hash→collect pipeline
    runs twice (measured 3.0 s → 2.1 s at sf0.1 for the dedup
    pipeline's verify stage). The checkpoint holds one row per
    involved doc — the same bytes the second evaluation would shuffle
    anyway, in MEMORY_AND_DISK storage (spills, never OOMs).
    """
    from spk_sl_validation_spark.ext.hashing import md5_long, shingle_rows

    involved = pairs.select(F.col("id_a").alias(id_col)).unionByName(
        pairs.select(F.col("id_b").alias(id_col))
    ).distinct()
    sh = shingle_rows(df.join(involved, id_col, "left_semi"), id_col, text_col, n)
    doc_sets = (
        sh.select(id_col, md5_long("s").alias("h"))
        .groupBy(id_col)
        .agg(F.array_sort(F.array_distinct(F.collect_list("h"))).alias("hs"))
        # lazy (r12): compute-once persistence without the serialized
        # eager job — materializes inside the consumer's own job.
        .localCheckpoint(eager=False)
    )
    a = doc_sets.select(F.col(id_col).alias("id_a"), F.col("hs").alias("__ha"))
    b = doc_sets.select(F.col(id_col).alias("id_b"), F.col("hs").alias("__hb"))
    return pairs.select("id_a", "id_b", *carry).join(a, "id_a").join(b, "id_b")


def containment_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Directional n-gram containment for the given (id_a, id_b)
    pairs: ``cont_a_in_b = |A ∩ B| / |A|`` and symmetrically
    ``cont_b_in_a`` (A, B = the docs' distinct shingle sets).

    Jaccard under-scores doc-in-doc duplication — a paragraph pasted
    verbatim into a 100× larger page has J ≈ 0.01 but containment
    ≈ 1.0 (Lee et al., "Deduplicating Training Data Makes Language
    Models Better" motivates exactly this case for training corpora).
    Same scaffolding as :func:`ngram_jaccard_for_pairs` (shared
    :func:`_pair_doc_sets`), different final formula.

    Recall caveat (documented contract): candidates normally come from
    MinHash-LSH, whose banding estimates *Jaccard* — a containment
    pair with tiny Jaccard may never become a candidate. At scale the
    remedy is candidate generation biased toward the small side
    (suffix-array / seed-shingle sampling), out of scope here; within
    the candidate set the computed containment is exact.
    """
    joined = _pair_doc_sets(df, pairs, id_col, text_col, n)
    inter = F.size(F.array_intersect("__ha", "__hb")).cast("double")
    return joined.select(
        "id_a",
        "id_b",
        (inter / F.size("__ha").cast("double")).alias("cont_a_in_b"),
        (inter / F.size("__hb").cast("double")).alias("cont_b_in_a"),
    )


def dedup_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    exact_first: bool = False,
) -> DataFrame:
    """The full near-dup dedup pipeline: MinHash-LSH candidates →
    exact n-gram-Jaccard verification → keep/drop decision (a doc is
    dropped iff a verified near-dup with a smaller id exists — the
    standard single-hop representative rule; cluster-transitive dedup
    would iterate this to a fixpoint).

    Returns every document with a ``keep`` flag. This is the
    composition a training-corpus pipeline actually runs at 100 TB:
    Verification deliberately RE-SHINGLES the involved docs instead of
    reusing the signature stage's shingle-hash stream: sharing the
    stream via one checkpoint measured 8% faster at sf0.1 (interleaved
    A/B, identical output) but materializes the ENTIRE corpus's
    shingle hashes (~16 B × total shingles — terabytes at the 100 TB
    design point), while the restricted recompute touches only docs
    that appear in a candidate pair — usually a small fraction. Bench
    locally, but trade for the cluster.

    narrow signature maps, one banded LSH join, exact verification
    only on candidates, one anti-join-shaped decision.

    ``exact_first=True`` collapses exact-duplicate groups (normalized
    fingerprint) to their min-id representative BEFORE LSH: non-reps
    get ``keep = False`` directly and only representatives pay for
    signatures/banding/verification. The keep set is provably
    identical when no capped band bucket overflows: an exact copy has
    the same text as its rep, so every near-dup relation through a
    copy exists through the rep with a smaller-or-equal id. (Under a
    >``max_bucket_size`` bucket, removing copies can only RESTORE
    candidacy the copies' cap slots were wasting — strictly better
    recall.) On a dup-heavy corpus this removes the dominant LSH cost
    — the scale probe (tools/scale_probe.py) measures the difference
    at 1M docs — which is why the production composition is
    exact → near, the same order :func:`dedup_incremental` uses.
    """
    if exact_first:
        fp = df.select(F.col(id_col), md5_fingerprint(text_col).alias("__fp"))
        reps = fp.groupBy("__fp").agg(F.min(id_col).alias("__rep"))
        membership = fp.join(reps, "__fp").select(id_col, "__rep")
        rep_docs = df.join(
            membership.filter(F.col(id_col) == F.col("__rep")).select(id_col),
            id_col,
            "left_semi",
        )
        rep_keep = dedup_corpus(
            rep_docs, id_col, text_col, num_hashes, bands, shingle_n,
            jaccard_threshold, exact_first=False,
        ).withColumnRenamed(id_col, "__rep").withColumnRenamed("keep", "__rep_keep")
        return membership.join(rep_keep, "__rep").select(
            id_col,
            F.when(F.col(id_col) == F.col("__rep"), F.col("__rep_keep"))
            .otherwise(F.lit(False))
            .alias("keep"),
        )
    # The candidate set is consumed three times downstream (involved-docs
    # union ×2, restrict join). ReuseExchange shares only identical
    # exchange subtrees, not the whole LSH pipeline, and .cache() inserts
    # an InMemoryRelation optimization barrier with columnar conversion
    # (measured 5.2s at sf0.1). localCheckpoint of the *projected pair
    # set* — tiny relative to the corpus (near-dup pairs only) — wins:
    # the LSH subtree runs exactly once and every consumer reads a
    # handful of (long, long) rows (3.4s vs 3.8s uncached at sf0.1).
    # At 100 TB the same holds: candidates ≪ corpus, so materializing
    # them is the cheap side of the trade. Lazy (r12): same
    # compute-once persistence, no serialized eager job per run.
    candidates = lsh_candidate_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_n, with_estimate=False
    ).localCheckpoint(eager=False)
    verified = ngram_jaccard_for_pairs(df, candidates, id_col, text_col, shingle_n).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    # The checkpointed candidate lineage erases size stats, so without
    # a hint the planner would pick sort-merge for this left join.
    # drops isn't safely broadcastable at scale (a high-dup corpus
    # drops most ids), so pin shuffle-HASH: the same exchanges as
    # sort-merge minus both sorts, with the hash map built from the
    # per-partition slice of drops (bounded); AQE still upgrades it to
    # broadcast at runtime when drops turns out small.
    drops = verified.select(F.col("id_b").alias(id_col)).distinct()
    return df.select(id_col).join(
        drops.withColumn("__drop", F.lit(True)).hint("shuffle_hash"), id_col, "left"
    ).select(id_col, F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"))


def dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    max_iterations: int | None = None,
    method: str = "propagate",
) -> DataFrame:
    """Transitive near-dup clusters: connected components over the
    verified LSH near-dup graph, labeled by each component's min id.

    ``method="propagate"`` (default, the oracle-checked mode): min-
    label propagation — each round every node takes the min of its own
    label and its neighbors' labels; the loop stops when a round
    changes nothing. Rounds = graph diameter (near-dup chains are
    short, so a handful). Each round is one join + aggregate;
    ``localCheckpoint`` truncates the lineage so the plan doesn't grow
    per iteration — the standard Spark idiom for iterative algorithms
    (Pregel-style, the same scheme GraphX's connectedComponents uses).
    Raises ``ValueError`` if the graph hasn't converged after
    ``max_iterations`` (a silent partial answer would mislabel long
    chains) and points at the stars mode.

    ``method="stars"``: alternating large-star/small-star contraction
    (``ext/graph.py connected_components_stars``) — until-converged in
    O(log² n) rounds regardless of diameter. Identical output on any
    graph where both converge (pinned by test).

    Dispatch, measured (SCALE.md §7, round-6 10M-edge sweep): the
    crossover is in EDGE VOLUME, not diameter. At ≥10⁷ edges stars
    wins at EVERY diameter — 1.3× even at d=2 where propagation is
    theoretically optimal, 8× at d=32, because propagation re-joins
    the full static symmetric edge set every round (shuffle mass
    linear in rounds: 3.6→32 GB across the sweep) while stars
    contracts the relation (rounds ≈ 2·log d, mass bounded). Below
    ~10⁶ edges the two are seconds apart and propagation's
    recursive-CTE oracle replay makes it the verifiable choice. Use
    propagate for oracle-checked paths; stars for production volume.

    ``max_iterations`` bounds work in BOTH modes and either mode
    fails loudly past it. Defaults are per-mode: 20 propagation
    rounds (rounds = diameter, so 20 already means a pathological
    chain) but 60 star rounds (rounds ≈ 2·log2(d), so 60 covers
    diameters ≈ 2^29 — star rounds are cheap and the mode exists
    precisely for graphs whose diameter nobody predicted).
    """
    if method not in ("propagate", "stars"):
        raise ValueError(f"unknown method {method!r}: use 'propagate' or 'stars'")
    # Candidates checkpointed for the same reason as dedup_corpus;
    # symmetric edges come from ONE explode over verified rather than a
    # self-union, so the verify subtree appears once in the plan.
    candidates = lsh_candidate_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_n, with_estimate=False
    ).localCheckpoint(eager=True)
    verified = ngram_jaccard_for_pairs(df, candidates, id_col, text_col, shingle_n).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    edges = (
        verified.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )

    if method == "stars":
        from spk_sl_validation_spark.ext.graph import connected_components_stars

        star_labels, _ = connected_components_stars(
            edges, max_rounds=60 if max_iterations is None else max_iterations
        )
        return (
            df.select(F.col(id_col))
            .join(
                star_labels.withColumnRenamed("node", id_col).hint("shuffle_hash"),
                id_col,
                "left",
            )
            .select(id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"))
        )

    # Propagation shares ONE implementation with the scale probe
    # (ext/graph.py min_label_propagation — edge-node-subset labels,
    # static relation per round, hard failure past the cap; the
    # subset restriction's equivalence argument and the 200k-doc A/B
    # live in that docstring). Singletons fold back below.
    from spk_sl_validation_spark.ext.graph import min_label_propagation

    prop_rounds = 20 if max_iterations is None else max_iterations
    try:
        labels, _ = min_label_propagation(edges, prop_rounds, id_col=id_col)
    except ValueError as exc:
        raise ValueError(
            f"dedup_clusters(method='propagate') did not converge in "
            f"{prop_rounds} rounds — the dup graph has a component with "
            f"diameter > {prop_rounds} (e.g. a long near-dup chain); "
            "use method='stars', which converges in O(log² n) rounds"
        ) from exc
    return (
        df.select(F.col(id_col))
        .join(labels.hint("shuffle_hash"), id_col, "left")
        .select(id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"))
    )


def duplicate_soft_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Duplicate-aware soft weighting: instead of DROPPING near-dups
    (dedup_corpus), every document keeps a training weight
    ``1 / cluster_size`` from its transitive near-dup cluster — the
    "soft dedup" used when duplicates should contribute once in
    expectation rather than be discarded (the sampling-weight analogue
    of SemDeDup; cluster mass is conserved). Returns
    ``(id, cluster_id, cluster_size, weight, n_tokens, eff_tokens)``
    where ``eff_tokens`` is the document's token count scaled by its
    weight — summed per source this is the effective (dedup-adjusted)
    token budget a mixture planner should use.

    Scale shape: rides :func:`dedup_clusters` (capped-LSH candidates,
    min-label propagation); on top of it one hash aggregate on
    cluster_id (≤ one row per document, uniform key) joined back, plus
    a narrow token-count map on the corpus. Both derived columns are a
    single double division — no ordering-sensitive float sums — so the
    oracle lands on identical bits.

    Pass ``clusters`` (a ``(id, cluster_id)`` relation, e.g. a
    PERSISTED run of :func:`dedup_clusters`) to skip the LSH+verify
    chain entirely — the cluster-once-derive-many production shape:
    soft weights, the leakage-safe split, and the survivorship
    crosstab all consume the same stored cluster table instead of each
    re-running the most expensive subtree in the corpus. Result is
    identical by construction (pinned by test).
    """
    if clusters is None:
        clusters = dedup_clusters(
            df, id_col, text_col, num_hashes, bands, shingle_n, jaccard_threshold
        )
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    toks = df.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"),
    )
    # clusters is checkpoint-blinded (stats-free), so both joins would
    # default to sort-merge; shuffle-hash is the deliberate pin — sizes
    # and toks are per-cluster / per-doc relations, corpus-scale at
    # 100 TB, so broadcast is not an option.
    return (
        clusters.join(sizes.hint("shuffle_hash"), "cluster_id")
        .join(toks.hint("shuffle_hash"), id_col)
        .select(
            id_col,
            "cluster_id",
            "cluster_size",
            (F.lit(1.0) / F.col("cluster_size")).alias("weight"),
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("cluster_size")).alias("eff_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 32
) -> DataFrame:
    """(id, simhash): ``bits``-wide SimHash of the token stream.

    Frequency-weighted: bit p is set iff a strict majority of tokens
    (with multiplicity) have bit p set in their 60-bit hash.

    Shape: explode tokens → one md5 per token → groupBy(id) with
    ``bits`` conditional-sum aggregates (codegen'd, map-side partial),
    then assemble the fingerprint from the bit counts. Same rationale
    as minhash_signatures: interpreted array HOFs re-inline the hash
    per bit (~bits× the work); the explode+aggregate plan hashes once
    and shuffles one short row per document.
    """
    hashed = df.select(F.col(id_col), F.explode(ws_tokens(text_col)).alias("t")).select(
        id_col, md5_long("t").alias("h")
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.shiftright(F.col("h"), p).bitwiseAND(F.lit(1))).alias(f"ones{p}")
        for p in range(bits)
    ]
    counted = hashed.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for p in range(bits):
        fp = fp + F.when(
            F.col(f"ones{p}") * 2 > F.col("n"), F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return counted.select(id_col, fp.alias("simhash"))


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    bits: int = 32,
    out: str = "simhash",
    id_col: str = "doc_id",
) -> DataFrame:
    """Append ``out`` to ``df`` (join-back over :func:`simhash_fingerprints`)."""
    sig = simhash_fingerprints(df, id_col, text_col, bits).withColumnRenamed("simhash", out)
    return df.join(sig, id_col)


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 32, max_hamming: int = 2
) -> DataFrame:
    """Exact Hamming-≤k pairs on SimHash fingerprints — the text
    front-end over :func:`hamming_near_dup_pairs`."""
    fp_df = simhash_fingerprints(df, id_col, text_col, bits)
    return hamming_near_dup_pairs(fp_df, id_col, "simhash", bits, max_hamming)


def _hamming_fp_pairs(
    reps: DataFrame, bits: int, max_hamming: int
) -> DataFrame:
    """DISTINCT-fingerprint pairs within Hamming ≤ k via banding.

    ``reps`` is one row per distinct fingerprint (column ``fp``).
    The fingerprint is split into ``max_hamming + 1`` bit-bands; by
    pigeonhole any pair within Hamming distance k agrees exactly on
    ≥1 band, so per-band bucketing + an exact popcount filter is
    *lossless*. Band values for the top band of a 64-bit fingerprint
    include arithmetic-shift sign fill — still a pure function of the
    fingerprint bits, so band equality is preserved.

    Returns (fp_a, fp_b, hamming) with fp_a < fp_b (fingerprints in
    a bucket are distinct by construction, so the order is total).
    """
    n_bands = max_hamming + 1
    width = (bits + n_bands - 1) // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("fp"), b * width).bitwiseAND(F.lit((1 << width) - 1)).alias("bh"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = reps.select("fp", F.explode(bands).alias("bk")).select(
        "fp", "bk.band", "bk.bh"
    )
    buckets = (
        exploded.groupBy("band", "bh")
        .agg(F.collect_list("fp").alias("members"))
        .filter(F.size("members") > 1)
    )
    pair_expr = F.expr(
        "flatten(transform(members, (m1, i) -> "
        "filter(transform(members, (m2, j) -> IF(j > i AND m1 < m2, struct(m1 AS a, m2 AS b), "
        "IF(j > i AND m2 < m1, struct(m2 AS a, m1 AS b), NULL))), p -> p IS NOT NULL)))"
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.a").alias("fp_a"), F.col("p.b").alias("fp_b"))
        .distinct()
        .select("fp_a", "fp_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def hamming_near_dup_pairs(
    fp_df: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    bits: int = 32,
    max_hamming: int = 2,
) -> DataFrame:
    """Exact Hamming-≤k pairs on ANY int64 fingerprint relation
    (SimHash, image dHash, audio fingerprints …) via banding, with an
    exact-duplicate PRE-COLLAPSE so a dominant identical fingerprint
    (the blank/logo-image flood of a real crawl) can never build an
    uncapped single-row band bucket.

    Shape: collapse identical fingerprints first (groupBy(fp) — one
    row per DISTINCT fingerprint), band only the distinct
    fingerprints (:func:`_hamming_fp_pairs`), then re-expand to id
    pairs with JOINS: cross-group pairs via two member joins on the
    fingerprint-pair relation, within-group (Hamming-0) pairs via a
    member self-join restricted to fingerprints with >1 member. Joins
    are AQE-skew-splittable, unlike a ``collect_list`` bucket row —
    an m-copy flood costs one groupBy row plus a splittable join, not
    an O(m²) in-bucket HOF expansion inside one task. Output is
    IDENTICAL to the quadratic oracle scan (lossless).
    """
    # members feeds three consumers (the fp collapse + both expansion
    # join sides); Spark shares no non-cached subtree, so materialize
    # once — the fingerprint subtree (e.g. the image-decode dHash map)
    # must not re-run per consumer. Same pattern as ngram_jaccard_pairs.
    members = fp_df.select(
        F.col(id_col).alias("id"), F.col(fp_col).alias("fp")
    ).localCheckpoint(eager=True)
    groups = members.groupBy("fp").agg(F.count(F.lit(1)).alias("m"))

    fp_pairs = _hamming_fp_pairs(groups.select("fp"), bits, max_hamming)

    # Within-group (identical-fingerprint) pairs ride the SAME
    # expansion joins as cross-group pairs: a multi-member fingerprint
    # contributes an (fp, fp) row, whose m×m self-combination is cut
    # to m(m−1)/2 by the ida < idb filter below.
    fp_pairs_all = fp_pairs.select("fp_a", "fp_b").unionByName(
        groups.filter(F.col("m") > 1).select(
            F.col("fp").alias("fp_a"), F.col("fp").alias("fp_b")
        )
    )

    # Expansion: every member of fp_a pairs with every member of fp_b.
    # fp_pairs_all is the (small) near-dup fingerprint relation;
    # members is corpus-sized — shuffle_hash by repo convention, AQE
    # upgrades tiny cases to broadcast and splits skewed keys.
    ma = members.select(F.col("fp").alias("fp_a"), F.col("id").alias("ida"))
    mb = members.select(F.col("fp").alias("fp_b"), F.col("id").alias("idb"))
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        fp_pairs_all.join(ma.hint("shuffle_hash"), "fp_a")
        .join(mb.hint("shuffle_hash"), "fp_b")
        .filter((F.col("fp_a") != F.col("fp_b")) | (F.col("ida") < F.col("idb")))
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            hamming.alias("hamming"),
        )
    )


def hamming_near_dup_edges(
    fp_df: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    bits: int = 32,
    max_hamming: int = 2,
) -> DataFrame:
    """CONNECTIVITY-PRESERVING edge set for Hamming-≤k components —
    the bounded input for connected-components consumers.

    Instead of the full (quadratic-in-group-size) pair relation,
    emits: (a) one STAR edge per non-representative member of each
    identical-fingerprint group (member → min-id representative,
    Hamming 0, m−1 edges for an m-copy group), and (b) the
    representative-level near-dup pairs between DISTINCT fingerprints
    within Hamming ≤ k. The transitive closure over these edges is
    identical to the closure over :func:`hamming_near_dup_pairs`
    (members of one group are connected via the representative; two
    near-dup groups are connected via their representatives), so
    connected-components labels are unchanged — but an m-copy
    exact-duplicate flood contributes m−1 edges instead of m(m−1)/2
    pairs. Returns (src, dst, hamming).
    """
    # Same shared-subtree materialization rationale as
    # hamming_near_dup_pairs: members feeds the star join and the fp
    # collapse; groups feeds three consumers.
    members = fp_df.select(
        F.col(id_col).alias("id"), F.col(fp_col).alias("fp")
    ).localCheckpoint(eager=True)
    groups = members.groupBy("fp").agg(
        F.min("id").alias("rep"), F.count(F.lit(1)).alias("m")
    ).localCheckpoint(eager=True)

    stars = (
        members.join(groups.hint("shuffle_hash"), "fp")
        .filter(F.col("id") != F.col("rep"))
        .select(
            F.col("rep").alias("src"),
            F.col("id").alias("dst"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )

    fp_pairs = _hamming_fp_pairs(groups.select("fp"), bits, max_hamming)
    ra = groups.select(F.col("fp").alias("fp_a"), F.col("rep").alias("rep_a"))
    rb = groups.select(F.col("fp").alias("fp_b"), F.col("rep").alias("rep_b"))
    rep_edges = (
        fp_pairs.join(ra.hint("shuffle_hash"), "fp_a")
        .join(rb.hint("shuffle_hash"), "fp_b")
        .select(
            F.least("rep_a", "rep_b").alias("src"),
            F.greatest("rep_a", "rep_b").alias("dst"),
            "hamming",
        )
    )
    # Materialize the union: the checkpointed `groups` relation
    # appears in BOTH branches (4 instances total), and optimizing a
    # COLUMN-PRUNED view of that union (the exact thing a CC consumer
    # builds: select(src, dst) → distinct → localCheckpoint) hits a
    # Spark constraint-rewrite NoSuchElementException on non-nullable
    # inputs. A single LogicalRDD output is immune, and the edge
    # relation is CC-round-sized (the per-round checkpoints inside
    # connected_components_stars are the same magnitude).
    return stars.unionByName(rep_edges).localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard similarity on distinct word n-gram sets.

    Explode distinct shingles → self-join on shingle → group by pair.
    O(sum of pairs sharing a shingle) — at 100 TB this runs only on
    LSH candidates (compose with ``lsh_candidate_pairs``); standalone
    it is the exact baseline and the oracle path.
    """
    from spk_sl_validation_spark.ext.hashing import shingle_rows

    # sh feeds three consumers (both self-join sides + sizes); Spark
    # shares no non-cached subtree, so materialize the distinct
    # shingle rows once instead of exploding/deduping the corpus 3×.
    sh = shingle_rows(df, id_col, text_col, n).distinct().localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
    # sizes is one row per input doc — corpus-cardinality standalone,
    # so never force a broadcast; shuffle_hash by repo convention and
    # let AQE upgrade genuinely small cases to broadcast at runtime.
    return (
        inter.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_incremental(
    df: DataFrame,
    is_new: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> DataFrame:
    """Incremental dedup: flag each NEW document against the existing
    index — the shape a production corpus pipeline actually runs when
    a fresh crawl shard arrives (dedup the delta against the corpus,
    not the corpus against itself).

    A new document (rows where ``is_new``) is dropped iff
    - its normalized-text fingerprint matches any INDEX document
      (``reason = 'exact_dup'``), else
    - it shares a capped LSH band bucket with an index document and
      the exact n-gram Jaccard of that pair is >= ``jaccard_threshold``
      (``reason = 'near_dup'``); otherwise it is kept
      (``reason = 'unique'``). Duplicates *within* the new batch are
      deliberately out of scope — run :func:`dedup_corpus` on the
      batch for that; composing both gives full-corpus semantics.

    Scale shape: this is the asymmetric version of
    :func:`lsh_candidate_pairs` — band rows for batch and index join
    directly on the bucket key (new side vs index side), so candidate
    generation never expands index-index pairs. At 100 TB the index
    band table is a precomputed artifact (bucketed by band key) and
    only the delta's signatures are computed fresh; per-bucket
    expansion stays bounded by the shared hot-bucket cap
    (:func:`capped_band_rows`, cap applied over batch+index together —
    the same deterministic rule the oracle replays). Verification
    touches only cross pairs.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    tagged = df.withColumn("__new", is_new)

    # -- exact stage: one fingerprint groupBy-free semi join ----------
    fp = tagged.select(id_col, "__new", md5_fingerprint(text_col).alias("fp"))
    idx_fp = fp.filter(~F.col("__new")).select("fp").distinct()
    exact_hits = (
        fp.filter(F.col("__new")).join(idx_fp, "fp", "left_semi").select(id_col)
    )

    # -- near stage: asymmetric capped-bucket join --------------------
    sig_df = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    new_flags = tagged.select(id_col, "__new")
    # capped feeds BOTH sides of the asymmetric band join below; Spark
    # shares no non-cached subtree across join sides, so without
    # materialization the whole signature pipeline (the dominant cost)
    # evaluates twice. One row per (doc, band): skinny relation,
    # measured 44% off the full operator at sf0.1. r12: LAZY
    # localCheckpoint — same compute-once persistence (MEMORY_AND_DISK)
    # and lineage truncation, but materialized inside the main job
    # instead of as its own serialized eager job per run (guide §5:
    # each eager checkpoint paid a full job's AQE stage-latency chain
    # before the query proper could start).
    capped = (
        capped_band_rows(sig_df, id_col, rows_per_band, bands, max_bucket_size)
        .join(new_flags, id_col)
        .localCheckpoint(eager=False)
    )
    hcols = [f"h{r}" for r in range(rows_per_band)]
    lhs = capped.filter(F.col("__new")).select(F.col(id_col).alias("__nid"), "band", *hcols)
    rhs = capped.filter(~F.col("__new")).select(F.col(id_col).alias("__iid"), "band", *hcols)
    # cand feeds the verify stage's three pair consumers; without
    # materialization the banding subtree runs three times (same trade
    # as dedup_corpus — candidates ≪ corpus, three longs per row).
    cand = (
        lhs.join(rhs, ["band", *hcols])
        .select(
            F.least("__nid", "__iid").alias("id_a"),
            F.greatest("__nid", "__iid").alias("id_b"),
            F.col("__nid").alias("new_id"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # r12: new_id rides THROUGH the verify (carry) — near hits read off
    # the verified rows directly, where the old shape re-joined cand
    # against verified with a shuffle-hash semi join (2 exchanges + one
    # more consumer of the checkpoint). A candidate pair determines its
    # new_id uniquely (lhs is new-only, rhs index-only), so the row set
    # is identical.
    verified = ngram_jaccard_for_pairs(
        df, cand, id_col, text_col, shingle_n, carry=("new_id",)
    ).filter(F.col("jaccard") >= jaccard_threshold)
    near_hits = verified.select(F.col("new_id").alias(id_col)).distinct()

    new_docs = tagged.filter(F.col("__new")).select(id_col)
    out = (
        new_docs.join(exact_hits.withColumn("__e", F.lit(True)), id_col, "left")
        .join(near_hits.withColumn("__n", F.lit(True)).hint("shuffle_hash"), id_col, "left")
    )
    reason = (
        F.when(F.col("__e"), F.lit("exact_dup"))
        .when(F.col("__n"), F.lit("near_dup"))
        .otherwise(F.lit("unique"))
    )
    return out.select(
        id_col,
        (F.col("__e").isNull() & F.col("__n").isNull()).alias("keep"),
        reason.alias("reason"),
    )


# ---------------------------------------------------------------------------
# Precomputed dedup index (the 100 TB incremental path made literal)
# ---------------------------------------------------------------------------

def shingle_hash_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, hs): each document's sorted distinct shingle-hash array —
    the verification-stage representation (see
    :func:`ngram_jaccard_for_pairs`), exposed as a persistable
    artifact so an index can verify candidates without re-reading
    corpus text."""
    from spk_sl_validation_spark.ext.hashing import md5_long, shingle_rows

    sh = shingle_rows(df, id_col, text_col, n)
    return (
        sh.select(id_col, md5_long("s").alias("h"))
        .groupBy(id_col)
        .agg(F.array_sort(F.array_distinct(F.collect_list("h"))).alias("hs"))
    )


def dedup_index_tables(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three persistable artifacts of a corpus dedup index:

    - ``fp``        (id, fp): exact-dup fingerprints;
    - ``band_rows`` (id, band, h0..h{r-1}): capped LSH band rows —
      write this one bucketed (and sorted) on ``(band, h0..h{r-1})``
      so every future delta joins against it with ZERO exchange on
      the index side (tests/test_dedup_index.py pins the plan);
    - ``hs``        (id, hs): shingle-hash sets for Jaccard verify
      without corpus-text access.

    At 100 TB the index is built once per corpus version and each
    arriving shard runs :func:`dedup_incremental_indexed` against it —
    index-side work is a bucketed scan, never a recompute."""
    assert num_hashes % bands == 0
    fp = df.select(id_col, md5_fingerprint(text_col).alias("fp"))
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    band_rows = capped_band_rows(sig, id_col, num_hashes // bands, bands, max_bucket_size)
    hs = shingle_hash_sets(df, id_col, text_col, shingle_n)
    return fp, band_rows, hs


def dedup_incremental_indexed(
    batch_df: DataFrame,
    index_fp: DataFrame,
    index_bands: DataFrame,
    index_hs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    batch_tables: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """:func:`dedup_incremental` against a PRECOMPUTED index — the
    production shape where the corpus artifacts (from
    :func:`dedup_index_tables`) are read from storage and only the
    arriving batch pays signature/shingle computation.

    Same output contract: (id, keep, reason∈{exact_dup, near_dup,
    unique}) for every batch document. One deliberate semantic
    difference: the hot-bucket cap applies per side (index capped at
    build time, batch capped here) rather than over batch+index
    jointly, so a bucket may admit up to 2×cap members across the two
    sides; whenever no bucket is cap-bound the keep/drop set is
    IDENTICAL to :func:`dedup_incremental` (pinned by test).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    hcols = [f"h{r}" for r in range(rows_per_band)]

    # Exact stage: the index is PROBED with a broadcast of the batch's
    # fingerprints (shard-bounded), then the handful of hit
    # fingerprints broadcasts back — the index fp table is scanned,
    # never shuffled, so this stage's data movement is ∝ shard even
    # against a corpus-scale index.
    if batch_tables is not None:
        # Caller already built the batch's artifacts (e.g. the
        # streaming ingest loop, which also merges them into the
        # index) — reuse instead of recomputing the tokenize→hash→
        # aggregate pipeline. Must come from dedup_index_tables with
        # the same num_hashes/bands/shingle_n/cap parameters.
        fp, batch_bands, batch_hs = batch_tables
    else:
        sig = minhash_signatures(batch_df, id_col, text_col, num_hashes, shingle_n)
        fp = batch_df.select(id_col, md5_fingerprint(text_col).alias("fp"))
        batch_bands = capped_band_rows(sig, id_col, rows_per_band, bands, max_bucket_size)
        batch_hs = shingle_hash_sets(batch_df, id_col, text_col, shingle_n)
    batch_fps = fp.select("fp").distinct()
    hit_fps = (
        index_fp.join(F.broadcast(batch_fps), "fp", "left_semi").select("fp").distinct()
    )
    exact_hits = fp.join(F.broadcast(hit_fps), "fp", "left_semi").select(id_col)

    cand = (
        batch_bands.select(F.col(id_col).alias("__nid"), "band", *hcols)
        .join(index_bands.select(F.col(id_col).alias("__iid"), "band", *hcols), ["band", *hcols])
        .select("__nid", "__iid")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Verify stage: restrict the index's shingle-hash sets to the
    # docs that appear in a candidate pair via a BROADCAST semi join
    # (candidate ids are shard-bounded) BEFORE any shuffle — without
    # this, joining candidates to the full hs table moves the entire
    # index's shingle arrays (measured: a 50k-doc shard against a
    # 950k-doc index spent its whole 58 s budget there).
    involved = cand.select(F.col("__iid").alias(id_col)).distinct()
    idx_hs = index_hs.join(F.broadcast(involved), id_col, "left_semi")
    pairs = (
        cand.join(batch_hs.select(F.col(id_col).alias("__nid"), F.col("hs").alias("__ha")), "__nid")
        .join(
            idx_hs.select(F.col(id_col).alias("__iid"), F.col("hs").alias("__hb")).hint(
                "shuffle_hash"
            ),
            "__iid",
        )
    )
    inter = F.size(F.array_intersect("__ha", "__hb"))
    jac = inter.cast("double") / (F.size("__ha") + F.size("__hb") - inter).cast("double")
    near_hits = (
        pairs.filter(jac >= jaccard_threshold)
        .select(F.col("__nid").alias(id_col))
        .distinct()
    )

    out = (
        batch_df.select(id_col)
        .join(exact_hits.withColumn("__e", F.lit(True)), id_col, "left")
        .join(near_hits.withColumn("__n", F.lit(True)).hint("shuffle_hash"), id_col, "left")
    )
    reason = (
        F.when(F.col("__e"), F.lit("exact_dup"))
        .when(F.col("__n"), F.lit("near_dup"))
        .otherwise(F.lit("unique"))
    )
    return out.select(
        id_col,
        (F.col("__e").isNull() & F.col("__n").isNull()).alias("keep"),
        reason.alias("reason"),
    )


def merge_into_dedup_index(
    index: tuple[DataFrame, DataFrame, DataFrame],
    batch: tuple[DataFrame, DataFrame, DataFrame],
    kept_ids: DataFrame,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fold a deduped batch into the index: append the batch's
    artifact rows for KEPT documents only (semi join on ``kept_ids``)
    to each of the three index tables — the index-maintenance step
    after every :func:`dedup_incremental_indexed` run, closing the
    build → dedup → merge lifecycle.

    Appends are union-alls (write: append to the bucketed tables —
    bucket membership is a row property, so appended files land in
    the right buckets). Hot-bucket caps were applied per batch, so a
    bucket can exceed ``max_bucket_size`` after many merges; the
    production cadence is periodic index REBUILD (compaction) via
    :func:`dedup_index_tables` over the merged corpus, which re-caps
    every bucket deterministically.
    """
    keep = kept_ids.select(id_col)
    return tuple(
        i_df.unionByName(b_df.join(keep, id_col, "left_semi"))
        for i_df, b_df in zip(index, batch)
    )


def jaccard_join_prefix(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard self-join via prefix filtering (AllPairs, Bayardo
    et al. WWW'07) — same output as :func:`ngram_jaccard_pairs`, with
    candidate generation restricted to pairs sharing a token in their
    rarest-first prefixes.

    Each document's distinct shingle set is ordered rarest-first by the
    (global frequency, shingle) tuple; a pair with Jaccard >= t must
    share at least one token inside both prefixes of length
    ``|x| - ceil(t*|x|) + 1``, so only prefix tokens enter the
    candidate self-join. The prefix holds the RAREST tokens, which is
    exactly where join buckets are smallest — the frequent-token
    buckets that make the naive shingle self-join quadratic never
    produce candidates. Lossless (recall 1.0), unlike MinHash-LSH.

    Scale shape — everything is keyed on uniform corpus-scale keys, no
    global ordering artifact and no corpus-sized broadcast:

    - the frequency table joins back to the shingle rows on the
      shingle itself (shuffle-hash; the order is the (cnt, s) tuple,
      so no materialized global rank and no single-partition window);
    - per-doc prefix positions AND set sizes come from one window
      partitioned by doc id (two frames, one exchange);
    - verification joins candidates back to the two documents' shingle
      rows with shuffle-hash joins keyed on id / (id, shingle).

    At 100 TB the candidate count is the sum over prefix tokens of
    C(bucket, 2) on the rarest buckets — the measured dial is the same
    block-size distribution probe as fuzzy matching (SCALE.md).
    """
    from pyspark.sql import Window

    from spk_sl_validation_spark.ext.hashing import shingle_rows

    sh = shingle_rows(df, id_col, text_col, n).distinct().localCheckpoint(eager=True)

    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"))
    w_doc = Window.partitionBy(id_col)
    ranked = (
        sh.join(freq.hint("shuffle_hash"), "s")
        .withColumn(
            "pos",
            F.row_number().over(w_doc.orderBy(F.col("cnt").asc(), F.col("s").asc())),
        )
        .withColumn("n_sh", F.count(F.lit(1)).over(w_doc))
    )
    prefix_len = F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(threshold)) + 1
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(id_col, "s")

    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )

    sh_a = sh.select(F.col(id_col).alias("id_a"), "s")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "s")
    inter = (
        cand.join(sh_a.hint("shuffle_hash"), "id_a")
        .join(sh_b.hint("shuffle_hash"), ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def prefix_index_tables(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Persistable artifacts of the EXACT incremental-dedup index:

    - ``sh``   (id, s): the corpus's distinct shingle rows — write it
      bucketed (and sorted) on ``s`` so batch probes join against it
      with zero exchange on the index side (same at-rest layout rule
      as the LSH band table, :func:`dedup_index_tables`);
    - ``freq`` (s, cnt): global shingle frequencies — the rarity order
      batch prefixes are built from; derivable from ``sh`` but kept so
      query time skips the full-index aggregation.

    Built once per corpus version; every arriving shard runs
    :func:`jaccard_incremental_prefix_indexed` against them."""
    from spk_sl_validation_spark.ext.hashing import shingle_rows

    sh = shingle_rows(corpus, id_col, text_col, n).distinct()
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"))
    return sh, freq


def _prefix_probe_tail(
    sh_b: DataFrame, sh_c: DataFrame, freq: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Shared probe tail of the exact incremental paths: batch prefixes
    (rarest-first by corpus frequency) -> corpus candidate probe ->
    exact verify. ``sh_b`` must be materialized (it feeds four
    consumers)."""
    from pyspark.sql import Window

    w_doc = Window.partitionBy(id_col)
    ranked = (
        sh_b.join(freq.hint("shuffle_hash"), "s", "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .withColumn(
            "pos",
            F.row_number().over(w_doc.orderBy(F.col("cnt").asc(), F.col("s").asc())),
        )
        .withColumn("n_sh", F.count(F.lit(1)).over(w_doc))
    )
    prefix_len = F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(threshold)) + 1
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        F.col(id_col).alias("id_batch"), "s"
    )

    cand = (
        prefix.join(
            sh_c.select(F.col(id_col).alias("id_corpus"), "s").hint("shuffle_hash"), "s"
        )
        .select("id_batch", "id_corpus")
        .distinct()
    )

    b_tok = sh_b.select(F.col(id_col).alias("id_batch"), "s")
    c_tok = sh_c.select(F.col(id_col).alias("id_corpus"), "s")
    inter = (
        cand.join(b_tok.hint("shuffle_hash"), "id_batch")
        .join(c_tok.hint("shuffle_hash"), ["id_corpus", "s"])
        .groupBy("id_batch", "id_corpus")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sb = sh_b.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_b")).withColumnRenamed(
        id_col, "id_batch"
    )
    sc = sh_c.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_c")).withColumnRenamed(
        id_col, "id_corpus"
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_b") + F.col("n_c") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sb.hint("shuffle_hash"), "id_batch")
        .join(sc.hint("shuffle_hash"), "id_corpus")
        .select("id_batch", "id_corpus", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_incremental_prefix_indexed(
    batch: DataFrame,
    index_sh: DataFrame,
    index_freq: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact batch-vs-corpus Jaccard against a PREBUILT index
    (:func:`prefix_index_tables`) — identical output to
    :func:`jaccard_incremental_prefix`; the index tables are scanned,
    never recomputed, so the batch pays everything."""
    from spk_sl_validation_spark.ext.hashing import shingle_rows

    sh_b = shingle_rows(batch, id_col, text_col, n).distinct().localCheckpoint(eager=True)
    return _prefix_probe_tail(sh_b, index_sh, index_freq, id_col, threshold)


def jaccard_incremental_prefix(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact batch-vs-corpus Jaccard pairs via ONE-SIDED prefix
    filtering — the lossless twin of :func:`dedup_incremental`'s LSH
    candidate path.

    Only the batch builds prefixes (rarest-first by corpus frequency;
    tokens unseen in the corpus sort first and hit empty buckets —
    harmless and still lossless): a pair with J >= t shares at least
    ``ceil(t*|B|)`` tokens, which cannot all hide in B's suffix of
    length ``ceil(t*|B|) - 1``, so some shared token is in B's prefix
    of length ``|B| - ceil(t*|B|) + 1``. The corpus side is probed
    as-is — at 100 TB it is the persisted shingle table of the exact
    dedup index (:func:`prefix_index_tables`), scanned once and joined
    on the shingle; the batch pays everything else, so probe cost is
    proportional to batch size.

    Returns (id_batch, id_corpus, jaccard) with jaccard >= threshold.
    """
    from spk_sl_validation_spark.ext.hashing import shingle_rows

    sh_b = shingle_rows(batch, id_col, text_col, n).distinct().localCheckpoint(eager=True)
    sh_c = shingle_rows(corpus, id_col, text_col, n).distinct().localCheckpoint(eager=True)
    freq = sh_c.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"))
    return _prefix_probe_tail(sh_b, sh_c, freq, id_col, threshold)
