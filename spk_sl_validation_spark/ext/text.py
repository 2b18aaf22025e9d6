"""Text-analysis operators for training-data pipelines.

Beyond the reference's scope (its string surface is concat/substring/
startswith — SURVEY.md §2.9); these are the document-level operators a
100 TB corpus pipeline needs: token counting, quality scoring,
language ID, fingerprinting. Every function here is a built-in-column
expression (JVM-side, codegen'd) — a narrow map over the documents
table with no shuffle and no Python in the hot path. Each has an
exact DuckDB SQL twin so the oracle harness can verify values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.hashing import md5_long, ws_tokens

# A compact English-ish stopword list; the quality/language heuristics
# only need a deterministic, documented vocabulary, not linguistic
# completeness.
STOPWORDS: tuple[str, ...] = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

# Marker-word profiles for the n-gram/stopword language-ID heuristic.
# Deterministic scoring: hits per profile, argmax with fixed tie order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "le", "shi", "bu", "zai"),
}

# BPE-ish segmentation: runs of letters, runs of digits, or a single
# non-space symbol — approximates how byte-pair tokenizers split text.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_count(col: str | Column) -> Column:
    """Whitespace token count. SQL twin: ``len(string_split_regex(trim(x),'\\s+'))``."""
    return F.size(ws_tokens(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """Regex-segmented token count (BPE approximation).

    SQL twin: ``len(regexp_extract_all(lower(x), pattern))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(BPE_ISH_PATTERN))


def punct_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(r"[^a-z0-9\s]"))


def stopword_count(col: str | Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Count of tokens in the stopword vocabulary (array filter, no explode)."""
    return F.size(F.filter(ws_tokens(col), lambda t: t.isin(*stopwords)))


def quality_components(col: str | Column) -> dict[str, Column]:
    """The raw ratios a quality classifier would threshold on.

    All divisions are single double-precision ops on integer inputs —
    bit-identical across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_tokens = token_count(c).cast("double")
    toks = ws_tokens(c)
    inlist = list(STOPWORDS)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*inlist))).cast("double")
    return {
        "n_chars": F.length(c),
        "n_tokens": token_count(c),
        "avg_token_len": (n_chars - (n_tokens - F.lit(1.0))) / n_tokens,
        "punct_ratio": punct_count(c).cast("double") / n_chars,
        "stopword_ratio": n_stop / n_tokens,
    }


def quality_score(col: str | Column) -> Column:
    """Composite [0,1]-ish quality score: rewards mid-length docs with
    a healthy stopword ratio, penalizes punctuation soup. Weighted sum
    of deterministic doubles, evaluated in a fixed order.
    """
    q = quality_components(col)
    length_term = F.least(q["n_chars"].cast("double") / F.lit(500.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_term
        + F.lit(0.4) * F.least(q["stopword_ratio"] * F.lit(5.0), F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(q["punct_ratio"] * F.lit(10.0), F.lit(1.0)))
    )


#: Fixed logistic-model weights for :func:`quality_model_prob` —
#: (bias, length, stopword-ratio, punct-ratio, distinct-token-ratio).
#: Hand-set in the spirit of the fasttext-style quality classifiers
#: production corpus pipelines run (CCNet, Llama/GPT-3 data work):
#: rewards length and function-word density, punishes symbol soup and
#: token repetition. The weights are part of the operator's contract
#: (the oracle replays them verbatim), standing in for a trained
#: coefficient vector shipped as a config artifact.
QUALITY_MODEL_WEIGHTS = {
    "bias": -1.2,
    "length": 2.0,
    "stopword": 3.0,
    "punct": -4.0,
    "distinct": 1.5,
}


#: Feature order of the logistic quality model: the bias plus four
#: engineered ratios. Training and inference share this tuple so a
#: learned weight vector drops into :func:`quality_model_prob` directly.
QUALITY_FEATURES: tuple[str, ...] = ("bias", "length", "stopword", "punct", "distinct")


def quality_feature_cols(col: str | Column) -> dict[str, Column]:
    """The logistic model's feature columns (excluding the implicit
    bias 1): ``least(n_chars/500, 1)``, stopword ratio, punctuation
    ratio, distinct-token ratio — all deterministic double ratios with
    bit-identical SQL twins (the ``_Z`` expression in
    plans/text_queries.py). Shared by inference and training so the
    two can never drift."""
    c = F.col(col) if isinstance(col, str) else col
    q = quality_components(c)
    toks = ws_tokens(c)
    n_tokens = F.size(toks).cast("double")
    return {
        "length": F.least(q["n_chars"].cast("double") / F.lit(500.0), F.lit(1.0)),
        "stopword": q["stopword_ratio"],
        "punct": q["punct_ratio"],
        "distinct": F.size(F.array_distinct(toks)).cast("double") / n_tokens,
    }


def _logit_z(x: dict[str, Column], weights: dict[str, float | Column]) -> Column:
    """Strictly left-associative linear term — the SQL oracle's
    identical expression tree lands on the same double before the
    (≤1 ulp engine-dependent) ``exp``."""

    def w(name: str) -> Column:
        v = weights[name]
        return F.lit(v) if isinstance(v, float) else v

    return (
        w("bias")
        + w("length") * x["length"]
        + w("stopword") * x["stopword"]
        + w("punct") * x["punct"]
        + w("distinct") * x["distinct"]
    )


def quality_model_prob(
    col: str | Column, weights: dict[str, float] | None = None
) -> Column:
    """P(keep) from a logistic model over engineered quality features —
    the model-scoring stage of a corpus filter, as one codegen'd column
    expression (no UDF).

    ``weights`` defaults to the shipped fixed vector
    (``QUALITY_MODEL_WEIGHTS``); pass the output of
    :func:`train_quality_model_weights` to score with a trained model.
    Consumers round the probability for cross-engine hashes.
    """
    x = quality_feature_cols(col)
    z = _logit_z(x, dict(weights or QUALITY_MODEL_WEIGHTS))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


# ---------------------------------------------------------------------------
# Trainable quality classifier: distributed batch gradient descent
# ---------------------------------------------------------------------------

QUALITY_TRAIN_LR = 0.5  #: batch-GD learning rate (part of the oracle contract)


def _quality_training_set(df, text_col: str, label_col: str | None):
    """(x features, y double label). The default label distills the
    shipped fixed-weight model's keep gate (>= 0.5) — the realistic
    curation loop where an expensive labeler (heuristics, LLM judge)
    tags a corpus and a cheap logistic model is fit to imitate it."""
    x = quality_feature_cols(text_col)
    y = (
        F.col(label_col).cast("double")
        if label_col
        else (quality_model_prob(text_col) >= F.lit(0.5)).cast("double")
    )
    return df.select(
        x["length"].alias("x_length"),
        x["stopword"].alias("x_stopword"),
        x["punct"].alias("x_punct"),
        x["distinct"].alias("x_distinct"),
        y.alias("y"),
    )


def _gd_step(features, wdf, lr: float):
    """One batch-GD iteration as pure DataFrame ops: broadcast the
    1-row weight relation, ONE hash aggregate for the full gradient
    (exact-decimal staging: per-doc contributions rounded to 12
    decimals and summed as decimal(38,12) — order-independent, so the
    shuffle carries 6 numbers), then the weight update. The per-doc
    probability is rounded to 12 decimals BEFORE the residual so both
    engines difference the identical grid point (the q12 convention)."""
    j = features.crossJoin(F.broadcast(wdf))
    x = {
        "length": F.col("x_length"),
        "stopword": F.col("x_stopword"),
        "punct": F.col("x_punct"),
        "distinct": F.col("x_distinct"),
    }
    w = {name: F.col(f"w_{name}") for name in QUALITY_FEATURES}
    p12 = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit_z(x, w))), 12)
    err = p12 - F.col("y")

    def staged(contrib: Column) -> Column:
        return F.sum(F.round(contrib, 12).cast("decimal(38,12)"))

    g = j.agg(
        staged(err).alias("g_bias"),
        staged(err * x["length"]).alias("g_length"),
        staged(err * x["stopword"]).alias("g_stopword"),
        staged(err * x["punct"]).alias("g_punct"),
        staged(err * x["distinct"]).alias("g_distinct"),
        F.count(F.lit(1)).alias("n"),
    )
    upd = [
        F.round(
            F.col(f"w_{name}")
            - F.lit(lr) * (F.col(f"g_{name}").cast("double") / F.col("n").cast("double")),
            12,
        ).alias(f"w_{name}")
        for name in QUALITY_FEATURES
    ]
    return g.crossJoin(F.broadcast(wdf)).select(*upd)


def train_quality_model(
    df,
    text_col: str = "text",
    label_col: str | None = None,
    iters: int = 3,
    lr: float = QUALITY_TRAIN_LR,
):
    """Fit the logistic quality model by ``iters`` batch-GD iterations,
    entirely as chained DataFrame ops — no driver-side weight state, no
    collect: each iteration is one hash aggregate (the gradient, 6
    numbers over the wire) cross-joined back as a broadcast 1-row
    relation. Weights start at zero and stay on a 12-decimal grid
    (round after every update), so a bounded-iteration SQL oracle can
    replay every step exactly. Returns the 5-row ``(feature, weight
    decimal(28,12))`` relation, weights in ``QUALITY_FEATURES`` order.

    Scale shape: the feature frame (5 doubles/doc, narrow column
    expressions over text) is localCheckpoint-materialized ONCE and
    every iteration aggregates it — without the checkpoint the chained
    lazy plan re-inlines the regex-heavy feature scan into EVERY
    consumer subtree (each iteration's weights are a crossJoined
    aggregate over the previous plan, so scans compound with iters:
    measured **~50× at 1M docs for just 3 iterations**, 181 s → 3.5 s,
    identical weights — same-session interleaved A/B).
    The corpus is never shuffled — the only exchanges are the 6-number
    gradient partials. Fixed ``iters`` is the oracle mode;
    :func:`train_quality_model_until_delta` is the production mode
    (same checkpoint-once shape).
    """
    features = _quality_training_set(df, text_col, label_col).localCheckpoint()
    spark = df.sparkSession
    wdf = spark.range(1).select(
        *[F.lit(0.0).alias(f"w_{name}") for name in QUALITY_FEATURES]
    )
    for _ in range(iters):
        wdf = _gd_step(features, wdf, lr)
    stack_args = ", ".join(f"'{name}', w_{name}" for name in QUALITY_FEATURES)
    # decimal(38,12) is STAGING only (exact gradient sums); the output
    # weights are plain doubles on the 12-decimal grid — decimal output
    # columns break the driver's pandas hasher (cross-engine repr).
    return wdf.selectExpr(
        f"stack({len(QUALITY_FEATURES)}, {stack_args}) AS (feature, weight)"
    )


def train_quality_model_until_delta(
    df,
    text_col: str = "text",
    label_col: str | None = None,
    tol: float = 1e-6,
    max_iters: int = 50,
    lr: float = QUALITY_TRAIN_LR,
) -> tuple[dict[str, float], int]:
    """Production mode: iterate the identical GD step until the max
    absolute weight change drops below ``tol`` (or ``max_iters``).
    Collects the 1-row weight relation per iteration to test the stop
    condition — the canonical iterative-algorithm driver loop (cf.
    ``pagerank_until_delta``, ext/cluster.py): k floats per round, the
    corpus itself never leaves the executors. Returns (weights dict
    usable by :func:`quality_model_prob`, iterations run)."""
    features = _quality_training_set(df, text_col, label_col).localCheckpoint()
    spark = df.sparkSession
    wdf = spark.range(1).select(
        *[F.lit(0.0).alias(f"w_{name}") for name in QUALITY_FEATURES]
    )
    prev = {name: 0.0 for name in QUALITY_FEATURES}
    it = 0
    for it in range(1, max_iters + 1):
        row = _gd_step(features, wdf, lr).collect()[0]
        cur = {name: float(row[f"w_{name}"]) for name in QUALITY_FEATURES}
        wdf = spark.createDataFrame(
            [tuple(cur[n] for n in QUALITY_FEATURES)],
            ", ".join(f"w_{n} double" for n in QUALITY_FEATURES),
        )
        delta = max(abs(cur[n] - prev[n]) for n in QUALITY_FEATURES)
        prev = cur
        if delta < tol:
            break
    return prev, it


def lang_hits(col: str | Column, lang: str) -> Column:
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(ws_tokens(col), lambda t: t.isin(*markers)))


def lang_id(col: str | Column) -> Column:
    """Marker-word language ID: argmax of per-language hit counts with
    a fixed tie order (dict order of LANG_MARKERS); 'und' when no
    profile hits at all.
    """
    hits = {lang: lang_hits(col, lang) for lang in LANG_MARKERS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # Build the WHEN chain in reverse so earlier languages win ties.
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


# Gopher rule thresholds (Rae et al. 2021, "Scaling Language Models",
# §A1.1 quality-filter heuristics — doc-level bounds). Single source of
# truth for both the corpus-shaped aggregate (plans/text_queries.py
# text_gopher_filters) and the per-row gate below.
GOPHER_STOPS: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_doc_gate(col: str | Column) -> dict[str, Column]:
    """Per-row Gopher document gate — the narrow-map twin of the
    corpus-shaped ``text_gopher_filters`` aggregate (same thresholds,
    same law), as pure array expressions over the page's own token
    array: no explode, no shuffle, composable inside a pipeline
    projection. Returns ``{n_words, mean_word_len, alpha_word_frac,
    gopher_stop_hits, passes}``. Total on empty text (frac guards
    divide by ``greatest(n, 1)``; an empty page simply fails the
    word-count bound)."""
    t = ws_tokens(col)
    n = F.size(t)
    nz = F.greatest(n, F.lit(1)).cast("double")
    mean_len = F.aggregate(t, F.lit(0), lambda a, w: a + F.length(w)).cast("double") / nz
    alpha = F.size(F.filter(t, lambda w: w.rlike("[a-z]"))).cast("double") / nz
    stops = F.size(F.array_distinct(F.filter(t, lambda w: w.isin(*GOPHER_STOPS))))
    passes = (
        n.between(50, 100000)
        & mean_len.between(3.0, 10.0)
        & (alpha >= 0.8)
        & (stops >= 1)
    )
    return {
        "n_words": n,
        "mean_word_len": mean_len,
        "alpha_word_frac": alpha,
        "gopher_stop_hits": stops,
        "passes": passes,
    }


def normalized_text(col: str | Column) -> Column:
    """Canonical form for exact-dup hashing: lowercase, collapse
    whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def md5_fingerprint(col: str | Column) -> Column:
    """Exact-duplicate fingerprint: md5 hex of the normalized text."""
    return F.md5(normalized_text(col))


def rolling_fingerprint(col: str, n: int = 3) -> Column:
    """Rolling-hash document fingerprint: the minimum 60-bit hash over
    word n-gram windows (one representative shingle hash — the
    1-permutation special case of MinHash). Stable under small edits
    away from the minimizing window. ``col`` must be a column NAME
    (the shingle builder is a SQL expression).

    Per-row array expression — fine for point use; for whole-corpus
    fingerprinting prefer :func:`rolling_fingerprints` (explode +
    codegen'd min aggregate, ~20× faster — interpreted HOF md5 is the
    bottleneck here).
    """
    from spk_sl_validation_spark.ext.hashing import word_shingles

    sh = word_shingles(f"split(trim({col}), '\\\\s+')", n)
    return F.array_min(F.transform(sh, lambda s: md5_long(s)))


def rolling_fingerprints(df, id_col: str, text_col: str = "text", n: int = 3):
    """(id, rolling_fp) for a whole corpus: shingle rows → one
    codegen'd md5 each → groupBy(id).min. Same plan shape (and
    rationale) as dedup.minhash_signatures."""
    from spk_sl_validation_spark.ext.hashing import shingle_rows

    return (
        shingle_rows(df, id_col, text_col, n)
        .select(id_col, md5_long("s").alias("h"))
        .groupBy(id_col)
        .agg(F.min("h").alias("rolling_fp"))
    )


def _doc_span_arrays(df, id_col: str, text_col: str, span_w: int):
    """(id, __spans) — each document's non-overlapping ``span_w``-word
    spans as ONE per-row array (pure map, no explode). The array form
    is what reassembly wants: spans stay doc-local, indexed by
    position, and never ride a shuffle individually."""
    spans_per_doc = f"cast(greatest(ceil(size(__t) / {span_w}.0), 1) as int)"
    t = df.select(F.col(id_col), ws_tokens(text_col).alias("__t"))
    return t.select(
        id_col,
        F.expr(
            f"transform(sequence(0, {spans_per_doc} - 1),"
            f" i -> concat_ws(' ', slice(__t, i * {span_w} + 1, {span_w})))"
        ).alias("__spans"),
    )


def _doc_spans(df, id_col: str, text_col: str, span_w: int):
    """(id, span_idx, span) — the exploded view of
    :func:`_doc_span_arrays`, a narrow per-row map
    (~n_words/span_w spans per doc). Shared by :func:`span_dedup`
    and :func:`boilerplate_removal`."""
    return _doc_span_arrays(df, id_col, text_col, span_w).select(
        id_col, F.posexplode("__spans").alias("span_idx", "span")
    )


def span_dedup(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_w: int = 8,
    ownership: str = "groupby",
):
    """C4-style cross-document duplicated-span removal.

    Splits each document into non-overlapping ``span_w``-word spans; a
    span occurring in more than one document survives only in its
    lowest-``id_col`` owner and is stripped everywhere else; documents
    are reassembled in span order. Returns
    ``(id, clean_text, n_spans_kept, n_spans_dropped)``.

    Scale shape (same rationale as :func:`substring_dedup`, which
    pioneered it): the corpus TEXT never shuffles on the fingerprint
    key — spans are hashed to 8-byte longs immediately and only
    ``(id, span_idx, h)`` rows ride the fingerprint exchanges.
    Ownership is ``groupBy(h).agg(min(id), count)`` (map-side partials
    absorb a mega-hot span — license boilerplate in 10^8 docs — where
    a ``min over Window.partitionBy(h)`` would pin every occurrence to
    one AQE-unsplittable task) + a ``count > 1``-gated,
    localCheckpointed join-back that AQE skew-splits. Spans seen once
    can never be dropped (their only document IS the owner), so the
    gate shrinks the join build side to duplicate-candidate hashes
    only. Dropped positions fold to one small ``(id, drop_idx_set)``
    row per affected doc; a second pure-map scan re-derives the span
    ARRAYS per document and a shuffle_hash join on the unique doc id
    (never broadcast — a fully-duplicated corpus makes the drop side
    corpus-sized; AQE re-upgrades small cases) filters them in place.
    Duplicate spans *within* the owner document are kept — ownership
    is per-document, not global uniqueness.

    ``ownership="window"`` keeps the legacy probe-only shape for
    interleaved A/B in tools/skew_probe.py (op span_hot).
    """
    if ownership not in ("groupby", "window"):
        raise ValueError(f"unknown ownership mode {ownership!r}")
    skinny = _doc_spans(df, id_col, text_col, span_w).select(
        id_col, "span_idx", md5_long("span").alias("h")
    )
    if ownership == "window":
        from pyspark.sql import Window

        dropped_pos = (
            skinny.withColumn("owner", F.min(id_col).over(Window.partitionBy("h")))
            .where(F.col(id_col) != F.col("owner"))
            .select(id_col, "span_idx")
        )
    else:
        cand = (
            skinny.groupBy("h")
            .agg(F.min(id_col).alias("owner"), F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .drop("__n")
        )
        # Lazy localCheckpoint: same measured OptimizeSkewedJoin
        # precondition as substring_dedup — both join children must be
        # plain shuffle stages for AQE to split the hot fingerprint.
        cand = cand.localCheckpoint(eager=False)
        dropped_pos = (
            skinny.join(cand.hint("shuffle_hash"), "h")
            .where(F.col(id_col) != F.col("owner"))
            .select(id_col, "span_idx")
        )
    drops = dropped_pos.groupBy(id_col).agg(
        F.collect_set("span_idx").alias("__drop")
    )
    spans = _doc_span_arrays(df, id_col, text_col, span_w)
    joined = spans.join(drops.hint("shuffle_hash"), id_col, "left")
    kept = F.when(F.col("__drop").isNull(), F.col("__spans")).otherwise(
        F.filter(
            F.col("__spans"),
            lambda s, i: ~F.array_contains(F.col("__drop"), i),
        )
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("bigint").alias("n_spans_kept"),
        F.coalesce(F.size("__drop"), F.lit(0)).cast("bigint").alias("n_spans_dropped"),
    )


def boilerplate_removal(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_w: int = 8,
    min_docs: int = 3,
    broadcast_bp: bool = True,
):
    """CCNet/RefinedWeb-style boilerplate removal: a ``span_w``-word
    span occurring in at least ``min_docs`` DISTINCT documents is
    treated as boilerplate (headers, footers, licence blocks, nav
    chrome) and removed from EVERY document — including the first one.
    Documents are reassembled in span order. Returns
    ``(id, clean_text, n_spans_kept, n_spans_dropped)``.

    Distinct semantics from :func:`span_dedup`: dedup keeps one owner
    copy of a duplicated span (content preservation); boilerplate
    removal deletes the span everywhere (it is template noise, not
    content). The reference has no corpus operators; this extends its
    cleansing scope (SURVEY.md SS2.6) the way CCNet's hashed-paragraph
    pass does, at span granularity because the synthetic corpus has no
    paragraph marks.

    Scale shape: one narrow span build, then a census
    ``groupBy(span_hash).agg(countDistinct(id))`` (two-phase hash
    aggregate, uniform on the 60-bit hash) whose output is filtered to
    the boilerplate set — hashes only, 8 bytes each, bounded above by
    n_distinct_spans / min_docs and in practice tiny (boilerplate is by
    definition heavily repeated). That set broadcast-anti-joins back
    against the span stream, so the corpus itself is never shuffled for
    the join; reassembly is the same doc-id aggregate as span_dedup.
    For a pathological corpus where the boilerplate set itself exceeds
    driver memory, pass ``broadcast_bp=False`` to fall back to a
    shuffle join on the span hash.
    """
    index = boilerplate_index(df, id_col, text_col, span_w, min_docs)
    return apply_boilerplate_index(df, index, id_col, text_col, span_w, broadcast_bp)


def boilerplate_census(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_w: int = 8,
):
    """(h, n_docs): the UNFILTERED span census — every distinct span
    hash with its distinct-document count. This is the mergeable
    artifact: censuses of DISJOINT document sets merge by summing
    ``n_docs`` per hash (:func:`merge_boilerplate_census`), so an
    ingest pipeline censuses each batch and folds it in without ever
    re-scanning the corpus. Corpus-scale at rest (one row per distinct
    span) — store it bucketed by ``h``; the small broadcastable
    artifact is the filtered view :func:`boilerplate_index` derives
    from it."""
    hashed = _doc_spans(df, id_col, text_col, span_w).withColumn("h", md5_long("span"))
    return hashed.groupBy("h").agg(F.countDistinct(id_col).alias("n_docs"))


def merge_boilerplate_census(a, b):
    """Fold two span censuses over DISJOINT document-id sets into one:
    distinct-doc counts are additive exactly when no document appears
    in both inputs (the ingest-batch invariant — batches carry fresh
    ids). merge(census(A), census(B)) == census(A ∪ B), pinned by
    test."""
    return (
        a.unionByName(b)
        .groupBy("h")
        .agg(F.sum("n_docs").alias("n_docs"))
    )


def boilerplate_index(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_w: int = 8,
    min_docs: int = 3,
):
    """(h, n_docs): the boilerplate-span set — hashes of every
    ``span_w``-word span occurring in at least ``min_docs`` distinct
    documents. The small PERSISTABLE artifact (same pattern as
    ``dedup_index_tables`` / ``bm25_index_tables``): census the corpus
    periodically (or fold batches into :func:`boilerplate_census`),
    write this tiny hash relation out, and strip every fresh ingest
    batch against it with :func:`apply_boilerplate_index` — no
    per-batch corpus scan."""
    return boilerplate_census(df, id_col, text_col, span_w).filter(
        F.col("n_docs") >= min_docs
    )


def apply_boilerplate_index(
    df,
    index,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_w: int = 8,
    broadcast_bp: bool = True,
):
    """Strip every span of ``df`` whose hash appears in ``index``
    (see :func:`boilerplate_index`) and reassemble; returns the same
    ``(id, clean_text, n_spans_kept, n_spans_dropped)`` contract as
    :func:`boilerplate_removal`. The batch never shuffles: the index is
    hashes-only and broadcasts (``broadcast_bp=False`` falls back to a
    shuffle join for a pathological index)."""
    hashed = _doc_spans(df, id_col, text_col, span_w).withColumn("h", md5_long("span"))
    bp = index.select("h", F.lit(True).alias("__bp"))
    if broadcast_bp:
        bp = F.broadcast(bp)
    flagged = hashed.join(bp, "h", "left").withColumn("kept", F.col("__bp").isNull())
    kept_struct = F.when(F.col("kept"), F.struct("span_idx", "span"))
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s["span"]),
            " ",
        ).alias("clean_text"),
        F.count(F.when(F.col("kept"), 1)).alias("n_spans_kept"),
        F.count(F.when(~F.col("kept"), 1)).alias("n_spans_dropped"),
    )


def substring_dedup(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    min_len: int = 12,
    ownership: str = "groupby",
):
    """ExactSubstr-style maximal duplicated-substring removal
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better") — the maximal-span generalization of
    :func:`span_dedup`'s fixed non-overlapping 8-grams.

    Every SLIDING ``w``-token window is fingerprinted; a window whose
    hash also occurs in a lower-``id_col`` document marks its positions
    as duplicated. Runs of consecutive duplicated positions (islands)
    become token intervals ``[s, e+w-1]``; intervals that overlap OR
    touch in token space are MERGED into one maximal contiguous span
    (equivalently: islands over the set of covered tokens — the
    suffix-array "maximal match" semantic recovered with windows
    instead of suffix arrays); merged spans shorter than ``min_len``
    tokens are kept (Lee et al.'s length threshold — short incidental
    matches are not duplication). The lowest-id owner keeps
    its copy, like :func:`span_dedup`. Returns ``(id, clean_text,
    n_tokens_removed, n_spans_removed)``.

    Scale shape: the corpus TEXT is never shuffled on the fingerprint
    key — windows are hashed to 8-byte longs immediately and only
    ``(id, pos, h)`` rows ride the fingerprint exchanges. Ownership is
    ``groupBy(h).agg(min(id), count)`` (map-side partials absorb a
    mega-hot fingerprint; a window over ``h`` would pin it to one
    unsplittable task) + a ``count > 1``-gated join-back that AQE can
    skew-split; surviving duplicated positions (usually a tiny
    fraction) re-shuffle on ``id`` where islands, interval merge, and
    the length gate are all windows/aggregates over that single
    partitioning. Reassembly joins the (small) per-doc interval arrays
    back to the token arrays — shuffle_hash-hinted, never broadcast
    (a 50%-duplicated corpus makes the interval side corpus-sized; AQE
    re-upgrades genuinely small cases). Four exchanges end-to-end, one
    extra pure-map fingerprint scan (embarrassingly parallel) traded
    for the removal of the only AQE-unsplittable hot spot; no
    self-join of the corpus, no driver state.
    """
    from pyspark.sql import Window

    docs = df.select(F.col(id_col), ws_tokens(text_col).alias("__t"))
    sh = docs.select(
        id_col,
        F.posexplode(
            F.expr(
                f"CASE WHEN size(__t) >= {w} THEN transform(sequence(0, size(__t) - {w}),"
                f" i -> concat_ws(' ', slice(__t, i + 1, {w}))) ELSE "
                "array() END"
            )
        ).alias("pos", "span"),
    ).select(id_col, "pos", md5_long("span").alias("h"))
    # Ownership via groupBy + join-back, NOT min() over
    # Window.partitionBy("h"): a window puts every row of one
    # fingerprint in a single unsplittable task (a boilerplate w-gram
    # in 10^8 docs stalls there — AQE cannot split window partitions),
    # whereas the groupBy's map-side partial aggregation absorbs the
    # hot key and the join-back IS AQE-skew-splittable. Fingerprints
    # seen once can never mark a duplicate (id == owner), so the
    # __n > 1 gate shrinks the join build side to duplicate-candidate
    # hashes only — unique windows dominate real corpora.
    if ownership not in ("groupby", "window"):
        raise ValueError(f"unknown ownership mode {ownership!r}")
    if ownership == "window":
        # Probe-only legacy shape (tools/skew_probe.py A/B): correct but
        # pins every row of one fingerprint to a single window task.
        dup = (
            sh.withColumn("owner", F.min(id_col).over(Window.partitionBy("h")))
            .where(F.col(id_col) != F.col("owner"))
            .select(id_col, "pos")
        )
    else:
        cand = (
            sh.groupBy("h")
            .agg(F.min(id_col).alias("owner"), F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .drop("__n")
        )
        # Lazy localCheckpoint: measured necessity, not style. With the
        # agg inlined, OptimizeSkewedJoin never fires — its pattern
        # requires BOTH join children to be plain ENSURE_REQUIREMENTS
        # shuffle stages, and the agg-on-top-of-stage build side breaks
        # it (verified empirically in tools/skew_probe.py substr_hot:
        # inline agg / repartition / rebalance hints all give 0
        # skew=true; the checkpointed leaf gives the split). The
        # checkpoint materializes only (h, owner) for duplicated
        # fingerprints — orders of magnitude under the window-row
        # frame — and buys AQE the right to split a mega-hot
        # fingerprint partition on the probe side.
        cand = cand.localCheckpoint(eager=False)
        dup = (
            sh.join(cand.hint("shuffle_hash"), "h")
            .where(F.col(id_col) != F.col("owner"))
            .select(id_col, "pos")
        )
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    islands = dup.withColumn("grp", F.col("pos") - F.row_number().over(wdoc))
    intervals = islands.groupBy(id_col, "grp").agg(
        F.min("pos").alias("s"), (F.max("pos") + F.lit(w - 1)).alias("e")
    )
    ws = Window.partitionBy(id_col).orderBy("s")
    merged = (
        intervals.withColumn(
            "brk",
            (
                F.col("s")
                > F.coalesce(
                    F.max("e").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(-2),
                )
                + 1  # s == prev_e + 1 touches: still one contiguous region
            ).cast("int"),
        )
        .withColumn("mgrp", F.sum("brk").over(ws))
        .groupBy(id_col, "mgrp")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .where(F.col("e") - F.col("s") + 1 >= min_len)
    )
    ivs = merged.groupBy(id_col).agg(F.collect_list(F.struct("s", "e")).alias("__iv"))
    joined = docs.join(ivs.hint("shuffle_hash"), id_col, "left")
    kept = F.when(F.col("__iv").isNull(), F.col("__t")).otherwise(
        F.filter(
            F.col("__t"),
            lambda tok, i: ~F.exists(
                F.col("__iv"), lambda v: (i >= v["s"]) & (i <= v["e"])
            ),
        )
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("clean_text"),
        (F.size("__t") - F.size(kept)).cast("bigint").alias("n_tokens_removed"),
        F.coalesce(F.size("__iv"), F.lit(0)).cast("bigint").alias("n_spans_removed"),
    )


# ---------------------------------------------------------------------------
# BPE merge-loop training (iterative vocabulary induction)
# ---------------------------------------------------------------------------

#: Spaced-symbol invariant for BPE sequences: every symbol has ONE
#: space before and after it, so adjacent symbols are separated by TWO
#: spaces (`' h  e  l  l  o '`). Under this invariant a single literal
#: ``replace(s, ' a  b ', ' ab ')`` applies one BPE merge with exact
#: greedy left-to-right non-overlap semantics — consecutive pair
#: occurrences do not share boundary spaces, so replace-all merges them
#: all, while 'a a a' under merge (a,a) correctly yields [aa, a].
#: Both engines' ``replace`` are literal and scan left-to-right, so the
#: oracle replays each iteration byte-identically.


def _bpe_spaced(word_col: str | Column) -> Column:
    """word -> spaced symbol string: each char becomes ' c '."""
    c = F.col(word_col) if isinstance(word_col, str) else word_col
    return F.regexp_replace(c, "(.)", " $1 ")


def _bpe_pair_counts(words):
    """(lhs, rhs, n): adjacent-symbol pair counts weighted by word
    frequency, from the spaced-string column ``s`` + count ``cnt``."""
    return (
        words.select(
            # guard: Spark's sequence(1, 0) is the DESCENDING [1, 0],
            # not empty — a fully-merged 1-symbol word must yield no pairs
            F.explode(
                F.expr(
                    "CASE WHEN size(split(trim(s), '  ')) >= 2 THEN"
                    " transform(sequence(1, size(split(trim(s), '  ')) - 1),"
                    " i -> struct(element_at(split(trim(s), '  '), i) AS lhs,"
                    "             element_at(split(trim(s), '  '), i + 1) AS rhs))"
                    " ELSE array() END"
                )
            ).alias("p"),
            "cnt",
        )
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("cnt").alias("n"))
    )


def learn_bpe_merges(df, text_col: str = "text", n_merges: int = 5):
    """Learn ``n_merges`` BPE merges over the corpus (Sennrich et al.
    2016): loop argmax-pair → apply merge everywhere → recount.
    Returns ``(step, lhs, rhs, merged, pair_count)``, one row per merge
    in training order.

    Spark-first shape: training runs on the DISTINCT-WORD frequency
    table, not the corpus (the classic BPE trick — pair counts are
    word-count weighted, so a 100 TB corpus collapses to its
    vocabulary, millions of rows, before any iteration); each
    iteration is one explode + hash aggregate for the counts, a 1-row
    argmax collect (count desc, then (lhs, rhs) asc — deterministic),
    and one literal ``replace`` under the spaced-symbol invariant.
    ``localCheckpoint`` truncates lineage per iteration (the
    ext/graph.py fixed-point pattern) so iteration t's plan does not
    re-derive iterations 1..t-1. Words shorter than 2 chars are
    dropped up front: a 1-symbol sequence never produces a pair in any
    iteration, so they cannot affect any merge decision.

    All arithmetic is integer and every tie-break is total —
    hash-exact across engines; the oracle unrolls the same loop in
    SQL CTEs.
    """
    # r12 (guide §5 — the sequential collect()s serialized the learn
    # loop on the driver): the whole loop now unrolls into ONE lazy
    # plan. Each step's argmax is a 1-row relation that rides a
    # broadcast cross join back onto the vocab and is applied with a
    # NON-literal F.replace — no driver round trip per merge. Lazy
    # localCheckpoints truncate every step's plan at build time and
    # persist each intermediate (MEMORY_AND_DISK) so the chained
    # references compute once, inside the single job the caller's one
    # action triggers (jobs per learned merge: ~1/K plus the internal
    # per-step broadcast materializations, vs 1 collect + checkpoint
    # jobs before). Empty-corpus/exhaustion semantics unchanged: an
    # exhausted step's argmax is an EMPTY relation, the cross join
    # empties every later vocab, and the union simply carries no row
    # for those steps — exactly the old early `break`.
    if n_merges < 1:
        return df.sparkSession.createDataFrame(
            [], "step int, lhs string, rhs string, merged string, pair_count bigint"
        )
    words = (
        df.select(F.explode(ws_tokens(text_col)).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_bpe_spaced("w").alias("s"), "cnt")
        .localCheckpoint(eager=False)
    )
    out = None
    for step in range(1, n_merges + 1):
        best = (
            _bpe_pair_counts(words)
            .orderBy(F.col("n").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .select(
                F.lit(step).alias("step"),
                "lhs",
                "rhs",
                F.concat("lhs", "rhs").alias("merged"),
                F.col("n").alias("pair_count"),
            )
            .localCheckpoint(eager=False)
        )
        out = best if out is None else out.unionAll(best)
        if step < n_merges:
            pat = F.concat(F.lit(" "), F.col("lhs"), F.lit("  "), F.col("rhs"), F.lit(" "))
            rep = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
            words = (
                words.crossJoin(F.broadcast(best.select("lhs", "rhs", "merged")))
                .select(F.replace(F.col("s"), pat, rep).alias("s"), "cnt")
                .localCheckpoint(eager=False)
            )
    return out


def bpe_segment(col: str | Column, merges: list[tuple]) -> Column:
    """Apply a learned merge table to a word column: returns the
    array of BPE symbols for each word (inference twin of
    :func:`learn_bpe_merges` — same spaced-string invariant, merges
    applied in training order)."""
    s = _bpe_spaced(col)
    for row in merges:
        lhs, rhs = row[1], row[2]
        s = F.replace(s, F.lit(f" {lhs}  {rhs} "), F.lit(f" {lhs}{rhs} "))
    return F.split(F.trim(s), "  ")


def bpe_encode_stats(
    df, merges: list[tuple], id_col: str = "doc_id", text_col: str = "text"
):
    """Encode every document under a learned merge table and report
    per-doc tokenizer statistics: (id, n_words, n_bpe_tokens,
    bpe_fertility = symbols per word, rounded to 6).

    The tokenizer-serving shape: the merge table is DRIVER-SIDE tiny
    (tens of rows — it is a tokenizer, not data) and folds into the
    expression as literals, so encoding is a PURE NARROW MAP — zero
    shuffles, no join, embarrassingly parallel over a 100 TB corpus.
    Every word is encoded (training drops <2-char words because they
    can never form a pair, but they still encode to one symbol each).
    """
    toks = ws_tokens(text_col)
    n_words = F.size(toks).cast("long")
    n_bpe = F.aggregate(
        F.transform(toks, lambda w: F.size(bpe_segment(w, merges)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(
        id_col,
        n_words.alias("n_words"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(n_bpe.cast("double") / n_words.cast("double"), 6).alias("bpe_fertility"),
    )


def nfc_normalize_text(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Unicode NFC normalization — the canonical-composition pass a
    corpus runs before any hashing/dedup/fingerprinting: visually
    identical strings with decomposed combining marks (``e`` +
    U+0301 vs ``é``) would otherwise carry different fingerprints and
    silently never dedup. The module's one Arrow-batched Python
    boundary by necessity: Spark has no built-in normalizer
    expression and ``reflect()`` cannot pass the
    ``java.text.Normalizer.Form`` enum. DuckDB twin:
    ``nfc_normalize()`` — a genuinely independent implementation
    (ICU) checking CPython's unicodedata. Returns ``(id, nfc_text,
    changed, n_chars_before, n_chars_after)``; NULL text stays NULL
    with changed=false."""
    import pandas as pd  # noqa: F401  (pandas_udf signature)

    @F.pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    out = df.select(
        F.col(id_col), F.col(text_col).alias("__raw"), _nfc(text_col).alias("nfc_text")
    )
    return out.select(
        id_col,
        "nfc_text",
        F.coalesce(F.col("nfc_text") != F.col("__raw"), F.lit(False)).alias("changed"),
        F.coalesce(F.length("__raw"), F.lit(0)).cast("int").alias("n_chars_before"),
        F.coalesce(F.length("nfc_text"), F.lit(0)).cast("int").alias("n_chars_after"),
    )


def winnowing_fingerprints(
    df, id_col: str = "doc_id", text_col: str = "text", k: int = 3, w: int = 4
):
    """Winnowing document fingerprints (Schleimer et al. 2003, the
    MOSS algorithm): hash every word ``k``-gram, slide a window of
    ``w`` consecutive hashes, keep the MINIMUM of each window, dedupe
    — the selected set is guaranteed to share a fingerprint with any
    document sharing a run of ≥ ``w + k - 1`` words, at ~1/w the
    storage of full shingling. Pure per-row array expressions
    (O(shingles · w) HOF cost), one explode to the skinny
    ``(id, fp)`` relation — cross-doc matching then joins/aggregates
    on an 8-byte key, never text. Short docs (< k tokens) fingerprint
    their whole text (one shingle, one window)."""
    from spk_sl_validation_spark.ext.hashing import md5_long, word_shingles
    from spk_sl_validation_spark.operators.relational import evaluate_once

    sh = word_shingles(f"split(trim({text_col}), '\\\\s+')", k)
    h = F.transform(sh, lambda s: md5_long(s))
    # evaluate_once barrier: without it CollapseProject inlines the
    # interpreted-HOF md5 array into EVERY window's slice — O(m²) md5
    # evaluations per doc (measured 29 s → 2.5 s at sf0.01)
    base = evaluate_once(df.select(F.col(id_col), h.alias("__h")), "__h")
    hh = F.col("__h")
    upper = F.greatest(F.size(hh) - (w - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), upper), lambda i: F.array_min(F.slice(hh, i, w))
        )
    )
    return base.select(F.col(id_col), F.explode(fps).alias("fp"))
