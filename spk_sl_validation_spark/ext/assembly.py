"""Dataset-assembly operators: sequence packing, mixture sampling,
unigram LM scoring.

North-star extension — the last mile of a training-data pipeline,
after cleaning/dedup: pack documents into fixed-length training
sequences, sample sources to a target mixture, and score documents
against a corpus-level unigram language model (the cheap stand-in for
CCNet-style perplexity filtering).

Scale design notes:
- Packing needs a GLOBAL running sum of token counts. A single
  unpartitioned window is a one-task bottleneck at 100 TB, so
  :func:`pack_sequences` uses the classic two-phase prefix sum:
  within-chunk cumsum (parallel window partitioned by chunk) plus a
  broadcast cumsum over per-chunk totals (one tiny window over
  ~n/chunk_size rows). Identical result to the naive global window,
  verified by the oracle which IS the naive global window.
- Mixture sampling is a pure narrow map (hash < threshold) — no
  shuffle, deterministic, stable under re-runs and repartitioning,
  unlike ``df.sample`` whose output depends on partition layout.
- Unigram scoring joins tokens against a broadcast frequency table
  and folds per-document log-probs in position order (the usual
  engine-identical float discipline); the mean is rounded to absorb
  libm ``ln`` last-ulp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.hashing import md5_long, md5_long_sql, ws_tokens


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------

def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    chunk_size: int = 1024,
) -> DataFrame:
    """Assign each document its position in the packed token stream:
    documents are concatenated in ``id_col`` order and cut into
    ``seq_len``-token training sequences.

    Output: (id, n_tokens, tok_offset, seq_id, offset_in_seq, end_seq_id)
    where ``tok_offset`` is the exclusive prefix sum of token counts,
    ``seq_id = tok_offset // seq_len``, and ``end_seq_id`` is the sequence
    holding the document's last token (> seq_id ⇒ the doc straddles a
    boundary).

    Two-phase prefix sum: docs are grouped into chunks of
    ``chunk_size`` ids; phase 1 computes within-chunk cumsums under a
    ``partitionBy(chunk)`` window (parallel), phase 2 cumsums the
    per-chunk totals (rows = n/chunk_size, one tiny window task) and
    broadcasts them back. No single-task scan of the corpus ever
    happens — this is the distributed scan-primitive shape.
    """
    n_tok = F.size(ws_tokens(text_col))
    # base feeds the within-chunk window AND the chunk-totals aggregate;
    # materialize the 3-long-per-doc relation once instead of
    # re-tokenizing the corpus per consumer.
    base = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (F.col(id_col) / chunk_size).cast("long").alias("__chunk"),
    ).localCheckpoint(eager=True)
    w_in = (
        Window.partitionBy("__chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = base.withColumn("__local_off", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))
    totals = base.groupBy("__chunk").agg(F.sum("n_tokens").alias("__chunk_tot"))
    w_ch = (
        Window.orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
    )
    chunk_off = totals.select(
        "__chunk", F.coalesce(F.sum("__chunk_tot").over(w_ch), F.lit(0)).alias("__chunk_off")
    )
    packed = (
        within.join(F.broadcast(chunk_off), "__chunk")
        .withColumn("tok_offset", F.col("__chunk_off") + F.col("__local_off"))
    )
    return packed.select(
        id_col,
        "n_tokens",
        "tok_offset",
        (F.col("tok_offset") / seq_len).cast("long").alias("seq_id"),
        (F.col("tok_offset") % seq_len).alias("offset_in_seq"),
        (
            F.when(F.col("n_tokens") > 0, (F.col("tok_offset") + F.col("n_tokens") - 1))
            .otherwise(F.col("tok_offset"))
            / seq_len
        ).cast("long").alias("end_seq_id"),
    )


def pack_sequences_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", seq_len: int = 2048
) -> str:
    """DuckDB twin: the NAIVE single global window — the semantic spec
    the two-phase plan must reproduce exactly."""
    toks = rf"len(string_split_regex(trim({text_col}), '\s+'))"
    return f"""
WITH n AS (SELECT {id_col}, {toks} AS n_tokens FROM {table}),
o AS (
  SELECT {id_col}, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
  FROM n
)
SELECT {id_col}, n_tokens, tok_offset,
       tok_offset // {seq_len} AS seq_id,
       tok_offset % {seq_len} AS offset_in_seq,
       (CASE WHEN n_tokens > 0 THEN tok_offset + n_tokens - 1 ELSE tok_offset END) // {seq_len} AS end_seq_id
FROM o
"""


# ---------------------------------------------------------------------------
# Mixture sampling
# ---------------------------------------------------------------------------

SAMPLE_MOD = 1_000_000


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-source subsampling to a target mixture:
    keep a row iff ``md5(id) % 1e6 < weight[source] * 1e6``.

    Unknown sources get weight 0 (dropped). Pure narrow map — the
    sample is a property of the ROW, not of partition layout or run
    order, so it is reproducible across cluster sizes and re-runs
    (``df.sample`` is neither). This is how a 100 TB mixing job stays
    restartable.
    """
    h = md5_long(F.col(id_col).cast("string")) % SAMPLE_MOD
    thresh = F.lit(0)
    for src, w in sorted(weights.items()):
        thresh = F.when(F.col(source_col) == src, F.lit(int(w * SAMPLE_MOD))).otherwise(thresh)
    return df.filter(h < thresh)


def mixture_predicate_sql(
    weights: dict[str, float], source_col: str = "source", id_col: str = "doc_id"
) -> str:
    """The WHERE-clause predicate of :func:`mixture_sample` (for
    embedding in composed oracles)."""
    h = md5_long_sql(f"CAST({id_col} AS VARCHAR)")
    cases = " ".join(
        f"WHEN {source_col} = '{src}' THEN {int(w * SAMPLE_MOD)}"
        for src, w in sorted(weights.items())
    )
    return f"({h}) % {SAMPLE_MOD} < (CASE {cases} ELSE 0 END)"


def mixture_sample_sql(
    table: str,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`mixture_sample`."""
    return (
        f"SELECT {select} FROM {table} "
        f"WHERE {mixture_predicate_sql(weights, source_col, id_col)}"
    )


# ---------------------------------------------------------------------------
# Unigram LM document scoring
# ---------------------------------------------------------------------------

def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Score each document by mean token log-probability under the
    corpus's own unigram distribution — the cheap proxy for LM-
    perplexity quality filtering (CCNet-style): gibberish and
    boilerplate score far from the corpus mean.

    Output: (id, n_tokens, avg_logprob). Shape: one token explode →
    corpus frequency aggregate (vocab-bounded, broadcast back) →
    per-document EXACT sum of ``round(ln(cnt/total), 12)`` as
    DECIMAL(28,12): rounding absorbs libm ``ln`` ulp drift, and a
    decimal sum is order-independent, so both engines land on the
    identical total with a plain codegen'd hash aggregate — no
    position-ordered fold (the previous collect_list + interpreted
    array fold cost ~40% of the query).
    """
    toks = df.select(F.col(id_col), F.explode(ws_tokens(text_col)).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    freq_p = freq.crossJoin(F.broadcast(total))
    joined = toks.join(F.broadcast(freq_p), "tok").select(
        id_col,
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("total").cast("double")), 12
        )
        .cast("decimal(28,12)")
        .alias("logp"),
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("logp").alias("__sum_logp"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.round(
            F.col("__sum_logp").cast("double") / F.col("n_tokens").cast("double"),
            round_digits,
        ).alias("avg_logprob"),
    )


def unigram_logprob_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", round_digits: int = 6
) -> str:
    """DuckDB twin of :func:`unigram_logprob` (same round-then-exact-
    decimal-sum rule, so summation order cannot matter)."""
    toks = rf"string_split_regex(trim({text_col}), '\s+')"
    return f"""
WITH t AS (
  SELECT {id_col}, unnest(tk) AS tok
  FROM (SELECT {id_col}, {toks} AS tk FROM {table})
),
freq AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
tot AS (SELECT sum(cnt) AS total FROM freq),
j AS (
  SELECT t.{id_col},
         CAST(round(ln(CAST(f.cnt AS DOUBLE) / CAST(tot.total AS DOUBLE)), 12)
              AS DECIMAL(28,12)) AS logp
  FROM t JOIN freq f ON t.tok = f.tok CROSS JOIN tot
)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(logp) AS DOUBLE) / count(*), {round_digits}) AS avg_logprob
FROM j GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# Bigram LM document scoring
# ---------------------------------------------------------------------------

def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Score each document by mean CONDITIONAL log-probability
    ``ln P(tok | prev)`` under the corpus's own bigram LM (MLE; every
    scored bigram exists in the model because the model is trained on
    the same corpus, so no smoothing term is needed).

    Sharper than :func:`unigram_logprob` at catching shuffled-word and
    stitched-boilerplate text, which keeps a normal unigram profile
    but improbable transitions.

    Output: (id, n_bigrams, avg_logprob); single-token documents have
    no bigrams and are absent, by contract. Shape: (prev, tok) pairs
    are derived MAP-SIDE by zipping the token array against itself
    shifted by one (``arrays_zip(slice, slice)``, plain codegen — no
    posexplode, no per-doc lag window, no exchange; this is also
    exactly how the oracle derives them); the bigram count is one hash
    aggregate of those skinny rows and the context denominator is a
    window-sum OVER the vocab-bounded model relation (one exchange on
    ``prev`` replacing the previous groupBy + join pair); scoring joins
    pair rows to the model on the bigram key. Round-4 rewrite cut the
    plan from 10 exchanges to 5 (same value hash; same-session A/B in
    BENCH_HISTORY.md). Mean uses the same round-then-exact-decimal-sum
    rule as the unigram scorer (rounding absorbs libm ``ln`` ulp
    drift; the decimal sum is order-independent, so no ordered fold).
    """
    from pyspark.sql import Window

    tk = ws_tokens(text_col)
    n1 = F.greatest(F.size(tk) - F.lit(1), F.lit(0))
    pairs = F.arrays_zip(
        F.slice(tk, F.lit(1), n1).alias("prev"),
        F.slice(tk, F.lit(2), n1).alias("tok"),
    )
    bi = df.select(F.col(id_col), F.explode(pairs).alias("__b")).select(
        id_col, F.col("__b.prev").alias("prev"), F.col("__b.tok").alias("tok")
    )
    bfreq = bi.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    # Context denominator Σ_tok cnt as a window-sum over the model
    # itself: bfreq is vocab²-bounded, so the single exchange on
    # ``prev`` is cheap, and it replaces the former groupBy("prev") +
    # equi-join pair (two exchanges).
    wprev = Window.partitionBy("prev")
    model = bfreq.select(
        "prev",
        "tok",
        F.round(
            F.log(
                F.col("cnt").cast("double")
                / F.sum("cnt").over(wprev).cast("double")
            ),
            12,
        )
        .cast("decimal(28,12)")
        .alias("logp"),
    )
    # Build side pinned with a shuffle_hash hint on the MODEL side:
    # planner size estimates for a synthesized/checkpointed corpus can
    # be tiny, and an estimate-driven BuildLeft would broadcast the
    # full pair stream (measured: 2M-doc probe died on
    # driver.maxResultSize collecting an 88M-row "broadcast"). The
    # model is the vocab²-bounded side; hashing it per partition is
    # safe at any corpus size, and AQE still upgrades the join to
    # broadcast at runtime when the model proves small.
    joined = bi.join(model.hint("shuffle_hash"), ["prev", "tok"]).select(id_col, "logp")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("logp").alias("__sum_logp"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        F.round(
            F.col("__sum_logp").cast("double") / F.col("n_bigrams").cast("double"),
            round_digits,
        ).alias("avg_logprob"),
    )


def bigram_logprob_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", round_digits: int = 6
) -> str:
    """DuckDB twin of :func:`bigram_logprob` (same round-then-exact-
    decimal-sum rule, so summation order cannot matter)."""
    toks = rf"string_split_regex(trim({text_col}), '\s+')"
    return f"""
WITH t AS (
  SELECT {id_col}, u.prev, u.tok FROM (
    SELECT {id_col},
           unnest(list_transform(range(2, len(tk) + 1),
                  i -> struct_pack(prev := tk[i - 1], tok := tk[i]))) AS u
    FROM (SELECT {id_col}, {toks} AS tk FROM {table})
  )
),
bf AS (SELECT prev, tok, count(*) AS cnt FROM t GROUP BY prev, tok),
cf AS (SELECT prev, sum(cnt) AS ctx FROM bf GROUP BY prev),
j AS (
  SELECT t.{id_col},
         CAST(round(ln(CAST(bf.cnt AS DOUBLE) / CAST(cf.ctx AS DOUBLE)), 12)
              AS DECIMAL(28,12)) AS logp
  FROM t JOIN bf ON t.prev = bf.prev AND t.tok = bf.tok
         JOIN cf ON t.prev = cf.prev
)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(logp) AS DOUBLE) / count(*), {round_digits}) AS avg_logprob
FROM j GROUP BY {id_col}
"""
