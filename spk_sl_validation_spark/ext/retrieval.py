r"""Sparse (lexical) retrieval primitives: Okapi BM25 ranking.

The retrieval shape a training-data pipeline needs for eval-set
curation and targeted decontamination: given a handful of queries,
rank the corpus by BM25 and keep the top-k per query. Design:

- the exploded token stream is filtered to the query-term set BEFORE
  the tf shuffle — the wide exchange carries only (doc, query-term)
  rows, the inverted-index-build shape, never the full token stream;
- document frequencies, the query set, and the 1-row (N, avgdl)
  corpus stats all ride broadcast joins;
- document length is grouped through the tf aggregation (it is
  functionally dependent on the doc id), so the corpus is never
  joined back.

Float discipline (house pattern): per-term partials are rounded to
12 decimals and accumulated as DECIMAL(28,12), making the
cross-engine/cross-plan sum order-independent; the final score is
rounded to 6.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.hashing import ws_tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_rank(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = 5,
) -> DataFrame:
    """Top-``top_k`` documents per query under Okapi BM25 with the
    standard +1-smoothed idf:

        idf(t)     = ln(1 + (N − df + 0.5) / (df + 0.5))
        score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    ``queries`` is a small in-memory list of (query_id, whitespace
    query text); terms should be unique within a query. Returns
    (query_id, doc_id, score, rnk) with a deterministic
    (score DESC, id ASC) tiebreak.
    """
    spark = docs.sparkSession
    qterm = spark.createDataFrame(
        [(qid, term) for qid, text in queries for term in text.split(" ")],
        "query_id int, term string",
    )
    query_terms = sorted({t for _, text in queries for t in text.split(" ")})

    toks = ws_tokens(text_col)
    tok = docs.select(
        F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(query_terms))
    tf = tok.groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size(toks)).cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    idf = F.log(
        1.0
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    tf_d = F.col("tf").cast("double")
    partial = (
        idf
        * (tf_d * (k1 + 1.0))
        / (tf_d + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(qterm), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            id_col,
            F.round(partial, 12).cast("decimal(28,12)").alias("s"),
        )
    )
    total = scored.groupBy("query_id", id_col).agg(F.sum("s").alias("sc"))
    w = Window.partitionBy("query_id").orderBy(F.col("sc").desc(), F.col(id_col).asc())
    return (
        total.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(
            "query_id",
            id_col,
            F.round(F.col("sc").cast("double"), 6).alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
