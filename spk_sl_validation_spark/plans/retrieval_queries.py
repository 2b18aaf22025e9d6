r"""Sparse retrieval over the document corpus: BM25 ranking of a
fixed query set. The retrieval primitive a training-data pipeline
needs for eval-set curation and targeted decontamination (find the
corpus documents most relevant to a benchmark question before
n-gram matching), complementing the dense paths in
``ext/similarity.py``.

Spark-first shape: tokenize → filter to query terms *before* the
tf shuffle (the selective predicate prunes the exploded stream at
scan time), document frequencies and the query list ride broadcast
joins, document length is carried through the tf aggregation so no
second join against the corpus is needed. At 100 TB the only wide
exchange is the (doc, term) tf aggregation over the pruned token
stream — the standard inverted-index build shape.

Float discipline (house pattern, see quality_queries.py): per-term
BM25 partials are rounded to 12 decimals and accumulated as
DECIMAL(28,12), so the cross-engine sum is order-independent; the
final score is rounded to 6. ln() may differ by 1 ULP between
JVM and DuckDB libm — the 12-decimal rounding absorbs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.hashing import ws_tokens
from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table

_TOKS = r"string_split_regex(trim(text), '\s+')"

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 5

#: Fixed query set (terms are unique within each query, so tf over
#: query terms needs no query-side weighting).
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "spark table join"),
    (2, "fast scan filter"),
    (3, "stream window agg group"),
)

_QUERY_VALUES = ", ".join(f"({qid}, '{text}')" for qid, text in BM25_QUERIES)


@register(
    "bm25_retrieval",
    doc=(
        f"BM25 top-{BM25_TOP_K} documents per query (k1={BM25_K1}, b={BM25_B}): "
        "term-pruned tf shuffle + broadcast df/query joins — the eval-curation retrieval primitive"
    ),
    oracle=f"""
WITH q(query_id, qtext) AS (VALUES {_QUERY_VALUES}),
qterm AS (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q),
tok AS (
  SELECT doc_id, len({_TOKS}) AS dl, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM tok WHERE term IN (SELECT DISTINCT term FROM qterm)
  GROUP BY doc_id, dl, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len({_TOKS})) AS DOUBLE) / count(*) AS avgdl
  FROM documents
),
scored AS (
  SELECT qterm.query_id, tf.doc_id,
         CAST(round(
           ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
           * (CAST(tf.tf AS DOUBLE) * ({BM25_K1} + 1.0))
           / (CAST(tf.tf AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * CAST(tf.dl AS DOUBLE) / stats.avgdl)),
         12) AS DECIMAL(28,12)) AS s
  FROM tf JOIN qterm USING (term) JOIN df USING (term) CROSS JOIN stats
),
total AS (SELECT query_id, doc_id, sum(s) AS sc FROM scored GROUP BY query_id, doc_id),
ranked AS (
  SELECT query_id, doc_id, sc,
         row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, doc_id ASC) AS rnk
  FROM total
)
SELECT query_id, doc_id,
       round(CAST(sc AS DOUBLE), 6) AS score,
       CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {BM25_TOP_K}
""",
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 with the standard +1-smoothed idf:

        idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Document length is grouped through the tf aggregation (it is
    functionally dependent on doc_id), so the corpus is scanned
    once for tokens and once for the 1-row (N, avgdl) aggregate —
    no join back to `documents`.
    """
    docs = load_table(spark, sf_dir, "documents")
    qterm = spark.createDataFrame(
        [(qid, term) for qid, text in BM25_QUERIES for term in text.split(" ")],
        "query_id int, term string",
    )
    query_terms = sorted({t for _, text in BM25_QUERIES for t in text.split(" ")})

    toks = ws_tokens("text")
    tok = docs.select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(query_terms))
    tf = tok.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
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
        * (tf_d * (BM25_K1 + 1.0))
        / (tf_d + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(qterm), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round(partial, 12).cast("decimal(28,12)").alias("s"),
        )
    )
    total = scored.groupBy("query_id", "doc_id").agg(F.sum("s").alias("sc"))
    w = Window.partitionBy("query_id").orderBy(F.col("sc").desc(), F.col("doc_id").asc())
    return (
        total.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= BM25_TOP_K)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("sc").cast("double"), 6).alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
