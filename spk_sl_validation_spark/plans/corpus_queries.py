r"""Corpus-level text/vector analytics: top terms, TF-IDF, embedding
centroids — the aggregate statistics a training-data pipeline reports
per corpus snapshot. All value-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.hashing import ws_tokens
from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table

_TOKS = r"string_split_regex(trim(text), '\s+')"


@register(
    "corpus_top_terms",
    doc="corpus word count → top-20 terms (the canonical distributed aggregation, deterministic tiebreak)",
    oracle=f"""
SELECT term, n FROM (
  SELECT term, count(*) AS n,
         row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rnk
  FROM (SELECT unnest({_TOKS}) AS term FROM documents)
  GROUP BY term
) WHERE rnk <= 20
""",
)
def corpus_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(ws_tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    return counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 20).select("term", "n")


@register(
    "text_tfidf",
    doc="TF-IDF: top-3 weighted terms per document (two aggregations + broadcast idf join)",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE) * (ln((CAST(n.n_docs AS DOUBLE) + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rnk FROM ranked WHERE rnk <= 3
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(ws_tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df").cast("double") + 1.0)) + 1.0
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id", "term", (F.col("tf").cast("double") * idf).alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", F.col("rnk").cast("int").alias("rnk"))
    )


CHUNK_SIZE = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "text_chunking",
    doc=f"document chunking for training windows: {CHUNK_SIZE}-token chunks, stride {CHUNK_STRIDE} (JVM array ops, 1→N)",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
chunks AS (
  SELECT doc_id,
         unnest(range(0, greatest((len(t) - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}, 0) + 1)) AS chunk_idx,
         t
  FROM tok
)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(t, chunk_idx * {CHUNK_STRIDE} + 1, chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' ') AS chunk_text,
       CAST(least({CHUNK_SIZE}, len(t) - chunk_idx * {CHUNK_STRIDE}) AS INTEGER) AS n_tokens
FROM chunks
""",
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document becomes ⌈(n_tokens - size)/stride⌉ + 1 overlapping
    chunks (always ≥1: short docs yield one short chunk). Pure JVM
    array expressions + posexplode — a narrow 1→N map, no Python, no
    shuffle; at 100 TB chunking is scan-speed."""
    docs = load_table(spark, sf_dir, "documents")
    toks = ws_tokens("text")
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - CHUNK_SIZE + CHUNK_STRIDE) / CHUNK_STRIDE).cast("int") - 1,
        F.lit(0),
    )
    with_chunks = docs.select(
        "doc_id", toks.alias("t"), F.posexplode(F.sequence(F.lit(0), n_chunks)).alias("pos", "chunk_idx")
    )
    start = F.col("chunk_idx") * CHUNK_STRIDE
    return with_chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(F.slice("t", start + 1, CHUNK_SIZE), " ").alias("chunk_text"),
        F.least(F.lit(CHUNK_SIZE), F.size("t") - start).cast("int").alias("n_tokens"),
    )


@register(
    "embedding_centroids",
    doc="per-label centroid vectors via posexplode + decimal-exact per-dimension mean",
    oracle="""
WITH flat AS (
  SELECT label, i AS dim, embedding[i] AS v
  FROM (SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)
)
SELECT label, CAST(dim AS INTEGER) AS dim,
       CAST(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS mean_v,
       COUNT(*) AS n
FROM flat
GROUP BY label, dim
""",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select("label", F.posexplode("embedding").alias("pos", "v")).select(
        "label", (F.col("pos") + 1).cast("int").alias("dim"), "v"
    )
    return flat.groupBy("label", "dim").agg(
        (F.sum(F.col("v").cast("double").cast("decimal(28,12)")).cast("double") / F.count(F.lit(1)))
        .cast("double")
        .alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
    )
