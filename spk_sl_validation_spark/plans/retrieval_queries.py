r"""Sparse retrieval over the document corpus: BM25 ranking of a
fixed query set (``ext/retrieval.py``). The retrieval primitive a
training-data pipeline needs for eval-set curation and targeted
decontamination (find the corpus documents most relevant to a
benchmark question before n-gram matching), complementing the dense
paths in ``ext/similarity.py``.

The oracle mirrors the engine's float discipline exactly: per-term
BM25 partials rounded to 12 decimals, accumulated as DECIMAL(28,12)
(order-independent sums), final score rounded to 6. ln() may differ
by 1 ULP between JVM and DuckDB libm — the 12-decimal rounding
absorbs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spk_sl_validation_spark.ext.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_index_tables,
    bm25_rank,
    bm25_rank_indexed,
)
from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table

_TOKS = r"string_split_regex(trim(text), '\s+')"

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
    docs = load_table(spark, sf_dir, "documents")
    return bm25_rank(docs, BM25_QUERIES, top_k=BM25_TOP_K)


import dataclasses as _dc  # noqa: E402

from spk_sl_validation_spark.plans.registry import REGISTRY as _REG  # noqa: E402

_BM25_ORACLE = _REG["bm25_retrieval"].oracle


@register(
    "bm25_retrieval_indexed",
    doc=(
        "BM25 through prebuilt index artifacts (postings + df + stats, "
        "no text scan at query time) — result-identical to bm25_retrieval, "
        "same oracle"
    ),
    oracle=None,
)
def bm25_retrieval_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time path when the inverted index already exists: build
    the artifacts (in production they are written bucketed by term
    and read back), then rank without touching document text. The
    oracle is bm25_retrieval's SQL verbatim — the index is an access
    path, not a semantic change."""
    docs = load_table(spark, sf_dir, "documents")
    postings, df_tbl, stats = bm25_index_tables(docs)
    return bm25_rank_indexed(BM25_QUERIES, postings, df_tbl, stats, top_k=BM25_TOP_K)


_REG["bm25_retrieval_indexed"] = _dc.replace(
    _REG["bm25_retrieval_indexed"], oracle=_BM25_ORACLE
)
