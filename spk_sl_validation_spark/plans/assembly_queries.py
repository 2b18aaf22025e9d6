"""Dataset-assembly queries: sequence packing, mixture sampling,
unigram LM scoring (ext/assembly.py). The last-mile training-data
operators after cleaning/dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spk_sl_validation_spark.ext import assembly as A
from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table

SEQ_LEN = 2048

# Target mixture: upsample-ish weights by source band (sources are
# src0..src19 in the testdata; unknown sources drop to 0).
MIX_WEIGHTS = {
    **{f"src{i}": 1.0 for i in range(5)},
    **{f"src{i}": 0.5 for i in range(5, 10)},
    **{f"src{i}": 0.25 for i in range(10, 15)},
    **{f"src{i}": 0.1 for i in range(15, 20)},
}


@register(
    "pack_sequences",
    doc=(
        f"concat-and-chunk sequence packing into {SEQ_LEN}-token training rows: "
        "two-phase distributed prefix sum (within-chunk window + broadcast chunk "
        "offsets) == the oracle's naive global window, with no single-task scan"
    ),
    oracle=A.pack_sequences_sql("documents", seq_len=SEQ_LEN),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return A.pack_sequences(docs, seq_len=SEQ_LEN)


@register(
    "mixture_sample",
    doc=(
        "deterministic per-source mixture sampling (hash-threshold narrow map — "
        "reproducible across partition layouts, unlike df.sample); weights "
        "1.0/0.5/0.25/0.1 by source band"
    ),
    oracle=A.mixture_sample_sql(
        "documents", MIX_WEIGHTS, select="doc_id, source, n_chars"
    ),
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return A.mixture_sample(docs, MIX_WEIGHTS).select("doc_id", "source", "n_chars")


@register(
    "text_unigram_logprob",
    doc=(
        "mean token log-prob under the corpus's own unigram LM (CCNet-style "
        "perplexity-proxy quality score): one explode, vocab-bounded frequency "
        "broadcast, position-ordered fold"
    ),
    oracle=A.unigram_logprob_sql("documents"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return A.unigram_logprob(docs)
