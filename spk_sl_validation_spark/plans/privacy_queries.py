"""Privacy / PII-handling queries (training-data pipeline north-star).

A 100 TB corpus pipeline needs deterministic, scan-shaped PII
treatment: masking (redact the sensitive characters) and pseudonymous
tokenization (a stable surrogate key that joins across tables without
exposing the raw value). Both are pure narrow projections — JVM-side
regexp/sha2 expressions inside whole-stage codegen, zero shuffles —
so they compose into any read path at no extra cost.

The reference has no PII handling; this extends its cleansing scope
(SURVEY.md §2.3 scalar-expression family) to the corpus setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table


@register(
    "pii_masking",
    doc=(
        "PII masking + pseudonymization: digit-redacted display name "
        "(regexp_replace, all occurrences) and a deterministic SHA-256 surrogate "
        "token that remains joinable across tables. Narrow projection — codegen, "
        "no shuffle"
    ),
    oracle="""
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]', '*', 'g') AS masked_name,
       sha256(c_name) AS name_token
FROM customer
""",
)
def pii_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]", "*").alias("masked_name"),
        F.sha2(F.col("c_name"), 256).alias("name_token"),
    )


K_THRESHOLD = 5
BAL_BAND = 2000  # acctbal band width used as the quasi-identifier


@register(
    "k_anonymity",
    doc=(
        f"k-anonymity / l-diversity risk report over quasi-identifiers "
        f"(nation, market segment, {BAL_BAND}-wide balance band): group size, "
        f"k>={K_THRESHOLD} flag, distinct-sensitive-value count. One hash-agg "
        "shuffle, codegen throughout"
    ),
    oracle=f"""
SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / {BAL_BAND}.0) AS BIGINT) AS bal_band,
       count(*) AS group_size,
       (count(*) >= {K_THRESHOLD}) AS k_anonymous,
       count(DISTINCT c_acctbal) AS l_distinct
FROM customer
GROUP BY c_nationkey, c_mktsegment, bal_band
""",
)
def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk profile of a released table.

    A corpus/feature pipeline that publishes per-user aggregates needs
    to know which quasi-identifier combinations isolate fewer than k
    individuals (k-anonymity) and how diverse the sensitive attribute
    is within each group (l-diversity) — groups failing either are the
    ones to suppress or generalize before release.

    Quasi-identifiers here: (c_nationkey, c_mktsegment, acctbal band);
    sensitive attribute: the exact account balance. The whole report is
    one hash aggregation — partial aggregation map-side, a single
    exchange on the QI key, no skew risk (QI-group count is bounded by
    the QI domain product, not row count).
    """
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(float(BAL_BAND))).alias("bal_band")
    return (
        c.groupBy("c_nationkey", "c_mktsegment", band)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("c_acctbal").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "group_size",
            (F.col("group_size") >= K_THRESHOLD).alias("k_anonymous"),
            "l_distinct",
        )
    )
