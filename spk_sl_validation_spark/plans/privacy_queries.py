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
