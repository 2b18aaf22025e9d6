"""Named-query registry — the driver-contract surface.

Every operator from SURVEY.md §2 (plus the north-star extensions)
registers here as a ``QuerySpec``: a Spark builder ``(spark, sf_dir)
→ DataFrame`` and, where SQL-expressible, an equivalent ANSI-SQL
oracle string that DuckDB runs on the same parquet tables.

Determinism contract (the driver hash-compares values):
- Floating aggregates are summed as exact ``DECIMAL(18,2)`` and cast
  to ``DOUBLE`` at the end — Spark and DuckDB then produce
  bit-identical doubles regardless of accumulation order.
- Every window/top-k uses a total order (unique tiebreak columns).
- Every computed column is aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, headline: bool = False, doc: str = ""
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, headline=headline, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def headline_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return {name: spec for name, spec in REGISTRY.items() if spec.headline}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from spk_sl_validation_spark.plans import relational_queries  # noqa: F401

    try:
        from spk_sl_validation_spark.plans import text_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import dedup_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import similarity_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import multimodal_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import scale_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import event_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import function_surface_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import agg_surface_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import sql_api_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import corpus_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import validation_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import sampling_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import pipeline_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import streaming_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import privacy_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import event_analytics_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import timeseries_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import quality_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import sketch_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from spk_sl_validation_spark.plans import assembly_queries  # noqa: F401
    except ImportError:
        pass
    from spk_sl_validation_spark.plans import modern_sql_queries, sql_tpch_suite  # noqa: F401

    _LOADED = True
