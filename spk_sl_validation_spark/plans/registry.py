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

# Every module that registers queries. All dependencies (pyspark, pandas,
# numpy, duckdb) are hard requirements of the package — an ImportError in
# any of these is a bug that must surface, never a reason to silently
# shrink the driver-contract surface (a swallowed ImportError here would
# make the driver report *nothing* for the lost queries instead of red).
# Registration order drives the driver's correctness sample (it checks
# a prefix of the registry). Round 1 verified the relational/text/dedup/
# similarity/multimodal/scale/event block green; those now register
# LAST so the rounds rotate verification onto the previously unsampled
# queries (pipelines, TPC-H, sketches, streaming, ... first).
QUERY_MODULES = (
    "pipeline_queries",
    "sql_tpch_suite",
    "sketch_queries",
    "streaming_queries",
    "function_surface_queries",
    "agg_surface_queries",
    "validation_queries",
    "modern_sql_queries",
    "assembly_queries",
    "event_analytics_queries",
    "timeseries_queries",
    "quality_queries",
    "corpus_queries",
    "sql_api_queries",
    "sampling_queries",
    "privacy_queries",
    "relational_queries",
    "text_queries",
    "dedup_queries",
    "similarity_queries",
    "multimodal_queries",
    "scale_queries",
    "event_queries",
)


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import importlib

    for mod in QUERY_MODULES:
        try:
            importlib.import_module(f"spk_sl_validation_spark.plans.{mod}")
        except BaseException as exc:
            raise ImportError(
                f"query module 'plans.{mod}' failed to import — its registered "
                f"queries would silently vanish from the driver contract: {exc!r}"
            ) from exc

    _LOADED = True
