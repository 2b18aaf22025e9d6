"""Round-11 structural tripwire for the 64 KB-codegen failure class.

Round 10 found three interpreted-HOF walls BY HAND: janino "Code
grows beyond 64 KB" compile failures that Spark's default
``spark.sql.codegen.fallback=true`` absorbs silently by running the
stage interpreted — hash-identical results at 4-10x the wall, visible
only as unexplained bench drift. Detection is now automatic:

1. the selfcheck sweep (tools/check_contract.py) runs with
   ``spark.sql.codegen.fallback=false`` so a compile failure in any
   registered query raises instead of degrading — these tests pin
   that the conf really separates the two behaviors on a known
   janino-blowing plan (a 2000-ary ``hash()`` generates one
   over-64KB method that Spark's expression splitter cannot split);
2. the ``evaluate_once`` generator barriers that fixed the r10 walls
   must stay present in the winnowing / corpus-pipeline plans —
   CollapseProject must not re-fuse across them (without the barrier
   the winnowing hash array re-evaluates per window reference:
   measured 12.7x at sf0.01).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _janino_blowing_df(spark):
    return (
        spark.range(100)
        .select(
            F.hash(*[F.col("id") + F.lit(i) for i in range(2000)]).alias("h")
        )
        .groupBy()
        .sum("h")
    )


def _with_fallback(spark, value: str):
    class _Ctx:
        def __enter__(self):
            self.prev = spark.conf.get("spark.sql.codegen.fallback")
            spark.conf.set("spark.sql.codegen.fallback", value)

        def __exit__(self, *exc):
            spark.conf.set("spark.sql.codegen.fallback", self.prev)

    return _Ctx()


def test_fallback_false_raises_on_janino_compile_failure(spark):
    with _with_fallback(spark, "false"):
        with pytest.raises(Exception, match="(?i)compile|janino|64 ?KB|grows"):
            _janino_blowing_df(spark).collect()


def test_fallback_true_silently_runs_interpreted(spark):
    """The default absorbs the same failure — which is exactly why the
    sweep must not rely on it: a wall, not an error."""
    with _with_fallback(spark, "true"):
        rows = _janino_blowing_df(spark).collect()
    assert len(rows) == 1


@pytest.mark.parametrize(
    "name, min_generates",
    [
        # text_winnowing_fingerprints: evaluate_once barrier on the
        # per-doc hash array + the posexplode of selected fingerprints
        ("text_winnowing_fingerprints", 2),
        # web_corpus_pipeline: three evaluate_once barriers
        # (main_text, clean_text x2) along the narrow chain
        ("web_corpus_pipeline", 3),
    ],
)
def test_evaluate_once_barriers_survive_optimization(spark, sf_dir, name, min_generates):
    from spk_sl_validation_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY[name].builder(spark, sf_dir)
    qe = df._jdf.queryExecution()
    formatted = spark._jvm.PythonSQLUtils.explainString(qe, "formatted")
    n_generate = len(re.findall(r"\(\d+\) Generate\b", formatted))
    assert n_generate >= min_generates, (
        f"{name}: {n_generate} Generate nodes in the optimized plan "
        f"(expected >= {min_generates}) — an evaluate_once barrier was "
        "collapsed; the interpreted-HOF expression now re-evaluates per "
        "downstream reference (r10 measured 12.7x on winnowing)"
    )
