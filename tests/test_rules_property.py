"""Property-based tests for the rule-cascade compiler (SURVEY.md §5.2.3):
for random rule lists, the compiled single Column expression must equal
a direct Python simulation of sequential masked assignment, and the
flat SQL closed form must agree with the fold.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spk_sl_validation_spark.operators.rules import Guard, Rule, compile_to_column, compile_to_sql

N_ROWS = 64

rule_strategy = st.lists(
    st.tuples(
        st.integers(min_value=2, max_value=7),  # modulus
        st.integers(min_value=0, max_value=6),  # remainder
        st.sampled_from([Guard.IF_NULL, Guard.ALWAYS, Guard.SENTINEL]),
        st.integers(min_value=0, max_value=7),  # sentinel: index of message to match
    ),
    min_size=1,
    max_size=8,
)


def _python_model(
    rules: list[tuple[int, int, Guard, int]],
    initial: list[str | None] | None = None,
) -> list[str | None]:
    """Sequential masked assignment, the reference's semantics."""
    comment: list[str | None] = list(initial) if initial is not None else [None] * N_ROWS
    for i, (mod, rem, guard, sent) in enumerate(rules):
        for x in range(N_ROWS):
            if x % mod == rem % mod:
                if guard is Guard.IF_NULL and comment[x] is not None:
                    continue
                if guard is Guard.SENTINEL and comment[x] != f"m{sent}":
                    continue
                comment[x] = f"m{i}"
    return comment


def _build_rules(spec: list[tuple[int, int, Guard, int]]) -> list[Rule]:
    return [
        Rule(
            rule_id=f"r{i}",
            condition=F.col("x") % mod == rem % mod,
            condition_sql=f"(x % {mod}) = {rem % mod}",
            message=f"m{i}",
            guard=guard,
            sentinel=f"m{sent}",
        )
        for i, (mod, rem, guard, sent) in enumerate(spec)
    ]


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(spec=rule_strategy)
def test_cascade_fold_matches_sequential_model(spark, spec):
    df = spark.range(N_ROWS).withColumnRenamed("id", "x")
    out = df.withColumn("c", compile_to_column(_build_rules(spec))).orderBy("x").collect()
    expected = _python_model(spec)
    assert [r.c for r in out] == expected


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(spec=rule_strategy)
def test_flat_sql_closed_form_matches_fold(spark, spec):
    import duckdb

    sql_expr = compile_to_sql(_build_rules(spec))
    rows = duckdb.sql(
        f"SELECT {sql_expr} AS c FROM (SELECT unnest(range({N_ROWS})) AS x) ORDER BY x"
    ).fetchall()
    assert [r[0] for r in rows] == _python_model(spec)


def test_fallback_fires_iff_nothing_matched(spark):
    rules = [
        Rule("r0", F.col("x") < 10, "low", Guard.IF_NULL),
        Rule("fallback", F.lit(True), "rest", Guard.IF_NULL),
    ]
    out = spark.range(20).withColumnRenamed("id", "x").withColumn(
        "c", compile_to_column(rules)
    ).collect()
    for r in out:
        assert r.c == ("low" if r.x < 10 else "rest")


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(spec=rule_strategy)
def test_flat_sql_with_initial_matches_fold(spark, spec):
    """Seeded cascades (initial running value from a column, incl. rows
    equal to a sentinel) — the full-pipeline shape: cascade B/C/A4-A7
    continue from the Comment planted by cascade A."""
    import duckdb

    initial = [
        None if x % 3 == 0 else (f"m{x % 4}" if x % 3 == 1 else "seeded") for x in range(N_ROWS)
    ]
    rules = _build_rules(spec)
    sql_expr = compile_to_sql(rules, initial_sql="init")
    init_sql_vals = ", ".join("NULL" if v is None else f"'{v}'" for v in initial)
    rows = duckdb.sql(
        f"SELECT {sql_expr} AS c FROM (SELECT unnest(range({N_ROWS})) AS x, "
        f"unnest([{init_sql_vals}]) AS init) ORDER BY x"
    ).fetchall()
    expected = _python_model(spec, initial=initial)
    assert [r[0] for r in rows] == expected

    df = spark.createDataFrame(
        [(x, initial[x]) for x in range(N_ROWS)], "x: long, init: string"
    )
    out = df.withColumn("c", compile_to_column(rules, initial=F.col("init"))).orderBy("x").collect()
    assert [r.c for r in out] == expected


def test_sentinel_sql_compiles_and_matches():
    """The Apex-cascade shape: rules guarded on a planted sentinel, in
    order, first match wins, fallback B8-style TRUE rule."""
    import duckdb

    sent = "route-me"
    rules = [
        Rule("plant", F.col("x") % 2 == 0, sent, Guard.IF_NULL, condition_sql="(x % 2) = 0"),
        Rule("s1", F.col("x") % 3 == 0, "m1", Guard.SENTINEL, sentinel=sent, condition_sql="(x % 3) = 0"),
        Rule("s2", F.lit(True), "m2", Guard.SENTINEL, sentinel=sent, condition_sql="TRUE"),
    ]
    sql_expr = compile_to_sql(rules)
    rows = duckdb.sql(
        f"SELECT x, {sql_expr} AS c FROM (SELECT unnest(range(12)) AS x) ORDER BY x"
    ).fetchall()
    for x, c in rows:
        if x % 2 == 0:
            assert c == ("m1" if x % 3 == 0 else "m2")
        else:
            assert c is None
