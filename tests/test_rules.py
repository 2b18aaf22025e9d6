"""Cascade-compiler tests (SURVEY.md §5.2.3 property set).

Properties: (a) sequential masked-assign equivalence against a pandas
micro-implementation on random frames; (b) guarded rules are
first-match-wins; (c) ALWAYS rules overwrite; (d) fallback fires iff
nothing else fired; (e) Column and SQL compilations agree.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from spk_sl_validation_spark.functions.scalar import neq
from spk_sl_validation_spark.operators.rules import (
    Guard,
    Rule,
    apply_cascade,
    compile_to_column,
    compile_to_sql,
)


def _pandas_cascade(pdf: pd.DataFrame, rules_py) -> pd.Series:
    """Micro-implementation: sequential masked assignment like the reference."""
    comment = pd.Series([None] * len(pdf), dtype=object)
    for guard, cond_fn, msg in rules_py:
        cond = cond_fn(pdf)
        if guard == "if_null":
            mask = cond & comment.isna()
        else:
            mask = cond
        comment[mask.fillna(False)] = msg
    return comment


def _rules():
    # built lazily: classic PySpark Column exprs need an active session
    return [
        Rule("r1", F.col("v") > 80, "high", Guard.IF_NULL, condition_sql="v > 80"),
        Rule("r2", F.col("flag") == "X", "flagged", Guard.ALWAYS, condition_sql="flag = 'X'"),
        Rule("r3", neq(F.col("code"), "5S"), "not-5S", Guard.IF_NULL,
             condition_sql="code IS DISTINCT FROM '5S'"),
        Rule("r4", F.col("v").isNotNull(), "fallback", Guard.IF_NULL,
             condition_sql="v IS NOT NULL"),
    ]

RULES_PY = [
    ("if_null", lambda p: p.v > 80, "high"),
    ("always", lambda p: p.flag == "X", "flagged"),
    # pandas semantics of != on NaN: True (SURVEY.md §4.4.1)
    ("if_null", lambda p: p.code != "5S", "not-5S"),
    ("if_null", lambda p: p.v.notna(), "fallback"),
]


def _frame():
    import itertools
    rows = []
    vals = [None, 10.0, 81.0, 95.0]
    flags = [None, "X", "Y"]
    codes = [None, "5S", "20"]
    for i, (v, fl, co) in enumerate(itertools.product(vals, flags, codes)):
        rows.append({"id": i, "v": v, "flag": fl, "code": co})
    return pd.DataFrame(rows)


def test_column_cascade_matches_pandas_micro_impl(spark):
    pdf = _frame()
    df = spark.createDataFrame(pdf)
    got = (
        df.withColumn("Comment", compile_to_column(_rules()))
        .select("id", "Comment")
        .toPandas()
        .set_index("id")["Comment"]
        .sort_index()
    )
    want = _pandas_cascade(pdf, RULES_PY)
    want.index = pdf["id"]
    for i in pdf["id"]:
        g, w = got.loc[i], want.loc[i]
        assert (pd.isna(g) and pd.isna(w)) or g == w, f"id={i}: spark={g!r} pandas={w!r}"


def test_sql_compilation_matches_column_compilation(spark):
    pdf = _frame()
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("t_rules")
    sql_expr = compile_to_sql(_rules())
    via_sql = (
        spark.sql(f"SELECT id, {sql_expr} AS Comment FROM t_rules")
        .toPandas().set_index("id")["Comment"].sort_index()
    )
    via_col = (
        df.withColumn("Comment", compile_to_column(_rules()))
        .select("id", "Comment").toPandas().set_index("id")["Comment"].sort_index()
    )
    assert list(via_sql.fillna("∅")) == list(via_col.fillna("∅"))


def test_sql_compilation_runs_in_duckdb(spark):
    import duckdb

    pdf = _frame()
    sql_expr = compile_to_sql(_rules())
    duck = duckdb.sql(f"SELECT id, {sql_expr} AS Comment FROM pdf ORDER BY id").df()
    df = spark.createDataFrame(pdf)
    via_col = (
        df.withColumn("Comment", compile_to_column(_rules()))
        .select("id", "Comment").toPandas().sort_values("id").reset_index(drop=True)
    )
    assert list(duck["Comment"].fillna("∅")) == list(via_col["Comment"].fillna("∅"))


def test_always_overwrites_and_guarded_respects_first_match(spark):
    pdf = pd.DataFrame([{"id": 0, "v": 95.0, "flag": "X", "code": "20"}])
    df = spark.createDataFrame(pdf)
    out = df.withColumn("Comment", compile_to_column(_rules())).collect()[0]["Comment"]
    # r1 fires first (high), then ALWAYS r2 overwrites
    assert out == "flagged"


def test_sentinel_guard(spark):
    pdf = pd.DataFrame(
        [
            {"id": 0, "Comment": "route-me", "x": 1},
            {"id": 1, "Comment": "other", "x": 1},
            {"id": 2, "Comment": None, "x": 1},
        ]
    )
    df = spark.createDataFrame(pdf)
    rules = [
        Rule("s1", F.col("x") == 1, "routed", Guard.SENTINEL, sentinel="route-me"),
    ]
    out = apply_cascade(df, rules, target="Comment").orderBy("id").collect()
    assert [r["Comment"] for r in out] == ["routed", "other", None]


def test_extra_assignments(spark):
    pdf = pd.DataFrame(
        [
            {"id": 0, "Vendor": "1000123", "spk": "10"},
            {"id": 1, "Vendor": "9000341", "spk": "10"},
            {"id": 2, "Vendor": "2000999", "spk": "10"},
        ]
    )
    df = spark.createDataFrame(pdf)
    # A0a/A0b shape: set a non-comment column, optionally also a comment
    rules = [
        Rule("A0a", F.col("Vendor").startswith("1"), None, Guard.ALWAYS,
             extra_assignments={"spk": F.lit("20")}),
        Rule("A0b", F.col("Vendor") == "9000341", "swissco", Guard.ALWAYS,
             extra_assignments={"spk": F.lit("SW")}),
    ]
    out = apply_cascade(df, rules, target="Comment").orderBy("id").collect()
    assert [r["spk"] for r in out] == ["20", "SW", "10"]
    assert [r["Comment"] for r in out] == [None, "swissco", None]


def test_rules_from_config_matches_python_rules(spark):
    """A config-defined cascade must compile to the same results as the
    equivalent hand-built Rule list (guards, overwrite order, fallback)."""
    from pyspark.sql import functions as F

    from spk_sl_validation_spark.operators.rules import (
        Guard,
        Rule,
        compile_to_column,
        rules_from_config,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 500.0), (4, None)], ["id", "v"]
    )
    config = [
        {"id": "big", "when": "v > 100", "message": "big", "guard": "always"},
        {"id": "small", "when": "v < 10", "message": "small"},
        {"id": "fallback", "when": "TRUE", "message": "mid"},
    ]
    hand = [
        Rule("big", F.col("v") > 100, "big", Guard.ALWAYS, condition_sql="v > 100"),
        Rule("small", F.col("v") < 10, "small", condition_sql="v < 10"),
        Rule("fallback", F.lit(True), "mid", condition_sql="TRUE"),
    ]
    a = df.select("id", compile_to_column(rules_from_config(config)).alias("c")).collect()
    b = df.select("id", compile_to_column(hand).alias("c")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    got = {r.id: r.c for r in a}
    assert got == {1: "small", 2: "mid", 3: "big", 4: "mid"}


def test_compile_to_sql_size_guard():
    """ALWAYS-heavy cascades double the flat-SQL fold text per rule
    (worst case O(2^n)); the fold must refuse with a pointer to the
    Column path instead of emitting a megabyte CASE string."""
    import pytest

    cond = " AND ".join(f"colx_{j} > {j}" for j in range(8))
    rules = [
        Rule(f"r{i}", F.lit(True), f"msg {i}", Guard.ALWAYS, condition_sql=f"({cond} OR coly = {i})")
        for i in range(40)
    ]
    with pytest.raises(ValueError, match="compile_to_column"):
        compile_to_sql(rules)
