"""ext/linkage.py: blocked fuzzy best-match (shared by the registered
fuzzy_match_parts query and the scale probe's banded variant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spk_sl_validation_spark.ext.linkage import (
    block_firstchar_lasttoken,
    block_firstchar_lasttoken_lenband,
    fuzzy_best_match,
)
from spk_sl_validation_spark.sources.readers import load_table


def test_banded_blocking_returns_valid_subset(spark, sf_dir):
    """The length-banded key is the scale dial: every match it returns
    is a valid fuzzy match, its matched keys are a subset of the
    unbanded key's (banding only removes candidates), and the returned
    best distance can only be >= the unbanded best."""
    part = load_table(spark, sf_dir, "part")
    base = {
        r["p_partkey"]: r
        for r in fuzzy_best_match(
            part, "p_partkey", "p_name", block_firstchar_lasttoken("p_name"), 4
        ).collect()
    }
    banded = {
        r["p_partkey"]: r
        for r in fuzzy_best_match(
            part, "p_partkey", "p_name", block_firstchar_lasttoken_lenband("p_name"), 4
        ).collect()
    }
    assert set(banded) <= set(base)
    for k, r in banded.items():
        assert r["dist"] <= 4
        assert r["dist"] >= base[k]["dist"]


def test_banded_key_has_higher_cardinality(spark, sf_dir):
    # The real catalog's name lengths span only 7–12 chars, so at
    # band=4 the banded key may not split anything there (>=, not >);
    # the strict split is pinned on names with genuinely varied length.
    part = load_table(spark, sf_dir, "part")
    n_base = part.select(block_firstchar_lasttoken("p_name")).distinct().count()
    n_banded = part.select(block_firstchar_lasttoken_lenband("p_name")).distinct().count()
    assert n_banded >= n_base
    df = spark.createDataFrame(
        [(i, "alpha " + "x" * (3 + 5 * (i % 4)) + " widget") for i in range(20)],
        "k long, name string",
    )
    assert (
        df.select(block_firstchar_lasttoken_lenband("name")).distinct().count()
        > df.select(block_firstchar_lasttoken("name")).distinct().count()
    )


def test_collapsed_equals_record_level(spark, sf_dir):
    """fuzzy_best_match_collapsed must return EXACTLY the record-level
    result on the real catalog (the equivalence that justifies running
    the O(distinct²) path at scale)."""
    from spk_sl_validation_spark.ext.linkage import fuzzy_best_match_collapsed

    part = load_table(spark, sf_dir, "part")
    blk = block_firstchar_lasttoken("p_name")
    base = sorted(
        map(tuple, fuzzy_best_match(part, "p_partkey", "p_name", blk, 4).collect())
    )
    fast = sorted(
        map(
            tuple,
            fuzzy_best_match_collapsed(part, "p_partkey", "p_name", blk, 4).collect(),
        )
    )
    assert fast == base


def test_collapsed_equals_record_level_edge_cases(spark):
    """Singleton groups, min-key member of a dup group, cross-name
    ties at equal distance (lower min-key group must win)."""
    from spk_sl_validation_spark.ext.linkage import fuzzy_best_match_collapsed

    rows = [
        (5, "aaaa x"),   # dup group {5, 9}: 5 is min -> match 9
        (9, "aaaa x"),
        (2, "aaab x"),   # singleton, dist 1 to both "aaaa x"(k1=5) and "aaac x"(k1=1)
        (1, "aaac x"),   # tie: k1=1 < 5 -> 2 matches 1
        (7, "zzzz y"),   # singleton, no mate within distance
    ]
    df = spark.createDataFrame(rows, "k long, name string")
    blk = block_firstchar_lasttoken("name")
    base = sorted(map(tuple, fuzzy_best_match(df, "k", "name", blk, 2).collect()))
    fast = sorted(
        map(tuple, fuzzy_best_match_collapsed(df, "k", "name", blk, 2).collect())
    )
    assert fast == base
    got = {r[0]: (r[2], r[4]) for r in fast}
    assert got[5] == (9, 0) and got[9] == (5, 0)
    assert got[2] == (1, 1)
    assert 7 not in got


def test_best_match_is_symmetric_on_exact_dups(spark):
    df = spark.createDataFrame(
        [(1, "alpha widget"), (2, "alpha widget"), (3, "omega gizmo")],
        "k long, name string",
    )
    got = {
        r["k"]: (r["match_key"], r["dist"])
        for r in fuzzy_best_match(
            df, "k", "name", block_firstchar_lasttoken("name"), 2
        ).collect()
    }
    assert got[1] == (2, 0) and got[2] == (1, 0)
    assert 3 not in got  # no block mate within distance


def test_collapsed_handles_duplicate_key_name_rows(spark):
    """Duplicate (key, name) ROWS must not fake a same-name mate:
    same_name derives from __k2 (min SECOND DISTINCT key, NULL when the
    group holds one key however many rows), so a key whose name group
    contains only copies of itself still gets its cross-name best
    match (round-4 ADVICE item 1)."""
    from spk_sl_validation_spark.ext.linkage import fuzzy_best_match_collapsed

    rows = [
        (1, "aaaa x"),  # key 1 appears twice with the same name
        (1, "aaaa x"),
        (2, "aaab x"),  # its real best match, dist 1
    ]
    df = spark.createDataFrame(rows, "k long, name string")
    blk = block_firstchar_lasttoken("name")
    base = sorted(
        set(map(tuple, fuzzy_best_match(df, "k", "name", blk, 2).collect()))
    )
    fast = sorted(
        set(map(tuple, fuzzy_best_match_collapsed(df, "k", "name", blk, 2).collect()))
    )
    assert fast == base
    got = {r[0]: (r[2], r[4]) for r in fast}
    assert got[1] == (2, 1)
    assert got[2] == (1, 1)
