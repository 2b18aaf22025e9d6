"""Property test: fuzzy_best_match_collapsed ≡ fuzzy_best_match on
hypothesis-generated catalogs (random duplication structure, random
tie landscapes) — the equivalence that licenses running the
O(distinct-names²) path at scale, checked beyond hand-built cases."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spk_sl_validation_spark.ext.linkage import (
    block_firstchar_lasttoken,
    fuzzy_best_match,
    fuzzy_best_match_collapsed,
)

# Small alphabet + short words maximize collisions: many exact-name
# groups, many cross-name pairs within levenshtein reach, frequent
# (dist, key) ties.
_word = st.text(alphabet="abc", min_size=1, max_size=3)
_name = st.builds(lambda a, b: f"{a} {b}", _word, _word)

_catalog = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000), _name),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_catalog, max_dist=st.integers(min_value=0, max_value=3))
def test_collapsed_equivalence_property(spark, rows, max_dist):
    df = spark.createDataFrame(rows, "k long, name string")
    blk = block_firstchar_lasttoken("name")
    base = sorted(map(tuple, fuzzy_best_match(df, "k", "name", blk, max_dist).collect()))
    fast = sorted(
        map(tuple, fuzzy_best_match_collapsed(df, "k", "name", blk, max_dist).collect())
    )
    assert fast == base
