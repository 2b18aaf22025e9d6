"""Property tests for the round-3 curation/layout additions beyond the
registry-wide oracle check: the z-order layout must actually bound both
dimensions per file (the pruning property the footer stats exist for),
and priority sampling must produce a valid, deterministic sample with a
well-formed estimator."""

from __future__ import annotations


def test_zorder_files_bound_both_dims(spark, sf_dir):
    from spk_sl_validation_spark.plans.scale_queries import layout_zorder_stats

    rows = layout_zorder_stats(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 16
    # Top 4 z-bits fix the top 2 bits of EACH 16-bit dimension, so every
    # file's span in x and in y is under 2^14 — a predicate on either
    # key prunes ~3/4 of files. (A single-column sort would bound only
    # one dimension; this is the point of the interleave.)
    for r in rows:
        assert r.max_x - r.min_x < 1 << 14, r
        assert r.max_y - r.min_y < 1 << 14, r


def test_priority_sample_shape_and_determinism(spark, sf_dir):
    from spk_sl_validation_spark.plans.sampling_queries import (
        PRIORITY_K,
        sample_priority_weighted,
    )

    a = sample_priority_weighted(spark, sf_dir).collect()
    b = sample_priority_weighted(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # pure row function
    assert len(a) == PRIORITY_K
    assert len({r.doc_id for r in a}) == PRIORITY_K  # without replacement
    tau = min(r.priority for r in a)
    for r in a:
        # estimator max(w, tau) with tau below every sampled priority
        assert r.est_w >= r.w
        assert r.priority >= tau


def test_gopher_filters_match_plain_python(spark, sf_dir):
    from spk_sl_validation_spark.plans.text_queries import GOPHER_STOPS, text_gopher_filters
    from spk_sl_validation_spark.sources.readers import load_table

    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").limit(20).collect()}
    got = {
        r.doc_id: r
        for r in text_gopher_filters(spark, sf_dir).filter(
            "doc_id IN (%s)" % ",".join(map(str, docs))
        ).collect()
    }
    for doc_id, text in docs.items():
        words = text.strip().split()
        r = got[doc_id]
        assert r.n_words == len(words)
        assert abs(r.mean_word_len - sum(map(len, words)) / len(words)) < 1e-12
        assert r.gopher_stop_hits == len(set(words) & set(GOPHER_STOPS))
        expected_pass = (
            50 <= len(words) <= 100000
            and 3.0 <= sum(map(len, words)) / len(words) <= 10.0
            and r.alpha_word_frac >= 0.8
            and r.gopher_stop_hits >= 1
        )
        assert r.passes == expected_pass


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_query_plan_shapes(spark, sf_dir):
    """100 TB posture for the round-3 additions: no sort-merge joins,
    bounded exchange counts, and the z-order/gopher shapes stay pure
    scan → (explode) → partial-agg → one keyed exchange."""
    from spk_sl_validation_spark.plans.sampling_queries import sample_priority_weighted
    from spk_sl_validation_spark.plans.scale_queries import layout_zorder_stats
    from spk_sl_validation_spark.plans.text_queries import text_gopher_filters

    z = _plan(layout_zorder_stats(spark, sf_dir))
    assert "SortMergeJoin" not in z
    assert z.count("Exchange hashpartitioning") <= 1  # the 16-group agg

    g = _plan(text_gopher_filters(spark, sf_dir))
    assert "SortMergeJoin" not in g and "Join" not in g
    # count_distinct adds an Expand + second agg level, still ≤2 keyed
    # exchanges of per-doc partials — never a shuffle of raw text
    assert g.count("Exchange hashpartitioning") <= 2

    p = _plan(sample_priority_weighted(spark, sf_dir))
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p  # per-partition top-k, no global sort
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p  # 1-row tau


# ---------------------------------------------------------------------------
# Priority sampling vs a pure-python reference on arbitrary inputs
# ---------------------------------------------------------------------------

def _py_priority_sample(rows, k):
    """Independent python reference of the Duffield-Lund-Thorup scheme
    with the engine's md5-derived u (hashlib, not Spark)."""
    import hashlib

    denom = 1 << 30
    pri = []
    for rid, w in rows:
        h = int(hashlib.md5(str(rid).encode()).hexdigest()[:15], 16)
        pri.append((rid, w, float(w * denom) / float(h % denom + 1)))
    pri.sort(key=lambda t: (-t[2], t[0]))
    tau = pri[k][2] if len(pri) > k else float("-inf")
    return {(rid, w, p, max(float(w), tau)) for rid, w, p in pri[:k]}


def test_priority_sample_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from spk_sl_validation_spark.plans.sampling_queries import priority_sample

    @settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 10**9), st.integers(1, 10**6)),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[0],
        ),
        k=st.integers(1, 8),  # includes n <= k: all rows sampled, tau = -inf
    )
    def check(rows, k):
        df = spark.createDataFrame(rows, "rid long, w long")
        got = {
            (r.rid, r.w, r.priority, r.est_w)
            for r in priority_sample(df, "rid", "w", k).collect()
        }
        assert got == _py_priority_sample(rows, k)

    check()
