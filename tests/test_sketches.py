"""Approximate-sketch operators: accuracy-bounded, not oracle-hashed
(HLL implementations differ across engines by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spk_sl_validation_spark.sources.readers import load_table


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).collect()[0].n
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02).alias("n")).collect()[0].n
    assert abs(approx - exact) <= max(1, 0.05 * exact)


def test_approx_percentile_brackets_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.select(
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
        F.percentile(F.col("value").cast("double"), F.lit(0.5)).alias("exact"),
    ).collect()[0]
    lo, hi = (
        ev.selectExpr("min(value) AS lo", "max(value) AS hi").collect()[0].lo,
        ev.selectExpr("max(value) AS hi").collect()[0].hi,
    )
    spread = hi - lo
    assert abs(row.approx - row.exact) <= 0.05 * spread


# ---------------------------------------------------------------------------
# Deterministic md5-family sketches (ext/sketches.py) — these ARE
# oracle-hashed in the contract; here we assert the mathematical
# guarantees that must hold regardless of data.
# ---------------------------------------------------------------------------

def test_hll_estimate_within_theoretical_error(spark, sf_dir):
    from spk_sl_validation_spark.ext.sketches import hll_estimate

    ev = load_table(spark, sf_dir, "events")
    row = hll_estimate(ev, "user_id", p=6).collect()[0]
    # standard error for m=64 is 1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(row.rel_err) <= 3 * 1.04 / 8
    assert row.m == 64
    assert 0 < row.active_registers <= 64


def test_cms_never_underestimates(spark, sf_dir):
    from spk_sl_validation_spark.ext.sketches import cms_estimate_counts

    ev = load_table(spark, sf_dir, "events")
    out = cms_estimate_counts(ev, "user_id", depth=4, width=64).collect()
    assert len(out) > 0
    assert all(r.overestimate >= 0 for r in out)
    assert all(r.cms_est >= r.exact_n for r in out)


def test_bloom_no_false_negatives(spark, sf_dir):
    from spk_sl_validation_spark.ext.sketches import bloom_membership

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    out = bloom_membership(orders, "o_custkey", customer, "c_custkey", 2048, 5).collect()
    # every actual member must hit; false positives allowed but bounded
    assert all(r.bloom_hit for r in out if r.actual)
    n_probe_neg = sum(1 for r in out if not r.actual)
    n_fp = sum(1 for r in out if r.false_positive)
    if n_probe_neg:
        assert n_fp / n_probe_neg < 0.5  # loose sanity bound for tiny filter


def test_kmv_jaccard_within_bounds(spark, sf_dir):
    from spk_sl_validation_spark.ext.sketches import kmv_jaccard

    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O")
    b = orders.filter(F.col("o_orderstatus") == "F")
    row = kmv_jaccard(a, "o_custkey", b, "o_custkey", 128).first()
    assert 0.0 <= row.jaccard_est <= 1.0
    # k=128 ⇒ se ≈ sqrt(J(1-J)/k) ≲ 0.045; allow 4 sigma
    assert abs(row.jaccard_est - row.jaccard_exact) < 0.2
    assert row.union_ndv_est > 0
    assert abs(row.union_ndv_est / row.union_ndv_exact - 1) < 0.5


def test_bottomk_quantile_sample_mergeable(spark, sf_dir):
    """The sketch's merge law: bottom-k of (bottom-k(A) ∪ bottom-k(B))
    == bottom-k(A ∪ B) — partials from disjoint partitions combine
    into exactly the global sketch."""
    from spk_sl_validation_spark.ext.hashing import md5_long
    from spk_sl_validation_spark.ext.sketches import bottomk_sample_quantiles

    ev = load_table(spark, sf_dir, "events")
    k = 64
    h = md5_long(F.col("event_id").cast("string"))
    hashed = ev.select("event_id", h.alias("h"))
    a = hashed.filter(F.col("event_id") % 2 == 0).orderBy("h", "event_id").limit(k)
    b = hashed.filter(F.col("event_id") % 2 == 1).orderBy("h", "event_id").limit(k)
    merged = a.unionByName(b).orderBy("h", "event_id").limit(k)
    direct = hashed.orderBy("h", "event_id").limit(k)
    assert sorted(r["event_id"] for r in merged.collect()) == sorted(
        r["event_id"] for r in direct.collect()
    )


def test_bottomk_quantile_estimates_near_exact(spark, sf_dir):
    """With k=1024 the p50/p90 estimates must land within a few
    percentage points of the true quantile rank (binomial bound)."""
    from spk_sl_validation_spark.ext.sketches import bottomk_sample_quantiles

    ev = load_table(spark, sf_dir, "events")
    row = bottomk_sample_quantiles(ev, "value", "event_id", 1024).collect()[0]
    n = ev.count()
    for p in (50, 90):
        est, exact = row[f"est_p{p}"], row[f"exact_p{p}"]
        # rank of the estimate in the full distribution ≈ p ± 5pp
        rank = ev.filter(F.col("value").cast("double") <= est).count() / n
        assert abs(rank - p / 100) < 0.06, (p, est, exact, rank)


def test_hll_estimate_by_groups_match_global_per_group(spark):
    """Per-group registers are the global sketch restricted to the
    group's rows, so each group's estimate equals hll_estimate run on
    that group's slice alone."""
    from spk_sl_validation_spark.ext.sketches import hll_estimate, hll_estimate_by

    rows = [(i, f"t{i % 3}", i % 40) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, user_id long")
    by = {
        r["event_type"]: (r["hll_estimate"], r["exact_distinct"])
        for r in hll_estimate_by(df, "event_type", "user_id").collect()
    }
    assert set(by) == {"t0", "t1", "t2"}
    for t in by:
        solo = hll_estimate(df.filter(df.event_type == t), "user_id").first()
        assert by[t] == (solo["hll_estimate"], solo["exact_distinct"])
