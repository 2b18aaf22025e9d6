"""Banded (bucketed) interval range join — bounded time-range joins
without a broadcast-nested-loop plan.

Not in the reference (`/root/reference` has only single-key equi
left joins — SURVEY.md §2.5); it is the standard "events within the
last W seconds of each anchor row" shape every event pipeline needs.

Naive Spark expresses ``l.key = r.key AND r.ts ∈ (l.ts - W, l.ts]``
as an equi-join on key plus a post-filter — correct, but the join
itself hashes on the key alone, so a hot key (one user with 10⁶
events) lands every pair on one task. The banded plan bounds the
work: bucket both sides by ``floor(epoch/W)``; a right row in bucket
b can only match left rows in buckets {b, b+1}, so the left side
fans out to exactly 2 rows and the join becomes a plain hash
equi-join on the *composite* (key, bucket) — hot keys split across
time buckets, pairs never leave their band, and AQE skew-split still
applies on top. One shuffle per side, no BNLJ, survives a 100×
scale-up as long as W stays bounded.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _banded_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    lookback_sec: int,
    how: str,
):
    """Band-explode ``left``, equi-join ``right`` on (by, band) with the
    exact range predicate folded into the join condition. Returns the
    joined frame (still carrying ``__band``/``__rk_*`` helper columns)
    and the name of the right-timestamp column after clash-renaming."""
    by = list(by)
    r_cols = [c for c in right.columns if c not in by]
    rename = {c: (f"{c}_r" if c in left.columns else c) for c in r_cols}
    r = right.select(
        *[F.col(c).alias(f"__rk_{c}") for c in by],
        *[F.col(c).alias(rename[c]) for c in r_cols],
        F.floor(F.unix_timestamp(F.col(right_ts)) / lookback_sec).alias("__band"),
    )
    rts = rename[right_ts]

    l_band = F.floor(F.unix_timestamp(F.col(left_ts)) / lookback_sec)
    l = left.withColumn("__band", F.explode(F.array(l_band - 1, l_band)))

    eqs = [l["__band"] == r["__band"]] + [F.col(k) == F.col(f"__rk_{k}") for k in by]
    cond = eqs[0]
    for e in eqs[1:]:
        cond = cond & e
    cond = (
        cond
        & (F.col(rts) > F.col(left_ts) - F.expr(f"INTERVAL {lookback_sec} SECOND"))
        & (F.col(rts) <= F.col(left_ts))
    )
    return l.join(r, cond, how), rts


def banded_interval_pairs(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    lookback_sec: int,
) -> DataFrame:
    """Inner matched pairs: every (left row, right row) with equal
    ``by`` keys and ``right_ts ∈ (left_ts - lookback_sec, left_ts]``.

    Output: all left columns + right's non-``by`` columns (suffixed
    ``_r`` on name clashes). Each qualifying pair appears exactly once
    (a right row has one band; the left row probes that band exactly
    once). Anchors with no match are absent — see
    :func:`interval_count` for zero-preserving per-anchor counts.
    """
    out, _ = _banded_join(left, right, by, left_ts, right_ts, lookback_sec, "inner")
    return out.drop("__band", *[f"__rk_{k}" for k in by])


def interval_count(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_id: str,
    left_ts: str,
    right_ts: str,
    lookback_sec: int,
) -> DataFrame:
    """Per-anchor count of right rows in the trailing window —
    zero-preserving: every left row comes back, ``n_in_window = 0``
    when nothing matched.

    Single-pass plan: the banded join runs LEFT-outer, so an anchor's
    two band copies survive even with no match (null right ts), and
    one hash aggregate on the anchor row counts non-null matches —
    unmatched copies contribute zero. One shuffle total (the
    aggregate); no stitch-back join of the counts to the left side.
    ``left_id`` is assumed unique per left row (it keys the result).
    """
    joined, rts = _banded_join(left, right, by, left_ts, right_ts, lookback_sec, "left")
    assert left_id in left.columns, left_id
    return joined.groupBy(*left.columns).agg(F.count(rts).alias("n_in_window"))
