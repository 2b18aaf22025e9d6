"""Property test: the token-bucket Arrow fold vs an independent
in-Python reference on hypothesis-generated multi-user timelines."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spk_sl_validation_spark.ext.events import rate_limit_accept

CAP = 3.0
RATE = 0.05

_T0 = dt.datetime(2026, 1, 1)


def _round6_half_up(x: float) -> float:
    """HALF_UP like F.round/DuckDB — Python round() is banker's and
    diverges on exact ties (e.g. 3.0078125)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(str(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _python_fold(rows):
    """Reference fold with the same IEEE expression order: epoch-µs
    gaps divided by 1e6, min-clamped refill, spend-one-on-accept."""
    by_user: dict[int, list] = {}
    for eid, user, ts in rows:
        by_user.setdefault(user, []).append((eid, ts))
    out = {}
    for user, evs in by_user.items():
        evs.sort(key=lambda e: (e[1], e[0]))
        tokens = CAP
        prev_us = None
        for eid, ts in evs:
            us = int(ts.timestamp() * 1_000_000)
            avail = (
                tokens
                if prev_us is None
                else min(CAP, tokens + (float(us - prev_us) / 1000000.0) * RATE)
            )
            ok = avail >= 1.0
            tokens = avail - 1.0 if ok else avail
            out[eid] = (ok, _round6_half_up(tokens))
            prev_us = us
    return out


@st.composite
def timelines(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for eid in range(n):
        user = draw(st.integers(min_value=0, max_value=3))
        # offsets up to a few hours with second resolution, duplicates
        # allowed (tiebreak is event_id)
        off = draw(st.integers(min_value=0, max_value=10_000))
        rows.append((eid, user, _T0 + dt.timedelta(seconds=off)))
    return rows


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(timelines())
def test_rate_limit_matches_python_reference(spark, rows):
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: (r["accepted"], r["tokens_after"])
        for r in rate_limit_accept(df, CAP, RATE).collect()
    }
    want = _python_fold(rows)
    assert got == want


def test_rate_limit_preserves_nonlong_id_types(spark):
    """String event ids / int user ids pass through typed, not coerced
    to long (round-4 ADVICE item 2)."""
    rows = [
        ("e1", 1, _T0),
        ("e2", 1, _T0 + dt.timedelta(seconds=1)),
        ("e3", 2, _T0),
    ]
    df = spark.createDataFrame(rows, "event_id string, user_id int, ts timestamp")
    out = rate_limit_accept(df, CAP, RATE)
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields) == {
        "event_id": "string",
        "user_id": "int",
        "ts": "timestamp",
        "accepted": "boolean",
        "tokens_after": "double",
    }
    got = {r["event_id"]: r["accepted"] for r in out.collect()}
    assert got == {"e1": True, "e2": True, "e3": True}
