"""Incremental batch consumption with a durable high-watermark.

The operational middle ground between full recompute and Structured
Streaming: a scheduled batch job that processes only rows that arrived
since its last successful run. State is one tiny JSON document (the
watermark), not a streaming checkpoint — restartable, inspectable, and
engine-agnostic.

Correctness details that matter at scale:
- The watermark is COMPOSITE (ts, id): filtering ``ts > wm_ts`` alone
  silently drops rows that share the watermark timestamp but arrive in
  a later batch — the classic incremental-ETL bug. The lexicographic
  predicate keeps exactly-once row delivery as long as (ts, id) is
  unique and appends are monotone in it.
- Commit is explicit and AFTER the downstream write succeeds: crash
  between processing and ``commit()`` ⇒ the next run re-reads the same
  rows (at-least-once), which composes with an idempotent sink (see
  tests/test_scale_plans.py foreachBatch idempotence) to exactly-once.
- The max() that advances the watermark is one tiny aggregate on the
  already-filtered increment, not a scan of history.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _state_file(state_dir: str) -> str:
    return os.path.join(state_dir, "watermark.json")


def read_watermark(state_dir: str) -> tuple | None:
    """Load the committed (ts, id) watermark, or None on first run."""
    path = _state_file(state_dir)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        doc = json.load(fh)
    return (doc["ts"], doc["id"])


def incremental_rows(
    df: DataFrame, state_dir: str, ts_col: str, id_col: str
) -> DataFrame:
    """Rows strictly after the committed watermark in (ts, id) order —
    the increment this run should process. First run returns all rows."""
    wm = read_watermark(state_dir)
    if wm is None:
        return df
    ts_lit = F.lit(wm[0]).cast(dict(df.dtypes)[ts_col])
    return df.filter(
        (F.col(ts_col) > ts_lit)
        | ((F.col(ts_col) == ts_lit) & (F.col(id_col) > F.lit(wm[1])))
    )


def commit_watermark(
    increment: DataFrame, state_dir: str, ts_col: str, id_col: str
) -> tuple | None:
    """Advance the watermark to the increment's max (ts, id). Call
    AFTER the downstream write succeeds. Returns the new watermark, or
    None (no-op) for an empty increment."""
    row = increment.select(
        F.max(F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id"))).alias("wm")
    ).first()
    if row.wm is None:
        return None
    os.makedirs(state_dir, exist_ok=True)
    wm_ts = row.wm.ts
    doc = {"ts": wm_ts.isoformat() if hasattr(wm_ts, "isoformat") else wm_ts, "id": row.wm.id}
    tmp = _state_file(state_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, _state_file(state_dir))  # atomic on POSIX
    return (doc["ts"], doc["id"])
