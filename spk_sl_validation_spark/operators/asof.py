"""As-of (point-in-time) join — an operator Spark's join surface lacks.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key group (backward
inclusive; the trades↔quotes / events↔latest-state shape).

Spark-first implementation — NOT a per-key loop or a range cross
join: tag both sides, union them, and run one ``last(..., ignorenulls)``
window per key ordered by (ts, side). Each left row picks up the
carried right payload from the nearest preceding right row. Cost:
one shuffle of (|L|+|R|) skinny rows on the key — the same price as a
regular equi-join, versus the O(|L|·|R|) range join a naive
implementation pays. At equal timestamps the right row sorts first
(side 0 < 1), giving inclusive semantics identical to DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``, which serves as the oracle.

Right rows that tie on (key, ts) are deduplicated to the max
``tiebreak`` row first — both engines must agree on the winner for
value-exact comparison.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    on: str = "ts",
    value_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join; left rows with no prior right row
    get nulls (left-outer semantics).

    ``value_cols``: right columns to carry (default: all but keys/ts).
    ``tiebreak``: right column deciding ties on (by, on) — max wins.
    """
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {on}]
    value_cols = list(value_cols)

    r = right.select(*by, on, *value_cols)
    if tiebreak is not None:
        wt = Window.partitionBy(*by, on).orderBy(F.col(tiebreak).desc())
        r = r.withColumn("__rn", F.row_number().over(wt)).filter(F.col("__rn") == 1).drop("__rn")

    payload = F.struct(*[F.col(c) for c in value_cols]).alias("__payload")
    r_tagged = r.select(
        *by, F.col(on).alias("__ts"), F.lit(0).alias("__side"), payload
    )
    # unionByName needs identical columns; wrap left's own columns in a struct.
    l_struct = left.select(
        *by, F.col(on).alias("__ts"), F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r_struct = r_tagged.withColumn(
        "__lrow", F.lit(None).cast(l_struct.schema["__lrow"].dataType)
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r_struct.unionByName(l_struct).withColumn(
        "__carried", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols = [F.col("__lrow")[c].alias(c) for c in left.columns] + [
        F.col("__carried")[c].alias(f"{c}{suffix}") for c in value_cols
    ]
    return merged.filter(F.col("__side") == 1).select(*out_cols)
