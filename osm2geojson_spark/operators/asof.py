"""As-of join — the classic time-series operator Spark's DataFrame API
lacks (pandas merge_asof / DuckDB ASOF JOIN / kdb aj): for every left
row, attach the most recent right row with right.ts ≤ left.ts within the
same key group.

Spark-first formulation (no UDF, no per-key loop): tag and UNION the two
sides, then one window per key ordered by (ts, side) with
``last(value, ignorenulls=True)`` over an unbounded-preceding frame —
right rows deposit their payload into the running frame, left rows read
it. Cost: ONE shuffle on the key (the window exchange) over |L|+|R|
rows — same shape as a sort-merge join, no range-explosion.

Right-side ties: rows ordered by (ts, side, right row order); callers
wanting deterministic payloads should pre-aggregate right to unique
(key, ts) — the catalog query does, matching DuckDB ASOF semantics
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """left ⟕asof right on ``by``: adds, per left row, the right payload
    columns (renamed ``<col><suffix>``) plus ``<right_ts><suffix>`` from
    the latest right row with right.ts ≤ left.ts; nulls when no right
    row precedes. Left rows and columns pass through unchanged."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (by, right_ts)]
    lcols = left.columns

    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{right_ts}{suffix}"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols
          if c != by],
        F.col(by),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).select(*l.columns)  # align column order for unionByName-by-position

    w = (Window.partitionBy(by).orderBy("_ats", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    u = l.unionByName(r)
    filled = u.select(
        *lcols, "_side",
        *[F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
          for c in [right_ts, *value_cols]],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
