"""As-of join — the classic time-series operator Spark's DataFrame API
lacks (pandas merge_asof / DuckDB ASOF JOIN / kdb aj): for every left
row, attach the most recent right row with right.ts ≤ left.ts within the
same key group.

Spark-first formulation (no UDF, no per-key loop): tag and UNION the two
sides, then one window per key ordered by (ts, side) with
``last(payload_struct, ignorenulls=True)`` over an unbounded-preceding
frame — right rows deposit their payload into the running frame, left
rows read it. Cost: ONE shuffle on the key (the window exchange) over
|L|+|R| rows — same shape as a sort-merge join, no range-explosion.

Row-consistency (round-3 fix per ADVICE): the right payload travels as a
SINGLE struct of (right_ts, *value_cols), so a NULL in one payload
column can never be skipped past while other columns come from a newer
row — all as-of columns are guaranteed to originate from the same right
row, matching pandas merge_asof / DuckDB ASOF semantics for nullable
payloads.

Right-side ties: with ``dedup_right=True`` (default) the payload struct
itself joins the window ORDER BY — equal-(ts) right rows sort by struct
value, so ``last`` deterministically surfaces the struct-max row, all
columns from that ONE row. This costs nothing: no pre-aggregation, no
extra exchange (the single-shuffle plan shape is pinned in
tests/test_asof.py). Engines differ on tie behavior (pandas keeps the
last input row, which has no distributed meaning), so a documented
deterministic rule is the portable choice; pass ``dedup_right=False``
for the old (ts, side)-only order — required if a payload column is a
non-orderable type (map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    dedup_right: bool = True,
) -> DataFrame:
    """left ⟕asof right on ``by``: adds, per left row, the right payload
    columns (renamed ``<col><suffix>``) plus ``<right_ts><suffix>`` from
    the latest right row with right.ts ≤ left.ts; nulls when no right
    row precedes. Left rows and columns pass through unchanged."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (by, right_ts)]
    lcols = left.columns

    pay_type = T.StructType(
        [T.StructField("_ts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols])

    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols
          if c != by],
        F.col(by),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_pay"),
    ).select(*l.columns)  # align column order

    order = [F.col("_ats"), F.col("_side")]
    if dedup_right:
        order.append(F.col("_pay"))  # total order among right-side ties
    w = (Window.partitionBy(by).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    u = l.unionByName(r)
    filled = u.select(
        *lcols, "_side",
        F.last("_pay", ignorenulls=True).over(w).alias("_pay"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *lcols,
            F.col("_pay._ts").alias(f"{right_ts}{suffix}"),
            *[F.col(f"_pay.{c}").alias(f"{c}{suffix}") for c in value_cols],
        )
    )
