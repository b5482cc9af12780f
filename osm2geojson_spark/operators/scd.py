"""Slowly-changing-dimension (SCD type 2) build + point-in-time reads.

The warehouse staple the reference's static join pipeline never
needed but any long-lived entity table does: collapse an append-only
change log into versioned dimension rows ``[valid_from, valid_to)``
and answer as-of queries against them.

Scale shape: everything is windowed BY THE ENTITY KEY — one shuffle
on the key, two window passes over the same partitioning (Catalyst
reuses the exchange), no joins, no driver state. At 100 TB the cost
is the one key shuffle; skewed entities degrade only their own
partition's sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_build", "scd2_snapshot"]


def scd2_build(df: DataFrame, key_col: str, attr_cols: list[str],
               order_col: str) -> DataFrame:
    """Change log → SCD2 dimension: one row per (key, run of equal
    attrs), ``valid_from`` = first ``order_col`` of the run,
    ``valid_to`` = next run's start (NULL = open / current),
    ``version`` = 1-based run index. Consecutive duplicate attribute
    snapshots collapse; attribute comparison is null-safe (NULL ==
    NULL holds, so a run of NULLs is ONE version). ``order_col`` must
    be unique per key (use the event id, not a tie-prone timestamp).
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    cur = F.struct(*[F.col(c) for c in attr_cols])
    starts = (
        df.withColumn("_chg", ~cur.eqNullSafe(F.lag(cur).over(w)))
        .where("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(order_col)
    return (
        starts.select(
            key_col, *attr_cols,
            F.col(order_col).alias("valid_from"),
            F.lead(order_col).over(w2).alias("valid_to"),
            F.row_number().over(w2).cast("long").alias("version"))
        .withColumn("is_current", F.col("valid_to").isNull()))


def scd2_snapshot(dim: DataFrame, at) -> DataFrame:
    """Point-in-time read of an SCD2 dimension: the one version per
    key whose ``[valid_from, valid_to)`` interval covers ``at`` —
    a pure filter (pushes down to the scan; at scale this is a
    partition-pruned read, not a window)."""
    at_lit = at if isinstance(at, Column) else F.lit(at)
    return dim.where(
        (F.col("valid_from") <= at_lit)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at_lit)))
