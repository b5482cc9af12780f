"""Distributed isotonic regression (pool-adjacent-violators), exact.

The monotone-calibration primitive (MLlib's IsotonicRegression;
probability calibration, dose-response curves): fit the best
non-decreasing step function to (x, y) under squared error. PAV's key
property makes it distributable: pooling adjacent violators in ANY
order reaches the same fixpoint, so per-partition PAV over
range-partitioned, sorted data followed by one PAV pass over the
surviving block summaries equals the sequential result (the same
recipe MLlib uses).

Exactness: block values are rationals sum/count — blocks carry
``(sum_y, n)`` as int64 and every violation test is the
cross-multiplication ``s_prev·c_cur > s_cur·c_prev`` (strict: equal
means do NOT merge — a deterministic block list, identical in the
Spark path and the sequential pyref twin).

Scale notes: equal-x points are pre-pooled with one groupBy (they must
share a block); the driver-side final merge sees only the COMPRESSED
per-partition block lists (worst case — already-monotone data — that
is O(n), exactly MLlib's bound, so a ``max_blocks`` guard fails loudly
instead of silently flooding the driver).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["isotonic_blocks", "pav_merge"]


def pav_merge(blocks: "list[tuple[int, int, int, int]]") \
        -> "list[tuple[int, int, int, int]]":
    """Sequential PAV over (start_x, end_x, sum_y, n) blocks already
    sorted by start_x — the shared exact kernel (also the pyref
    reference when fed one-point blocks)."""
    out: list[list[int]] = []
    for b in blocks:
        cur = list(b)
        while out and out[-1][2] * cur[3] > cur[2] * out[-1][3]:
            prev = out.pop()
            cur = [prev[0], cur[1], prev[2] + cur[2], prev[3] + cur[3]]
        out.append(cur)
    return [tuple(b) for b in out]


def isotonic_blocks(df: DataFrame, x_col: str = "x", y_col: str = "y",
                    partitions: int = 8,
                    max_blocks: int = 2_000_000) -> DataFrame:
    """PAV fit over (x int64, y int64) → block table (start_x, end_x,
    sum_y, n, fit_ppm) with fit_ppm = (10⁶·sum_y) div n (truncating —
    both engines agree for either sign)."""
    pooled = (df.groupBy(F.col(x_col).alias("x"))
              .agg(F.sum(F.col(y_col).cast("long")).alias("s"),
                   F.count("*").alias("c"))
              .repartitionByRange(partitions, "x")
              .sortWithinPartitions("x"))

    def local_pav(batches):
        rows = []
        for pdf in batches:
            rows.extend(zip(pdf["x"].tolist(), pdf["x"].tolist(),
                            pdf["s"].tolist(), pdf["c"].tolist()))
        if not rows:
            return
        yield pd.DataFrame(pav_merge(rows),
                           columns=["start_x", "end_x", "sum_y", "n"])

    partial = pooled.mapInPandas(
        local_pav, schema="start_x long, end_x long, sum_y long, n long")
    got = partial.collect()          # compressed blocks only (guarded)
    if len(got) > max_blocks:
        raise RuntimeError(
            f"{len(got)} surviving blocks exceed max_blocks="
            f"{max_blocks}; raise the guard or pre-aggregate x")
    blocks = pav_merge(sorted(
        (r["start_x"], r["end_x"], r["sum_y"], r["n"]) for r in got))
    spark = df.sparkSession
    out = spark.createDataFrame(
        pd.DataFrame(blocks, columns=["start_x", "end_x", "sum_y", "n"]))
    return out.select(
        "start_x", "end_x", "sum_y", "n",
        F.expr("(1000000 * sum_y) div n").alias("fit_ppm"))
