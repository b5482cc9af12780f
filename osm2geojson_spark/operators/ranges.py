"""Temporal range (interval) join — the time-axis analog of the spatial
distance join (spatial/tiles.distance_join): match every point event to
every interval containing it WITHOUT a theta join.

Naive `ev.join(iv, (start <= t) & (t <= end))` is a broadcast-nested-
loop / cartesian plan — quadratic at scale. Here the time axis is
bucketed: intervals explode into the O(len/bucket) buckets they cover,
events map to ONE bucket (narrow expr), and the join is an equi-join on
(key, bucket) + a residual containment filter. Each event-bucket matches
an overlapping interval exactly once (the event has a single bucket), so
no dedup pass is needed. Shuffle is keyed on (key, bucket) — AQE-
splittable when one bucket is hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "t",
    start: str = "start",
    end: str = "end",
    bucket: int = 32,
) -> DataFrame:
    """events(…, on, ts) ⋈ intervals(…, on, start, end) where
    start ≤ ts ≤ end (inclusive ends; integer time axis — days, seconds,
    whatever the caller normalized to). ``bucket`` is the time-bucket
    width: candidate fan-out per interval is len/bucket + 1 rows."""
    ev = events.withColumn("_b", F.floor(F.col(ts) / bucket))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(F.floor(F.col(start) / bucket),
                       F.floor(F.col(end) / bucket))),
    )
    joined = ev.join(iv, [on, "_b"])
    return joined.filter(
        (F.col(start) <= F.col(ts)) & (F.col(ts) <= F.col(end))
    ).drop("_b")


def merge_intervals(df: DataFrame, key_col: str, start_col: str,
                    end_col: str) -> DataFrame:
    """Gaps-and-islands: merge overlapping-or-touching CLOSED
    intervals per key → ``(key, start, end, n_merged)``. The classic
    warehouse coalesce (session stitching, maintenance windows, IP
    ranges): an island starts where ``start`` exceeds the running max
    ``end`` of all earlier intervals (running max, not lag — an
    earlier long interval can swallow several later ones), island id
    = cumulative count of starts, then one groupBy. Deterministic
    under ties: with equal starts the second row's running max
    already covers its start, so tie order can't flip a boundary.
    One shuffle on the key; two window passes reuse the exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    runmax = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "_new", (runmax.isNull()
                 | (F.col(start_col) > runmax)).cast("long"))
    grp = F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (flagged.withColumn("_grp", grp)
            .groupBy(key_col, "_grp")
            .agg(F.min(start_col).alias("start"),
                 F.max(end_col).alias("end"),
                 F.count("*").alias("n_merged"))
            .drop("_grp"))


def interval_coverage(df: DataFrame, key_col: str, start_col: str,
                      end_col: str) -> DataFrame:
    """Sweep-line coverage profile per key → ``(key, t, t_next, cov)``:
    how many half-open ``[start, end)`` intervals cover each span
    between consecutive breakpoints — the occupancy/concurrency
    profile (sessions online, bookings overlapping, coverage depth).

    Pure window algebra: ±1 delta events, one groupBy(key, t), one
    partitioned cumulative sum + lead; exact ints end-to-end. The
    closing breakpoint emits cov = 0 with t_next NULL (profile
    closure). Scale shape: one shuffle on (key, t), windows
    partitioned by key — never a global sort."""
    src = (df.select(F.col(key_col).alias("key"),
                     F.col(start_col).cast("long").alias("s"),
                     F.col(end_col).cast("long").alias("e"))
           .where("s IS NOT NULL AND e IS NOT NULL AND s < e"))
    ev = (src.select("key", F.col("s").alias("t"),
                     F.lit(1).alias("d"))
          .unionByName(src.select("key", F.col("e").alias("t"),
                                  F.lit(-1).alias("d"))))
    agg = ev.groupBy("key", "t").agg(F.sum("d").alias("d"))
    w = (Window.partitionBy("key").orderBy("t")
         .rowsBetween(Window.unboundedPreceding, 0))
    lead_w = Window.partitionBy("key").orderBy("t")
    return (agg
            .withColumn("cov", F.sum("d").over(w).cast("long"))
            .withColumn("t_next", F.lead("t").over(lead_w))
            .select("key", "t", "t_next", "cov"))
