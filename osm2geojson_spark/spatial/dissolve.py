"""Rectilinear dissolve: exact union area of axis-aligned boxes.

The ST_Union → ST_Area analytic for the repo's integer-lattice geometry
family (bboxes from `way_bbox`, tile footprints, zone envelopes): per
group, the area covered by the UNION of half-open boxes
``[x1,x2) × [y1,y2)`` — overlaps counted once — without ever
materializing the union geometry.

Distributed shape (the classic sweep, decomposed into relational ops so
Catalyst parallelizes it instead of a per-group sequential scan):

1. **x-events**: the distinct x coordinates per group (box starts and
   ends) cut the plane into vertical STRIPS — adjacent pairs via one
   `lead()` window.
2. **coverage join**: a box covers a strip iff it spans it completely
   (x1 ≤ sx0 AND x2 ≥ sx1) — group equi-join + range residual. Within a
   strip the union is then a pure 1-D interval-union problem.
3. **interval union per (group, strip)**: one window ordered by
   (y1, y2) carrying the running max of y2; each row contributes
   ``max(0, y2 − max(y1, prev_max))`` — the gap it newly covers. All
   int64, no floats, so the DuckDB oracle is bit-exact by construction.
4. one aggregation: Σ contribution × strip width.

Scale: everything shuffles on (group, strip) — strips bound window
partitions to O(boxes-per-group) rows, and the coverage join fans a box
out to only the strips it spans (Σ = O(n·overlap-degree) rows per
group, the same bound as the reference sweep's active list). A single
group with n boxes costs O(n²) strip-coverage rows in the worst case
(all boxes overlapping); `max_group_boxes` guards that skew cliff
explicitly rather than letting one hot group OOM an executor — the same
cap discipline as the dedup family's bucket caps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["union_area"]


def union_area(
    boxes: DataFrame,
    group_col: str = "group_id",
    max_group_boxes: int | None = None,
) -> DataFrame:
    """Per-group exact union area of half-open int boxes
    ``(group_col, x1, y1, x2, y2)`` → ``(group_col, n_boxes,
    union_area)``. Degenerate boxes (x1 ≥ x2 or y1 ≥ y2) contribute
    nothing and are dropped up front."""
    g = group_col
    b = (boxes
         .where((F.col("x1") < F.col("x2")) & (F.col("y1") < F.col("y2")))
         .select(g, "x1", "y1", "x2", "y2"))

    if max_group_boxes is not None:
        big = (b.groupBy(g).agg(F.count(F.lit(1)).alias("n"))
               .where(F.col("n") > max_group_boxes).limit(1).collect())
        if big:
            raise ValueError(
                f"group {big[0][0]} has {big[0][1]} boxes "
                f"(> max_group_boxes={max_group_boxes}); raise the cap or "
                "pre-aggregate the hot group")

    xs = (b.select(g, F.col("x1").alias("x"))
          .unionAll(b.select(g, F.col("x2").alias("x")))
          .distinct())
    wx = Window.partitionBy(g).orderBy("x")
    strips = (xs.select(g, F.col("x").alias("sx0"),
                        F.lead("x").over(wx).alias("sx1"))
              .where(F.col("sx1").isNotNull()))

    bb = b.alias("bb")
    ss = strips.alias("ss")
    cov = bb.join(
        ss,
        (F.col(f"bb.{g}") == F.col(f"ss.{g}"))
        & (F.col("bb.x1") <= F.col("ss.sx0"))
        & (F.col("bb.x2") >= F.col("ss.sx1"))) \
        .select(F.col(f"bb.{g}").alias(g), F.col("ss.sx0").alias("sx0"),
                F.col("ss.sx1").alias("sx1"), "bb.y1", "bb.y2")

    wy = (Window.partitionBy(g, "sx0").orderBy("y1", "y2")
          .rowsBetween(Window.unboundedPreceding, -1))
    seg = cov.select(
        g, "sx0", "sx1", "y1", "y2",
        F.max("y2").over(wy).alias("prev_max"))
    contrib = (
        (F.col("sx1") - F.col("sx0"))
        * F.greatest(
            F.lit(0).cast("long"),
            F.col("y2") - F.greatest(F.col("y1"),
                                     F.coalesce("prev_max", F.col("y1")))))
    counts = b.groupBy(g).agg(F.count(F.lit(1)).alias("n_boxes"))
    area = (seg.groupBy(g)
            .agg(F.sum(contrib).alias("union_area")))
    return (counts.join(area, g, "left")
            .select(g, "n_boxes",
                    F.coalesce("union_area", F.lit(0)).cast("long")
                    .alias("union_area")))
