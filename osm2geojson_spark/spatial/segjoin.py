"""Exact segment–segment intersection join — the line-layer spatial
join (road crossings, cadastral conflation, trajectory × boundary
clipping candidates) the polygon/point operators don't cover.

Same two-phase shape as every spatial join in this repo
(``spatial/tiles.py`` discipline): a CELL-COVER equi-join generates
candidate pairs (each segment explodes to the grid cells its bbox
covers — candidates bounded by per-cell occupancy², never segment
count²), then an EXACT integer orientation test keeps real
intersections. All geometry is int64: the four cross products
``d1..d4`` are differences of products of coordinate deltas, so with
coordinates below ~2^30 nothing can overflow, there is no epsilon
anywhere, and the DuckDB twin is the literal same algebra
(queries.py determinism rules). Collinear touching/overlap is handled
by the standard on-segment bbox test when a cross product is zero.

Scale shape: one explode + one equi-join shuffle on the cell key +
one distinct; a hot cell (dense urban extract) is exactly the salted
``tile_histogram`` skew surface and the same ``cells_per_axis``
coarsening applies. No driver data, no UDFs — the predicate is pure
codegen column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["segment_intersection_join"]


def _cross(ox, oy, ax, ay, bx, by) -> str:
    """((a − o) × (b − o)) as a SQL string over int64 columns."""
    return (f"((({ax}) - ({ox})) * (({by}) - ({oy}))"
            f" - (({bx}) - ({ox})) * (({ay}) - ({oy})))")


def segment_intersection_join(
    segs: DataFrame,
    cell: int = 4096,
    id_col: str = "seg_id",
) -> DataFrame:
    """Self-join of a segment table ``(seg_id, ax, ay, bx, by)``
    (int64 endpoints) → every unordered pair of DISTINCT segments that
    intersect (properly crossing, endpoint touching, or collinear
    overlapping): ``(seg_a, seg_b, proper)``.

    ``cell`` buckets candidate generation; segments longer than a few
    cells explode to more cover rows (ceil(len/cell)+1 per axis) but
    the test itself never depends on the grid — a pair is emitted once
    no matter how many cells it shares (distinct before the exact
    test, so the O(occupancy²) candidate set is deduped while still
    cell-bounded)."""
    c = int(cell)
    cov = segs.select(
        F.col(id_col).alias("sid"), "ax", "ay", "bx", "by",
        F.explode(F.expr(
            f"sequence(least(ax, bx) div {c}, greatest(ax, bx) div {c})"
        )).alias("cx"),
    ).select(
        "sid", "ax", "ay", "bx", "by", "cx",
        F.explode(F.expr(
            f"sequence(least(ay, by) div {c}, greatest(ay, by) div {c})"
        )).alias("cy"),
    )
    left = cov.select(
        F.col("sid").alias("seg_a"),
        F.col("ax").alias("p1x"), F.col("ay").alias("p1y"),
        F.col("bx").alias("p2x"), F.col("by").alias("p2y"),
        "cx", "cy")
    right = cov.select(
        F.col("sid").alias("seg_b"),
        F.col("ax").alias("p3x"), F.col("ay").alias("p3y"),
        F.col("bx").alias("p4x"), F.col("by").alias("p4y"),
        "cx", "cy")
    cand = (
        left.join(right, ["cx", "cy"])
        .where(F.col("seg_a") < F.col("seg_b"))
        .drop("cx", "cy")
        .distinct())
    d1 = _cross("p3x", "p3y", "p4x", "p4y", "p1x", "p1y")
    d2 = _cross("p3x", "p3y", "p4x", "p4y", "p2x", "p2y")
    d3 = _cross("p1x", "p1y", "p2x", "p2y", "p3x", "p3y")
    d4 = _cross("p1x", "p1y", "p2x", "p2y", "p4x", "p4y")
    on1 = ("((least(p3x, p4x) <= p1x) AND (p1x <= greatest(p3x, p4x))"
           " AND (least(p3y, p4y) <= p1y) AND (p1y <= greatest(p3y, p4y)))")
    on2 = ("((least(p3x, p4x) <= p2x) AND (p2x <= greatest(p3x, p4x))"
           " AND (least(p3y, p4y) <= p2y) AND (p2y <= greatest(p3y, p4y)))")
    on3 = ("((least(p1x, p2x) <= p3x) AND (p3x <= greatest(p1x, p2x))"
           " AND (least(p1y, p2y) <= p3y) AND (p3y <= greatest(p1y, p2y)))")
    on4 = ("((least(p1x, p2x) <= p4x) AND (p4x <= greatest(p1x, p2x))"
           " AND (least(p1y, p2y) <= p4y) AND (p4y <= greatest(p1y, p2y)))")
    proper = (f"((((({d1}) > 0) AND (({d2}) < 0))"
              f" OR ((({d1}) < 0) AND (({d2}) > 0)))"
              f" AND (((({d3}) > 0) AND (({d4}) < 0))"
              f" OR ((({d3}) < 0) AND (({d4}) > 0))))")
    touching = (f"(((({d1}) = 0) AND {on1}) OR ((({d2}) = 0) AND {on2})"
                f" OR ((({d3}) = 0) AND {on3}) OR ((({d4}) = 0) AND {on4}))")
    return (cand
            .withColumn("proper", F.expr(proper))
            .where(F.expr(f"({proper}) OR ({touching})"))
            .select("seg_a", "seg_b", "proper"))
