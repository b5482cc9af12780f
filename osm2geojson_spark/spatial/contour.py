"""Contour (isoline) extraction — marching squares over a value grid.

Engine-new: the raster→vector converse of `spatial/heatmap.py` (density
grid in, GeoJSON-able line segments out — the op behind every "isochrone
band" / "density isoline" map layer). Everything is bounded integer
arithmetic, so the DuckDB oracle replays it exactly and the output is
deterministic under any partitioning.

Geometry convention: grid cell (ix, iy) is a contour-corner sample; a
marching-squares BLOCK is the 2x2 corner set at (bx..bx+1, by..by+1).
Output segments live in a 2x-scaled integer lattice (corner (ix, iy) →
(2ix, 2iy)) so edge midpoints are exact integers — no interpolation, no
floats. Segment endpoints are emitted lexicographically ordered, and
the two saddle cases (masks 6 and 9) use the fixed "separated blobs"
resolution. Cells absent from the input are below-threshold by
construction (no dense grid is ever materialized).

Scale shape: above-threshold cells explode to the <= 4 blocks they
corner (bounded fan-out), the mask is one partial-aggregated groupBy
over block coordinates, and the 16-case table is a broadcast VALUES
join — for a planet-scale grid no stage ever holds more than the
occupied cells x 4.

Closed-loop invariant (tested): for any finite grid, every contour
vertex has even degree — the segments tile into closed loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mask bit b = dx + 2*dy for corner (dx, dy); edge midpoints in the
# doubled block-local frame: B=(1,0) T=(1,2) L=(0,1) R=(2,1).
_B, _T, _L, _R = (1, 0), (1, 2), (0, 1), (2, 1)
_CASES = {
    1: [(_L, _B)], 2: [(_B, _R)], 3: [(_L, _R)], 4: [(_T, _L)],
    5: [(_T, _B)], 6: [(_B, _R), (_T, _L)], 7: [(_T, _R)],
    8: [(_R, _T)], 9: [(_L, _B), (_R, _T)], 10: [(_B, _T)],
    11: [(_T, _L)], 12: [(_L, _R)], 13: [(_B, _R)], 14: [(_L, _B)],
}


def case_rows() -> list[tuple]:
    """(mask, x1o, y1o, x2o, y2o) rows, endpoints lex-ordered — shared
    verbatim by the Spark broadcast table and the SQL VALUES oracle."""
    rows = []
    for mask, segs in _CASES.items():
        for p, q in segs:
            a, b = sorted([p, q])
            rows.append((mask, a[0], a[1], b[0], b[1]))
    return sorted(rows)


_CORNERS = [(dx, dy, 1 << (dx + 2 * dy)) for dx in (0, 1) for dy in (0, 1)]


def contour_segments(
    cells: DataFrame,
    thresholds: list[int],
    ix_col: str = "ix",
    iy_col: str = "iy",
    v_col: str = "v",
) -> DataFrame:
    """Isoline segments for each threshold: ``(level, x1, y1, x2, y2)``
    in the 2x-scaled integer lattice. ``cells`` holds the OCCUPIED grid
    cells only (one row per (ix, iy), any value column); a cell is
    "inside" level t iff ``v >= t``."""
    spark = cells.sparkSession
    lv = F.explode(F.array(*[F.lit(int(t)) for t in thresholds]))
    above = (
        cells.select(ix_col, iy_col, v_col)
        .withColumn("level", lv)
        .where(F.col(v_col) >= F.col("level"))
    )
    corner = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(w).alias("w"))
        for dx, dy, w in _CORNERS
    ]))
    masks = (
        above.select("level", ix_col, iy_col, corner.alias("c"))
        .select(
            "level",
            (F.col(ix_col) - F.col("c.dx")).alias("bx"),
            (F.col(iy_col) - F.col("c.dy")).alias("by"),
            F.col("c.w").alias("w"),
        )
        .groupBy("level", "bx", "by")
        .agg(F.sum("w").alias("mask"))
        .where(F.col("mask") != 15)   # mask 0 never materializes
    )
    case_df = spark.createDataFrame(
        case_rows(), "mask int, x1o int, y1o int, x2o int, y2o int")
    return (
        masks.join(F.broadcast(case_df), "mask")
        .select(
            "level",
            (F.col("bx") * 2 + F.col("x1o")).alias("x1"),
            (F.col("by") * 2 + F.col("y1o")).alias("y1"),
            (F.col("bx") * 2 + F.col("x2o")).alias("x2"),
            (F.col("by") * 2 + F.col("y2o")).alias("y2"),
        )
    )


def case_values_sql() -> str:
    """The 16-case table as a SQL VALUES relation (oracle twin)."""
    vals = ",\n".join(f"({m}, {a}, {b}, {c}, {d})"
                      for m, a, b, c, d in case_rows())
    return (f"SELECT * FROM (VALUES\n{vals}\n) "
            f"AS cases(mask, x1o, y1o, x2o, y2o)")
