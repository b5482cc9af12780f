"""Map matching — snap GPS points to the nearest road segment.

Engine-new (the reference assembles way geometry, `OsmJoin.java:270-323`,
but never matches external points back onto it; this is the canonical
consumer of those assembled ways at ping scale). Semantics are
metric-only and grid-independent: a point matches the segment with the
smallest squared planar distance (degree space, same planar contract as
`spatial/knn.py`) among segments with ``dist2 <= eps*eps``; ties break
to the smallest ``seg_id``; points with no segment inside ``eps`` are
dropped (unmatched). Because the contract never mentions the grid, the
oracle can be a brute-force cross join — an INDEPENDENT algorithm, not
a replay of the prefilter.

Scale shape (the reason this survives 10^12 pings x 10^8 segments):

- segments explode to the Morton cells covered by their eps-expanded
  bbox (``sequence`` x 2, bounded: ceil((len+2*eps)/cell) per axis — a
  handful of cells for road-scale segments);
- points map to ONE cell; candidates come from an equi-join on
  (ix, iy) — never a theta join, never a cartesian;
- the eps-expansion makes the prefilter COMPLETE: any segment within
  eps of a point (euclidean => within eps per axis of its bbox) covers
  the point's cell, so the final ``dist2 <= eps^2`` filter loses
  nothing;
- the winner is one partial-aggregated ``min(struct(dist2, seg_id,
  ...))`` per point — all output columns come from the same argmin row,
  map-side combinable, ONE shuffle after the join.

Point-to-segment math is the textbook clamped projection, written with
one operation order and mirrored verbatim by :func:`match_steps_sql`
so DuckDB reproduces every double bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.functions import cells as C


def map_match(
    points: DataFrame,
    segments: DataFrame,
    eps: float,
    res: int = 10,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
) -> DataFrame:
    """Match each point to its nearest segment within ``eps``.

    ``points``: (point_id, px, py); ``segments``: (seg_id, ax, ay, bx,
    by) — planar degree coordinates, segment must not be degenerate
    (len2 > 0). Returns one row per MATCHED point:
    ``(point_id, seg_id, dist2, snap_lon, snap_lat)`` where snap_* is
    the closest point on the winning segment.
    """
    n = 1 << res
    eps2 = eps * eps

    def _ix(col):
        return C.lon_ix(col, res)

    def _iy(col):
        return C.lat_iy(col, res)

    seg = segments.select(
        seg_id, "ax", "ay", "bx", "by",
        (F.col("bx") - F.col("ax")).alias("dx"),
        (F.col("by") - F.col("ay")).alias("dy"),
    ).withColumn(
        "len2", F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")
    )
    # eps-expanded bbox -> covered cell ranges (completeness argument in
    # the module docstring); sequence() keeps the fan-out bounded and
    # JVM-side
    covered = (
        seg.withColumn(
            "nx",
            F.explode(F.sequence(
                _ix(F.least("ax", "bx") - F.lit(eps)),
                _ix(F.greatest("ax", "bx") + F.lit(eps)),
            )),
        )
        .withColumn(
            "ny",
            F.explode(F.sequence(
                _iy(F.least("ay", "by") - F.lit(eps)),
                _iy(F.greatest("ay", "by") + F.lit(eps)),
            )),
        )
    )

    pts = points.select(
        point_id, "px", "py",
        _ix(F.col("px")).alias("nx"),
        _iy(F.col("py")).alias("ny"),
    )

    # candidate pairs: equi-join on the cell; each (point, segment) pair
    # appears at most once (a point has exactly one cell)
    cand = pts.join(covered, ["nx", "ny"])

    t = (
        (F.col("px") - F.col("ax")) * F.col("dx")
        + (F.col("py") - F.col("ay")) * F.col("dy")
    ) / F.col("len2")
    scored = cand.withColumn("t", t).withColumn(
        "tc",
        F.when(F.col("t") < 0, F.lit(0.0))
         .when(F.col("t") > 1, F.lit(1.0))
         .otherwise(F.col("t")),
    ).withColumn(
        "snap_lon", F.col("ax") + F.col("tc") * F.col("dx")
    ).withColumn(
        "snap_lat", F.col("ay") + F.col("tc") * F.col("dy")
    ).withColumn(
        "dist2",
        (F.col("px") - F.col("snap_lon")) * (F.col("px") - F.col("snap_lon"))
        + (F.col("py") - F.col("snap_lat")) * (F.col("py") - F.col("snap_lat")),
    )

    hit = scored.where(F.col("dist2") <= F.lit(eps2))
    # argmin via struct ordering: (dist2, seg_id) is a unique key per
    # point, so every later field is determined — deterministic under
    # any partitioning, and partially aggregable map-side
    best = (
        hit.groupBy(point_id)
        .agg(F.min(F.struct("dist2", seg_id, "snap_lon", "snap_lat"))
             .alias("_w"))
        .select(
            point_id,
            F.col(f"_w.{seg_id}").alias(seg_id),
            F.col("_w.dist2").alias("dist2"),
            F.col("_w.snap_lon").alias("snap_lon"),
            F.col("_w.snap_lat").alias("snap_lat"),
        )
    )
    return best


def match_steps_sql(pts_cte: str, segs_cte: str, eps: float) -> str:
    """The SAME clamped-projection arithmetic as chained CTEs over a
    points CTE ``(point_id, px, py)`` and a segments CTE ``(seg_id, ax,
    ay, bx, by, dx, dy, len2)`` — brute-force cross join (independent of
    the cell prefilter), ending in a CTE ``matched`` with the operator's
    output columns. Embed inside ``WITH pts AS (...), segs AS (...)``.
    Every step is its own CTE column so the operation ORDER (and thus
    every IEEE-754 double) is identical to the Spark side."""
    eps2 = repr(eps * eps)
    return f"""
cand0 AS (
  SELECT p.point_id, s.seg_id, p.px, p.py, s.ax, s.ay, s.dx, s.dy,
         (((((p.px) - (s.ax)) * (s.dx)) + (((p.py) - (s.ay)) * (s.dy)))
          / (s.len2)) AS t
  FROM {pts_cte} p, {segs_cte} s),
cand1 AS (
  SELECT *, (CASE WHEN (t < 0) THEN 0.0 WHEN (t > 1) THEN 1.0 ELSE t END)
         AS tc
  FROM cand0),
cand2 AS (
  SELECT *, ((ax) + ((tc) * (dx))) AS snap_lon,
            ((ay) + ((tc) * (dy))) AS snap_lat
  FROM cand1),
hit AS (
  SELECT point_id, seg_id,
         ((((px) - (snap_lon)) * ((px) - (snap_lon)))
          + (((py) - (snap_lat)) * ((py) - (snap_lat)))) AS dist2,
         snap_lon, snap_lat
  FROM cand2
  WHERE ((((px) - (snap_lon)) * ((px) - (snap_lon)))
         + (((py) - (snap_lat)) * ((py) - (snap_lat))))
        <= CAST('{eps2}' AS DOUBLE)),
best AS (SELECT point_id, MIN(dist2) AS d2 FROM hit GROUP BY point_id),
win AS (
  SELECT h.point_id, MIN(h.seg_id) AS seg_id
  FROM hit h JOIN best b ON ((h.point_id = b.point_id) AND (h.dist2 = b.d2))
  GROUP BY h.point_id),
matched AS (
  SELECT w.point_id AS point_id, w.seg_id AS seg_id, h.dist2 AS dist2,
         h.snap_lon AS snap_lon, h.snap_lat AS snap_lat
  FROM win w JOIN hit h
    ON ((h.point_id = w.point_id) AND (h.seg_id = w.seg_id)))"""
