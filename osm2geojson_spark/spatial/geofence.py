"""Geofencing — zone assignment and enter/exit transition detection.

Engine-new (the reference has no point streams at all; this is the
standard alerting consumer of a zone table at planetary ping scale:
"notify when a vehicle enters/leaves a region"). Zones are axis-aligned
half-open rectangles ``[x0, x1) x [y0, y1)`` — the common geofence
shape; arbitrary polygons compose by running
:func:`osm2geojson_spark.spatial.pip.point_in_polygon_join` as the
assignment stage instead.

Scale shape:

- the zone table is a SMALL dim (thousands of fences, not billions) —
  assignment is a broadcast left join with a range predicate; pings
  never shuffle for it;
- with the default disjoint-zones contract each ping matches <= 1 zone,
  so the join preserves cardinality and the ONLY shuffle in the whole
  operator is the per-entity window (partition by user, order by time);
- ``overlapping=True`` relaxes the contract: a min(zone_id) aggregate
  dedupes multi-matched pings first (one extra shuffle, documented).

A transition row is emitted for every ping whose zone differs
(null-safely) from the entity's previous ping: enters (from NULL or
another zone), exits (to NULL), and zone-to-zone hops all surface in
one pass; an entity's first ping emits iff it starts inside a zone
(the implicit prior state is "outside").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assign_zones(
    points: DataFrame,
    zones: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    overlapping: bool = False,
) -> DataFrame:
    """Left-join each point to its containing zone (NULL = outside).

    ``zones``: (zone_id, x0, x1, y0, y1), half-open on the high edges.
    With ``overlapping=True`` multi-matched points resolve to the
    smallest zone_id (deterministic), at the cost of one aggregate
    shuffle; the default trusts the caller's zones to be disjoint.
    """
    inside = (
        (F.col(lon_col) >= F.col("x0")) & (F.col(lon_col) < F.col("x1"))
        & (F.col(lat_col) >= F.col("y0")) & (F.col(lat_col) < F.col("y1"))
    )
    joined = points.join(
        F.broadcast(zones.select("zone_id", "x0", "x1", "y0", "y1")),
        inside, "left",
    ).drop("x0", "x1", "y0", "y1")
    if not overlapping:
        return joined
    keys = [c for c in points.columns]
    return joined.groupBy(*keys).agg(F.min("zone_id").alias("zone_id"))


def geofence_transitions(
    points: DataFrame,
    zones: DataFrame,
    user_col: str = "user_id",
    order_cols: tuple = ("ts",),
    lon_col: str = "lon",
    lat_col: str = "lat",
    overlapping: bool = False,
) -> DataFrame:
    """Enter/exit/hop events per entity: one row per ping whose zone
    differs (null-safe) from the previous ping's zone, with
    ``from_zone`` / ``to_zone`` (NULL = outside). ``order_cols`` must be
    a deterministic total order per entity (add a ping id to break
    timestamp ties)."""
    assigned = assign_zones(points, zones, lon_col, lat_col, overlapping)
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    seq = assigned.withColumn("_prev", F.lag("zone_id").over(w))
    return (
        seq.where(~F.col("zone_id").eqNullSafe(F.col("_prev")))
        .select(
            user_col, *order_cols,
            F.col("_prev").alias("from_zone"),
            F.col("zone_id").alias("to_zone"),
        )
    )
