"""G4 — raster-tile ↔ vector join: assign every image/point row to its
map tile, with explicit skew handling for hot tiles (dense urban cells).

A tile at zoom z IS the Morton cell at resolution z (the quadtree is the
tile pyramid: slippy-map convention, z/x/y). Assignment is therefore a
pure column expression — zero shuffle. The vector join (tile metadata,
GeoJSON tile boundaries) is a broadcast equi-join on tile_id.

Salting (SURVEY.md §4 custom-work 2): when a tile's row count is
pathological (urban extracts), `salted_tile_join` splits hot keys into
``n_salt`` sub-keys and replicates the small side — on top of AQE's
runtime skew splitting, which this engine enables by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.functions import cells as C


def tile_expr(lon, lat, zoom: int):
    """Tile id at zoom = Morton cell at resolution ``zoom``."""
    return C.cell_expr(lon, lat, zoom)


def tile_of_cell(cell, res: int, zoom: int):
    """Re-derive a coarser tile from a finer cell: drop 2 bits/level."""
    if zoom > res:
        raise ValueError("zoom must be <= cell resolution")
    return F.shiftright(cell, 2 * (res - zoom))


def tile_table(spark, zoom: int) -> DataFrame:
    """All 4^zoom tiles with bbox + GeoJSON boundary (built distributed)."""
    n = 1 << zoom
    df = spark.range(4**zoom).select(F.col("id").alias("tile_id"))
    # de-interleave via join-free expr: reconstruct ix,iy by compacting bits
    ix = F.lit(0).cast("long")
    iy = F.lit(0).cast("long")
    for b in range(zoom):
        ix = ix.bitwiseOR(F.shiftleft(F.shiftright("tile_id", 2 * b).bitwiseAND(F.lit(1)), b))
        iy = iy.bitwiseOR(F.shiftleft(F.shiftright("tile_id", 2 * b + 1).bitwiseAND(F.lit(1)), b))
    df = df.select(
        "tile_id", F.lit(zoom).alias("zoom"),
        (ix.cast("double") / n * 360.0 - 180.0).alias("lon_min"),
        ((ix + 1).cast("double") / n * 360.0 - 180.0).alias("lon_max"),
        (iy.cast("double") / n * 180.0 - 90.0).alias("lat_min"),
        ((iy + 1).cast("double") / n * 180.0 - 90.0).alias("lat_max"),
    )
    ring = F.array(
        F.array("lon_min", "lat_min"), F.array("lon_max", "lat_min"),
        F.array("lon_max", "lat_max"), F.array("lon_min", "lat_max"),
        F.array("lon_min", "lat_min"),
    )
    return df.withColumn(
        "geojson",
        F.concat(F.lit('{"type":"Polygon","coordinates":['), F.to_json(ring), F.lit("]}")),
    )


def assign_tiles(points: DataFrame, zoom: int,
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Narrow, shuffle-free tile assignment."""
    return points.withColumn("tile_id", tile_expr(F.col(lon_col), F.col(lat_col), zoom))


def tile_vector_join(points: DataFrame, tiles: DataFrame, zoom: int,
                     lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Points ⋈ tile metadata — broadcast equi-join on tile_id."""
    return assign_tiles(points, zoom, lon_col, lat_col).join(
        F.broadcast(tiles), "tile_id"
    )


def salted_tile_join(points: DataFrame, tiles: DataFrame, zoom: int,
                     n_salt: int = 8, id_col: str = "image_id",
                     lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Skew-proof variant: hash-salt the fact side, replicate the dim side
    n_salt×. Use when the dim side is too big to broadcast AND tiles are
    hot; otherwise prefer tile_vector_join (broadcast beats salting)."""
    pts = assign_tiles(points, zoom, lon_col, lat_col).withColumn(
        "salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("salt")
    tiles_rep = tiles.select("*", salts)
    return pts.join(tiles_rep, ["tile_id", "salt"]).drop("salt")


def tile_histogram(points: DataFrame, zoom: int,
                   lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Per-tile row counts — the skew-detection metric (feeds the metrics
    table; hot tiles found here get the salted path)."""
    return (
        assign_tiles(points, zoom, lon_col, lat_col)
        .groupBy("tile_id").agg(F.count("*").alias("n_rows"))
    )
