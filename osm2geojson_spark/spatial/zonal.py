"""G5 — raster zonal statistics: per-polygon pixel aggregates over
georeferenced image tiles (the GDAL ``zonal_stats`` shape, Spark-first).

Each image row is the raster for its slippy-map tile (tile id = Morton
cell of the row's (lon, lat) at ``zoom``, same convention as
:mod:`tiles`); pixel (r, c) is georeferenced to its CENTER by linear
mapping over the tile bbox, north-up (row 0 = lat_max edge).  A zone is
a polygon; its statistic counts exactly the pixels whose centers fall
inside the ring (even-odd ray cast) — partial tile coverage masks at
pixel granularity, it does not count or drop whole tiles.

Plan shape (scale-first):

1. tile assignment + tile-bbox columns — pure bit arithmetic on the
   Morton id (whole-stage codegen, zero shuffle);
2. zones are collected ONCE under the same guarded broadcast contract as
   :mod:`pip` (count-checked, compiled to numpy edge arrays, shipped via
   an explicit ``sc.broadcast`` — never per-task closures).  Zone bboxes
   prefilter tile×zone pairs inside the kernel, so a tile far from every
   zone decodes nothing;
3. ONE ``mapInPandas`` pass decodes each candidate tile (real codecs —
   ppm/bmp/qz6/png/JPEG/VP8L) and evaluates all overlapping zone masks
   vectorized (numpy crossing-number over the pixel-center lattice),
   emitting per-(zone, tile) integer partials: pixel count, luminance
   sum (r+g+b per pixel, 0..765 — integer-exact), min, max;
4. ONE ``groupBy(zone_id)`` over those tiny partials — the only shuffle,
   and it moves O(zones × tiles-overlapped) rows, never pixels.

Undecodable tiles follow the reference's quarantine discipline
(OsmJoin.java:176-179): the kernel emits a ``zone_id IS NULL`` marker
row carrying the error, callers split it out — never silently dropped.

At 100 TB: decode cost dominates and is embarrassingly parallel; the
zone broadcast is bounded by the same contract as PIP; the final shuffle
is proportional to the zone count, not the corpus.  The reference has no
raster layer at all (GRAFT; SURVEY §2.4 + multimodal axis).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.spatial.pip import MAX_BROADCAST_POLYGONS, _close_ring, _pip_many
from osm2geojson_spark.spatial.tiles import assign_tiles


def tile_bounds(df: DataFrame, zoom: int, tile_col: str = "tile_id") -> DataFrame:
    """lon/lat bbox of each row's tile — de-interleaved Morton bits,
    pure column arithmetic (no join against a tile table)."""
    n = 1 << zoom
    ix = F.lit(0).cast("long")
    iy = F.lit(0).cast("long")
    for b in range(zoom):
        ix = ix.bitwiseOR(F.shiftleft(F.shiftright(tile_col, 2 * b).bitwiseAND(F.lit(1)), b))
        iy = iy.bitwiseOR(F.shiftleft(F.shiftright(tile_col, 2 * b + 1).bitwiseAND(F.lit(1)), b))
    return (df
            .withColumn("lon_min", ix.cast("double") / n * 360.0 - 180.0)
            .withColumn("lon_max", (ix + 1).cast("double") / n * 360.0 - 180.0)
            .withColumn("lat_min", iy.cast("double") / n * 180.0 - 90.0)
            .withColumn("lat_max", (iy + 1).cast("double") / n * 180.0 - 90.0))


def _compile_zones(rows) -> list[tuple]:
    """[(zone_id, closed_ring, (minx, maxx, miny, maxy))] — bbox computed
    driver-side once so the kernel's prefilter is a scalar compare."""
    out = []
    for r in rows:
        ring = _close_ring(np.asarray(
            [[p["lon"], p["lat"]] for p in r["ring"]], dtype=np.float64))
        out.append((r["zone_id"], ring,
                    (ring[:, 0].min(), ring[:, 0].max(),
                     ring[:, 1].min(), ring[:, 1].max())))
    return out


_OUT_SCHEMA = ("zone_id string, image_id string, n_pix long, sum_lum long, "
               "min_lum int, max_lum int, error string")


def _tile_zone_rows(t, zone_rings, decode) -> list[tuple]:
    """Decode ONE tile and mask it against its candidate zones —
    the shared kernel of both the broadcast and partitioned paths.
    ``zone_rings``: [(zone_id, closed numpy ring)]."""
    try:
        px = decode(bytes(t.bytes), t.fmt)
    except Exception as ex:  # noqa: BLE001 — quarantine, never drop
        return [(None, t.image_id, 0, 0, None, None,
                 f"{type(ex).__name__}: {ex}")]
    x0, x1 = float(t.lon_min), float(t.lon_max)
    y0, y1 = float(t.lat_min), float(t.lat_max)
    h, w = px.shape[:2]
    lum = px.astype(np.int64).sum(axis=2)        # (h, w), 0..765
    cx = x0 + (np.arange(w, dtype=np.float64) + 0.5) / w * (x1 - x0)
    cy = y1 - (np.arange(h, dtype=np.float64) + 0.5) / h * (y1 - y0)
    lons = np.broadcast_to(cx, (h, w)).ravel()
    lats = np.repeat(cy, w)
    flat = lum.ravel()
    rows = []
    for zid, ring in zone_rings:
        m = _pip_many(lons, lats, ring)
        k = int(np.count_nonzero(m))
        if k == 0:
            continue
        sel = flat[m]
        rows.append((zid, t.image_id, k, int(sel.sum()),
                     int(sel.min()), int(sel.max()), None))
    return rows


def zonal_partials(images: DataFrame, zones: DataFrame, zoom: int,
                   lon_col: str = "lon", lat_col: str = "lat",
                   max_broadcast_zones: int = MAX_BROADCAST_POLYGONS,
                   ) -> DataFrame:
    """Per-(zone, tile) integer partials + quarantine markers.

    ``images``: (image_id, bytes, fmt, lon, lat, …) — input_hint schema;
    ``zones``: (zone_id string, ring array<struct<lon:double,lat:double>>).
    Rows with ``zone_id IS NULL`` are quarantined tiles (error set).
    """
    n_zones = zones.count()
    if n_zones > max_broadcast_zones:
        raise ValueError(
            f"{n_zones} zones exceeds the broadcast contract "
            f"({max_broadcast_zones}); pre-partition by zone cover cells instead")
    compiled = _compile_zones(zones.select("zone_id", "ring").collect())
    spark = images.sparkSession
    bc = spark.sparkContext.broadcast(compiled)

    tiled = tile_bounds(
        assign_tiles(images, zoom, lon_col, lat_col), zoom)
    cols = ["image_id", "bytes", "fmt", "lon_min", "lon_max", "lat_min", "lat_max"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imported in the task, not the driver closure (codec tables are big)
        from osm2geojson_spark.operators.images import _decode

        zs = bc.value
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                x0, x1 = float(t.lon_min), float(t.lon_max)
                y0, y1 = float(t.lat_min), float(t.lat_max)
                hit = [(zid, ring) for zid, ring, (zx0, zx1, zy0, zy1) in zs
                       if zx0 <= x1 and x0 <= zx1 and zy0 <= y1 and y0 <= zy1]
                if not hit:
                    continue  # decode nothing for tiles far from every zone
                rows.extend(_tile_zone_rows(t, hit, _decode))
            yield pd.DataFrame(rows, columns=[
                "zone_id", "image_id", "n_pix", "sum_lum", "min_lum",
                "max_lum", "error"])

    return tiled.select(*cols).mapInPandas(run, _OUT_SCHEMA)


def zonal_partials_partitioned(images: DataFrame, zones: DataFrame, zoom: int,
                               lon_col: str = "lon", lat_col: str = "lat",
                               ) -> DataFrame:
    """Partitioned twin of :func:`zonal_partials` for zone sets past the
    broadcast contract (millions of admin polygons): NO driver collect,
    no broadcast — zones explode to their bbox cover tiles (the same
    Morton ids tile assignment produces) and a distributed equi-join on
    ``tile_id`` routes each tile's bytes to exactly the zones whose
    bboxes overlap it.  A second groupBy on the tile key collapses the
    join fan-out back to ONE decode per candidate tile (rings collected
    per tile), so decode cost matches the broadcast path; the extra cost
    vs broadcast is that candidate tile bytes cross two exchanges —
    bounded by the zone-covered area, never the corpus, and skewed hot
    tiles fall to AQE skew-split.  Output contract is identical (same
    rows, same quarantine markers)."""
    from osm2geojson_spark.spatial.pip import polygon_cover_cells

    cover = zones.select(
        "zone_id", "ring",
        F.explode(polygon_cover_cells(F.col("ring"), zoom)).alias("tile_id"))
    tiled = tile_bounds(assign_tiles(images, zoom, lon_col, lat_col), zoom)
    cand = (tiled
            .select("image_id", "bytes", "fmt", "tile_id",
                    "lon_min", "lon_max", "lat_min", "lat_max")
            .join(cover, "tile_id"))
    grouped = cand.groupBy("image_id").agg(
        F.first("bytes").alias("bytes"), F.first("fmt").alias("fmt"),
        F.first("lon_min").alias("lon_min"), F.first("lon_max").alias("lon_max"),
        F.first("lat_min").alias("lat_min"), F.first("lat_max").alias("lat_max"),
        F.collect_list(F.struct("zone_id", "ring")).alias("zs"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osm2geojson_spark.operators.images import _decode

        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                rings = [(z["zone_id"], _close_ring(np.asarray(
                    [[p["lon"], p["lat"]] for p in z["ring"]],
                    dtype=np.float64))) for z in t.zs]
                rows.extend(_tile_zone_rows(t, rings, _decode))
            yield pd.DataFrame(rows, columns=[
                "zone_id", "image_id", "n_pix", "sum_lum", "min_lum",
                "max_lum", "error"])

    return grouped.mapInPandas(run, _OUT_SCHEMA)


def zonal_stats(images: DataFrame, zones: DataFrame, zoom: int,
                lon_col: str = "lon", lat_col: str = "lat",
                partitioned: bool = False) -> DataFrame:
    """Per-zone aggregate: (zone_id, n_tiles, n_pix, sum_lum, mean_lum,
    min_lum, max_lum).  ``mean_lum`` is mean per-pixel luminance on the
    0..255 scale (sum_lum / (3·n_pix)) — derived from integer-exact sums
    so it is engine-reproducible bit-for-bit.  ``partitioned=True``
    routes through :func:`zonal_partials_partitioned` (no broadcast,
    no driver collect — the million-zone path)."""
    fn = zonal_partials_partitioned if partitioned else zonal_partials
    parts = fn(images, zones, zoom, lon_col, lat_col)
    ok = parts.filter(F.col("zone_id").isNotNull())
    return (ok.groupBy("zone_id")
            .agg(F.count("*").alias("n_tiles"),
                 F.sum("n_pix").alias("n_pix"),
                 F.sum("sum_lum").alias("sum_lum"),
                 (F.sum("sum_lum").cast("double")
                  / (F.lit(3.0) * F.sum("n_pix").cast("double"))).alias("mean_lum"),
                 F.min("min_lum").alias("min_lum"),
                 F.max("max_lum").alias("max_lum")))


def zonal_quarantine(partials: DataFrame) -> DataFrame:
    """The undecodable-tile stream (zone_id IS NULL marker rows)."""
    return (partials.filter(F.col("zone_id").isNull())
            .select("image_id", "error"))
