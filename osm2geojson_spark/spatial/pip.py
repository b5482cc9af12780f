"""G2 — broadcast point-in-polygon join (equi prefilter + theta residual).

Plan shape (SURVEY.md §2.4 G2):
1. polygons are the SMALL side (the tiling/extract workload joins billions
   of points against thousands of polygons): collected once driver-side,
   compiled to numpy edge arrays, and shipped to executors inside the
   pandas-UDF closure (Spark broadcasts task closures);
2. a slim ``(cell, poly_id)`` covering map — no ring payload — is
   ``F.broadcast`` equi-joined against the points' Morton cell (pure
   column expr, codegen'd): the points side NEVER shuffles;
3. residual exact predicate: vectorized ray-cast — for each candidate
   polygon in an Arrow batch, ALL its points are tested against ALL its
   edges in one (P,E) numpy broadcast. No per-row Python.

At 100 TB: scan → cell expr → broadcast-hash-join → Arrow-batched
residual is one stage, no shuffle, linear in points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm2geojson_spark.functions import cells as C


def polygon_cover_cells(ring: Column, res: int) -> Column:
    """All Morton cells intersecting the ring's bbox (conservative cover)."""
    lons = F.transform(ring, lambda p: p["lon"])
    lats = F.transform(ring, lambda p: p["lat"])
    ix0 = C.lon_ix(F.array_min(lons), res)
    ix1 = C.lon_ix(F.array_max(lons), res)
    iy0 = C.lat_iy(F.array_min(lats), res)
    iy1 = C.lat_iy(F.array_max(lats), res)
    return F.flatten(
        F.transform(
            F.sequence(ix0, ix1),
            lambda x: F.transform(F.sequence(iy0, iy1), lambda y: C.cell_from_ixiy(x, y)),
        )
    )


def _close_ring(r: np.ndarray) -> np.ndarray:
    if len(r) and (r[0, 0] != r[-1, 0] or r[0, 1] != r[-1, 1]):
        return np.vstack([r, r[:1]])
    return r


def _pip_many(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray cast, vectorized: (P,) points vs (E,) edges → (P,) bool."""
    if len(ring) < 4:  # closed ring needs >= 4 rows
        return np.zeros(len(px), dtype=bool)
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    py_ = py[:, None]
    cross = (y1[None, :] > py_) != (y2[None, :] > py_)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py_ - y1[None, :]) * (x2 - x1)[None, :] / (y2 - y1)[None, :]
    hits = cross & (px[:, None] < xint)
    return (np.count_nonzero(hits, axis=1) % 2).astype(bool)


def _compile_polygons(rows) -> dict:
    """Driver-side: polygon rows → {poly_id: (outer_ring, [hole_rings])}."""
    compiled = {}
    for r in rows:
        outer = _close_ring(np.asarray([[p["lon"], p["lat"]] for p in r["ring"]],
                                       dtype=np.float64))
        holes = [
            _close_ring(np.asarray([[p["lon"], p["lat"]] for p in h], dtype=np.float64))
            for h in (r["holes"] or [])
        ]
        compiled[r["poly_id"]] = (outer, holes)
    return compiled


MAX_BROADCAST_POLYGONS = 200_000


def _with_holes(polygons: DataFrame) -> DataFrame:
    if "holes" not in polygons.columns:
        polygons = polygons.withColumn(
            "holes", F.lit(None).cast("array<array<struct<lon:double,lat:double>>>")
        )
    return polygons


def point_in_polygon_join(
    points: DataFrame, polygons: DataFrame, res: int = 10,
    lon_col: str = "lon", lat_col: str = "lat",
    max_broadcast_polygons: int = MAX_BROADCAST_POLYGONS,
) -> DataFrame:
    """points(… lon, lat) ⋈ polygons(poly_id, ring, holes?) → matched rows.

    ``polygons.ring``: array<struct<lon,lat>>; optional ``holes``:
    array<array<struct<lon,lat>>>. Points on an edge follow even-odd
    ray-cast semantics (strict interior for axis-aligned edges).

    Broadcast contract: the polygon side is collected to the driver,
    compiled to numpy edge arrays, and shipped via an EXPLICIT
    ``sc.broadcast`` — one torrent transfer per executor, not a copy in
    every task closure. The contract is guarded: more than
    ``max_broadcast_polygons`` raises before any driver collect — use
    :func:`point_in_polygon_join_partitioned` past that scale.
    """
    polygons = _with_holes(polygons)
    n_poly = polygons.count()
    if n_poly > max_broadcast_polygons:
        raise ValueError(
            f"{n_poly} polygons exceeds the broadcast contract "
            f"({max_broadcast_polygons}); use point_in_polygon_join_partitioned "
            "(rings shipped through the cover-map join) instead")
    poly_rows = polygons.select("poly_id", "ring", "holes").collect()
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(_compile_polygons(poly_rows))

    cover = polygons.select(
        "poly_id", F.explode(polygon_cover_cells(F.col("ring"), res)).alias("cell"))
    # slim covering map only — ring payloads travel in the sc.broadcast
    cover = cover.select("poly_id", "cell")

    @F.pandas_udf(T.BooleanType())
    def residual(lon: pd.Series, lat: pd.Series, poly_id: pd.Series) -> pd.Series:
        compiled = bc.value
        px = lon.to_numpy(dtype=np.float64)
        py = lat.to_numpy(dtype=np.float64)
        pid = poly_id.to_numpy()
        out = np.zeros(len(px), dtype=bool)
        for p in np.unique(pid):  # grouped: one vectorized pass per polygon
            m = pid == p
            outer, holes = compiled[p]
            inside = _pip_many(px[m], py[m], outer)
            for h in holes:
                if not inside.any():
                    break
                inside &= ~_pip_many(px[m], py[m], h)
            out[m] = inside
        return pd.Series(out)

    pts = points.withColumn("cell", C.cell_expr(F.col(lon_col), F.col(lat_col), res))
    cand = pts.join(F.broadcast(cover), "cell")
    return (
        cand.withColumn("_hit", residual(F.col(lon_col), F.col(lat_col), F.col("poly_id")))
        .filter(F.col("_hit"))
        .drop("_hit", "cell")
    )


def point_in_polygon_join_partitioned(
    points: DataFrame, polygons: DataFrame, res: int = 10,
    lon_col: str = "lon", lat_col: str = "lat",
) -> DataFrame:
    """PIP for polygon sets too large to broadcast (millions of polygons /
    big rings): no driver collect, no broadcast anywhere.

    Plan: points get a cell key (narrow expr) → shuffle equi-join against
    the exploded (cell, poly_id) cover map → second equi-join on poly_id
    attaches the ring payload to CANDIDATE rows only → Arrow-batched
    residual ray-cast compiles each polygon once per (batch, poly_id)
    group. Two shuffles, both on keys Catalyst/AQE can re-plan (skewed
    hot cells split at runtime); ring bytes travel once per candidate
    pair — the standard partitioned-spatial-join cost model.

    Results are identical to :func:`point_in_polygon_join` (pytest pins
    equality on shared fixtures)."""
    polygons = _with_holes(polygons)
    cover = polygons.select(
        "poly_id", F.explode(polygon_cover_cells(F.col("ring"), res)).alias("cell"))

    @F.pandas_udf(T.BooleanType())
    def residual(lon: pd.Series, lat: pd.Series, poly_id: pd.Series,
                 ring: pd.Series, holes: pd.Series) -> pd.Series:
        px = lon.to_numpy(dtype=np.float64)
        py = lat.to_numpy(dtype=np.float64)
        pid = poly_id.to_numpy()
        out = np.zeros(len(px), dtype=bool)
        for p in pd.unique(pid):  # compile each polygon once per batch
            m = pid == p
            i = int(np.flatnonzero(m)[0])
            outer = _close_ring(np.asarray(
                [[q["lon"], q["lat"]] for q in ring.iloc[i]], dtype=np.float64))
            hs = [
                _close_ring(np.asarray([[q["lon"], q["lat"]] for q in h],
                                       dtype=np.float64))
                for h in (holes.iloc[i] if holes.iloc[i] is not None else [])
            ]
            inside = _pip_many(px[m], py[m], outer)
            for h in hs:
                if not inside.any():
                    break
                inside &= ~_pip_many(px[m], py[m], h)
            out[m] = inside
        return pd.Series(out)

    pts = points.withColumn("cell", C.cell_expr(F.col(lon_col), F.col(lat_col), res))
    cand = pts.join(cover, "cell").join(
        polygons.select("poly_id", "ring", "holes"), "poly_id")
    return (
        cand.withColumn(
            "_hit",
            residual(F.col(lon_col), F.col(lat_col), F.col("poly_id"),
                     F.col("ring"), F.col("holes")))
        .filter(F.col("_hit"))
        .drop("_hit", "cell", "ring", "holes")
    )


def polyfill(
    polygons: DataFrame, res: int,
    max_broadcast_polygons: int = MAX_BROADCAST_POLYGONS,
) -> DataFrame:
    """Polygon → covering cell set (H3-polyfill shape): every res-``res``
    Morton cell whose CENTER lies inside the polygon (even-odd, holes
    subtracted) → ``(poly_id, cell, ix, iy)``.

    The bbox (ix, iy) lattice explodes per polygon as two nested
    JVM ``sequence``s (never a driver loop), centers are pure column
    arithmetic, and the inside test is the same broadcast-compiled
    Arrow ray-cast the PIP join uses — each candidate cell is tested
    against ITS OWN polygon only, so there is no join at all, just a
    map-side explode + filter. Cost is O(Σ bbox cells); same broadcast
    contract/guard as :func:`point_in_polygon_join`.
    """
    polygons = _with_holes(polygons)
    n_poly = polygons.count()
    if n_poly > max_broadcast_polygons:
        raise ValueError(
            f"{n_poly} polygons exceeds the broadcast contract "
            f"({max_broadcast_polygons})")
    poly_rows = polygons.select("poly_id", "ring", "holes").collect()
    spark = polygons.sparkSession
    bc = spark.sparkContext.broadcast(_compile_polygons(poly_rows))

    n = 1 << res
    lons = F.transform(F.col("ring"), lambda p: p["lon"])
    lats = F.transform(F.col("ring"), lambda p: p["lat"])
    cov = (
        polygons.select(
            "poly_id",
            F.explode(F.sequence(
                C.lon_ix(F.array_min(lons), res),
                C.lon_ix(F.array_max(lons), res))).alias("ix"),
            C.lat_iy(F.array_min(lats), res).alias("iy0"),
            C.lat_iy(F.array_max(lats), res).alias("iy1"),
        )
        .select(
            "poly_id", "ix",
            F.explode(F.sequence(F.col("iy0"), F.col("iy1"))).alias("iy"),
        )
    )
    cx = ((F.col("ix").cast("double") + F.lit(0.5)) / F.lit(float(n))) \
        * F.lit(360.0) - F.lit(180.0)
    cy = ((F.col("iy").cast("double") + F.lit(0.5)) / F.lit(float(n))) \
        * F.lit(180.0) - F.lit(90.0)
    cov = cov.select("poly_id", "ix", "iy", cx.alias("cx"), cy.alias("cy"))

    @F.pandas_udf(T.BooleanType())
    def inside(lon: pd.Series, lat: pd.Series, poly_id: pd.Series) -> pd.Series:
        compiled = bc.value
        px = lon.to_numpy(dtype=np.float64)
        py = lat.to_numpy(dtype=np.float64)
        pid = poly_id.to_numpy()
        out = np.zeros(len(px), dtype=bool)
        for p in np.unique(pid):
            m = pid == p
            outer, holes = compiled[p]
            hit = _pip_many(px[m], py[m], outer)
            for h in holes:
                if not hit.any():
                    break
                hit &= ~_pip_many(px[m], py[m], h)
            out[m] = hit
        return pd.Series(out)

    return (
        cov.withColumn("_in", inside(F.col("cx"), F.col("cy"), F.col("poly_id")))
        .filter(F.col("_in"))
        .select(
            "poly_id",
            C.cell_from_ixiy(F.col("ix"), F.col("iy")).alias("cell"),
            "ix", "iy",
        )
    )
