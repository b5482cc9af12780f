"""G2 — broadcast point-in-polygon join (equi prefilter + theta residual).

Plan shape (SURVEY.md §2.4 G2):
1. each polygon row → covering cells of its bbox at resolution ``res``
   (pure column exprs: sequence over the ix/iy bbox, Morton-encoded);
2. points → cell at the same resolution (column expr);
3. equi-join on ``cell`` with the polygon side broadcast (polygon tables
   are the small dim in the image-tiling workload);
4. residual exact predicate: vectorized ray-cast pandas UDF (Arrow batch,
   numpy inner loop — no per-row Python).

At 100 TB the points side never shuffles: broadcast + codegen'd cell expr
means the scan → join → residual is one stage.
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


@F.pandas_udf(T.BooleanType())
def _pip_udf(lon: pd.Series, lat: pd.Series, ring: pd.Series, holes: pd.Series) -> pd.Series:
    """Even-odd ray cast, point in outer ring and outside all holes."""
    out = np.zeros(len(lon), dtype=bool)
    for i in range(len(lon)):
        r = np.asarray([[p["lon"], p["lat"]] for p in ring.iloc[i]], dtype=np.float64)
        px, py = lon.iloc[i], lat.iloc[i]
        inside = _ray_cast(px, py, r)
        if inside and holes.iloc[i] is not None:
            for h in holes.iloc[i]:
                hr = np.asarray([[p["lon"], p["lat"]] for p in h], dtype=np.float64)
                if _ray_cast(px, py, hr):
                    inside = False
                    break
        out[i] = inside
    return pd.Series(out)


def _ray_cast(px: float, py: float, ring: np.ndarray) -> bool:
    if len(ring) < 3:
        return False
    x, y = ring[:, 0], ring[:, 1]
    if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
        x = np.append(x, x[0])
        y = np.append(y, y[0])
    x1, y1, x2, y2 = x[:-1], y[:-1], x[1:], y[1:]
    cross = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    return bool(np.count_nonzero(cross & (px < xint)) % 2)


def point_in_polygon_join(
    points: DataFrame, polygons: DataFrame, res: int = 10,
    lon_col: str = "lon", lat_col: str = "lat",
) -> DataFrame:
    """points(… lon, lat) ⋈ polygons(poly_id, ring, holes?) → matched rows.

    ``polygons.ring``: array<struct<lon,lat>>; optional ``holes``:
    array<array<struct<lon,lat>>>.
    """
    if "holes" not in polygons.columns:
        polygons = polygons.withColumn(
            "holes", F.lit(None).cast("array<array<struct<lon:double,lat:double>>>")
        )
    poly_cells = polygons.select(
        "poly_id", "ring", "holes",
        F.explode(polygon_cover_cells(F.col("ring"), res)).alias("cell"),
    )
    pts = points.withColumn("cell", C.cell_expr(F.col(lon_col), F.col(lat_col), res))
    cand = pts.join(F.broadcast(poly_cells), "cell")
    return (
        cand.withColumn("_hit", _pip_udf(F.col(lon_col), F.col(lat_col),
                                         F.col("ring"), F.col("holes")))
        .filter(F.col("_hit"))
        .drop("_hit", "ring", "holes", "cell")
    )
