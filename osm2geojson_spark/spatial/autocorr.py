"""Spatial autocorrelation (global Moran's I) over tiled rasters.

The hotspot-analysis statistic GIS suites ship next to zonal stats:
``I = (N/W) · Σᵢⱼ wᵢⱼ(xᵢ−x̄)(xⱼ−x̄) / Σᵢ(xᵢ−x̄)²`` with rook (4-)
adjacency, computed per ZONE (a block of tiles) so one job scores many
regions. Reference parity: the reference engine has no raster stats at
all (osm2geojson is vector-only); this extends the repo's raster
family (focal/zonal/hydrology) with the classic exploratory statistic.

Exactness: the mean-centered form is irrational, so everything is
rewritten over INTEGER power sums. With dᵢ = N·xᵢ − S (S = Σx):

  Σ_directed dᵢdⱼ = N²·2·E_xy − 2·N·S·E_dx + S²·W
  Σ dᵢ²            = N·(N·Q − S²)

where E_xy = Σ_undirected-edges xᵢxⱼ, E_dx = Σᵢ degᵢ·xᵢ, Q = Σx²,
W = Σ degᵢ — five plain integer aggregates. The N² scale cancels in
the ratio, so ``moran_ppm = (10⁶·N·num) div (W·den)`` is exact
integer arithmetic end-to-end (both Spark decimal ``div`` and DuckDB
HUGEINT ``//`` truncate toward zero — verified).

Distribution: tiles compute interior products locally; each tile ships
ONLY its left column and top row to the west/north neighbor (half the
focal halo — rook products need one side of each undirected edge), and
only when the neighbor is in the same zone, so the shuffle is uniform
and ≤ 2T pixels per T² tile. Degrees are closed-form from the zone
rectangle (no exchange at all). Per-tile partials then shrink to one
row per tile before the tiny zone aggregation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["moran_zone_stats"]

_CENTER, _FROM_EAST, _FROM_SOUTH = 0, 1, 2


def moran_zone_stats(tiles: DataFrame, tile_size: int,
                     zone_tiles: int) -> DataFrame:
    """Per-zone Moran's I components over ``(tx, ty, data array<long>)``
    tiles; zones are ``zone_tiles × zone_tiles`` tile blocks (adjacency
    does not cross zone borders). Returns one row per zone with the
    exact integer power sums, the DECIMAL(38,0) numerator/denominator,
    and ``moran_ppm``."""
    t = int(tile_size)
    zt = int(zone_tiles)

    import pandas as pd

    def emit(batches):
        for pdf in batches:
            out = []
            for tx, ty, data in zip(pdf["tx"], pdf["ty"], pdf["data"]):
                tx, ty = int(tx), int(ty)
                a = np.asarray(data, np.int64).reshape(t, t)
                out.append((tx, ty, _CENTER, list(data)))
                if tx % zt != 0:       # west neighbor shares our zone
                    out.append((tx - 1, ty, _FROM_EAST,
                                a[:, 0].tolist()))
                if ty % zt != 0:       # north neighbor shares our zone
                    out.append((tx, ty - 1, _FROM_SOUTH,
                                a[0, :].tolist()))
            yield pd.DataFrame(
                out, columns=["tx", "ty", "part", "payload"])

    halo = tiles.mapInPandas(
        emit, schema="tx long, ty long, part int, payload array<long>")

    def partials(key, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = {int(p): np.asarray(v, np.int64)
                 for p, v in zip(pdf["part"], pdf["payload"])}
        if _CENTER not in parts:       # strip for a tile outside grid
            return pd.DataFrame(columns=[
                "zx", "zy", "n", "s", "q", "e_xy", "e_dx", "w",
                "e_d2"]).astype("int64")
        tx, ty = int(key[0]), int(key[1])
        a = parts[_CENTER].reshape(t, t)
        e_xy = int((a[:, :-1] * a[:, 1:]).sum()) \
            + int((a[:-1, :] * a[1:, :]).sum())
        e_d2 = int(((a[:, :-1] - a[:, 1:]) ** 2).sum()) \
            + int(((a[:-1, :] - a[1:, :]) ** 2).sum())
        if _FROM_EAST in parts:        # right tile's left column
            e_xy += int((a[:, -1] * parts[_FROM_EAST]).sum())
            e_d2 += int(((a[:, -1] - parts[_FROM_EAST]) ** 2).sum())
        if _FROM_SOUTH in parts:       # below tile's top row
            e_xy += int((a[-1, :] * parts[_FROM_SOUTH]).sum())
            e_d2 += int(((a[-1, :] - parts[_FROM_SOUTH]) ** 2).sum())
        # closed-form in-zone rook degrees (zone is a rectangle)
        z = zt * t
        zgx = (tx % zt) * t + np.arange(t, dtype=np.int64)[None, :]
        zgy = (ty % zt) * t + np.arange(t, dtype=np.int64)[:, None]
        deg = (4 - (zgx == 0) - (zgx == z - 1)
               - (zgy == 0) - (zgy == z - 1)).astype(np.int64)
        return pd.DataFrame([(
            tx // zt, ty // zt, a.size, int(a.sum()),
            int((a * a).sum()), e_xy, int((deg * a).sum()),
            int(deg.sum()), e_d2)],
            columns=["zx", "zy", "n", "s", "q", "e_xy", "e_dx", "w",
                     "e_d2"])

    per_tile = halo.groupBy("tx", "ty").applyInPandas(
        partials, schema=("zx long, zy long, n long, s long, q long, "
                          "e_xy long, e_dx long, w long, e_d2 long"))

    agg = per_tile.groupBy("zx", "zy").agg(
        *[F.sum(c).alias(c)
          for c in ("n", "s", "q", "e_xy", "e_dx", "w", "e_d2")])

    d = "CAST({} AS DECIMAL(38,0))"
    num = (f"({d.format('n')} * n * 2 * e_xy"
           f" - {d.format('2')} * n * s * e_dx"
           f" + {d.format('s')} * s * w)")
    den = f"({d.format('n')} * (n * q - {d.format('s')} * s))"
    return agg.select(
        F.col("zx").alias("zone_x"), F.col("zy").alias("zone_y"),
        "n", "s", "q", "e_xy", "e_dx", "w", "e_d2",
        F.expr(num).alias("num"), F.expr(den).alias("den"),
        F.expr(f"CAST(({d.format('1000000')} * n * {num})"
               f" div (w * {den}) AS BIGINT)").alias("moran_ppm"),
        # Geary's C = (N−1)·N²·e_d2 / (W·den): the edge-difference twin
        # statistic, exact for free from the same halo pass
        F.expr(f"CAST(({d.format('1000000')} * (n - 1) * n * n * e_d2)"
               f" div (w * {den}) AS BIGINT)").alias("geary_ppm"),
    )
