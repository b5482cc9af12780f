"""Raster polygonize: connected regions of equal value → region table.

The GDAL ``gdal_polygonize`` operation (raster → vector regions),
distributed with the classic TWO-PHASE connected-components recipe —
the pattern that scales to continental rasters where no executor ever
sees more than one tile:

1. **Local labeling** (map-side, zero shuffle): each tile labels its
   own equal-value 4-connected components with numpy min-propagation;
   a component's provisional id is the global cell id (``gy·W + gx``)
   of its smallest cell — deterministic, so independent passes over
   the same tile agree.
2. **Boundary stitching** (one strip shuffle): every tile ships its
   labeled WEST column / NORTH row to the west/north neighbor; the
   receiver compares values across the seam and emits one provisional-
   id edge per equal-value adjacent cell pair. Only regions that
   actually touch a tile border appear in the edge graph — it is
   boundary-sized, not raster-sized.
3. **Global merge**: distributed min-label CC over the edge graph
   (operators/dedup.dup_clusters — localCheckpoint loop, O(diameter)
   rounds, O(1) driver rows per round) maps provisional ids to the
   region's global min cell id.
4. **Stats rollup**: per-tile per-provisional partials (count + bbox)
   join the tiny CC mapping (left — interior regions keep their own
   id) and groupBy the final region id.

Region ids are therefore canonical (global min cell id), and every
output number is an exact integer — the pyref oracle flood-fills the
whole raster in one numpy array and must agree row-for-row.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["polygonize", "label_equal_components"]

_OWN_E, _OWN_S, _FROM_E, _FROM_S = 0, 1, 2, 3


def label_equal_components(a: np.ndarray) -> np.ndarray:
    """Label equal-value 4-connected components of a 2-D int array with
    the min LOCAL linear index of each component (numpy min-propagation
    to fixpoint — whole-array C-speed rounds, ≤ component diameter)."""
    t_h, t_w = a.shape
    lab = np.arange(t_h * t_w, dtype=np.int64).reshape(t_h, t_w)
    while True:
        new = lab.copy()
        m = a[:, :-1] == a[:, 1:]
        np.minimum(new[:, :-1], np.where(m, lab[:, 1:], lab[:, :-1]),
                   out=new[:, :-1])
        np.minimum(new[:, 1:], np.where(m, lab[:, :-1], lab[:, 1:]),
                   out=new[:, 1:])
        m = a[:-1, :] == a[1:, :]
        np.minimum(new[:-1, :], np.where(m, lab[1:, :], lab[:-1, :]),
                   out=new[:-1, :])
        np.minimum(new[1:, :], np.where(m, lab[:-1, :], lab[1:, :]),
                   out=new[1:, :])
        if np.array_equal(new, lab):
            return lab
        lab = new


def _tile_labels(tx: int, ty: int, data, t: int, width: int):
    """(values, provisional global ids) for one tile."""
    a = np.asarray(data, np.int64).reshape(t, t)
    loc = label_equal_components(a)
    # local linear index → global cell id of that cell
    ly, lx = np.divmod(loc, t)
    prov = (ty * t + ly) * width + (tx * t + lx)
    return a, prov


def polygonize(tiles: DataFrame, tile_size: int, width: int,
               max_iters: int = 25, moments: bool = False) -> DataFrame:
    """Regions of equal value over ``(tx, ty, data array<long>)`` tiles
    (full rectangular grid, raster width ``width`` pixels). Returns
    (region_id, value, n_cells, min_x, min_y, max_x, max_y); with
    ``moments=True`` the exact integer raw moments (sx, sy, sxx, sxy,
    syy) are appended — centroid/orientation/eccentricity are pure
    column arithmetic downstream (the image blob-analysis surface),
    computed as per-tile partials in the SAME rollup, no extra pass."""
    from osm2geojson_spark.operators.dedup import dup_clusters

    t, w = int(tile_size), int(width)

    import pandas as pd

    strip_cols = ["tx", "ty", "kind", "vals", "provs"]

    def emit_strips(batches):
        for pdf in batches:
            out = []
            for tx, ty, data in zip(pdf["tx"], pdf["ty"], pdf["data"]):
                tx, ty = int(tx), int(ty)
                a, prov = _tile_labels(tx, ty, data, t, w)
                out.append((tx, ty, _OWN_E, a[:, -1].tolist(),
                            prov[:, -1].tolist()))
                out.append((tx, ty, _OWN_S, a[-1, :].tolist(),
                            prov[-1, :].tolist()))
                if tx > 0:
                    out.append((tx - 1, ty, _FROM_E, a[:, 0].tolist(),
                                prov[:, 0].tolist()))
                if ty > 0:
                    out.append((tx, ty - 1, _FROM_S, a[0, :].tolist(),
                                prov[0, :].tolist()))
            yield pd.DataFrame(out, columns=strip_cols)

    strips = tiles.mapInPandas(
        emit_strips, schema=("tx long, ty long, kind int, "
                             "vals array<long>, provs array<long>"))

    def seam_edges(key, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = {int(k): (np.asarray(v, np.int64), np.asarray(p, np.int64))
                 for k, v, p in zip(pdf["kind"], pdf["vals"], pdf["provs"])}
        rows = []
        for own, frm in ((_OWN_E, _FROM_E), (_OWN_S, _FROM_S)):
            if own in parts and frm in parts:
                (va, pa), (vb, pb) = parts[own], parts[frm]
                m = va == vb
                rows += list(zip(pa[m].tolist(), pb[m].tolist()))
        return pd.DataFrame(rows, columns=["id_a", "id_b"]).astype("int64")

    edges = strips.groupBy("tx", "ty").applyInPandas(
        seam_edges, schema="id_a long, id_b long").distinct()

    def emit_stats(batches):
        for pdf in batches:
            out = []
            for tx, ty, data in zip(pdf["tx"], pdf["ty"], pdf["data"]):
                tx, ty = int(tx), int(ty)
                a, prov = _tile_labels(tx, ty, data, t, w)
                gx = tx * t + np.arange(t, dtype=np.int64)[None, :]
                gy = ty * t + np.arange(t, dtype=np.int64)[:, None]
                gxf = np.broadcast_to(gx, a.shape).ravel()
                gyf = np.broadcast_to(gy, a.shape).ravel()
                df = pd.DataFrame({
                    "prov": prov.ravel(), "value": a.ravel(),
                    "x": gxf, "y": gyf})
                if moments:
                    df["sxx"] = df["x"] * df["x"]
                    df["sxy"] = df["x"] * df["y"]
                    df["syy"] = df["y"] * df["y"]
                    g = df.groupby("prov").agg(
                        value=("value", "first"),
                        n_cells=("value", "size"),
                        min_x=("x", "min"), min_y=("y", "min"),
                        max_x=("x", "max"), max_y=("y", "max"),
                        sx=("x", "sum"), sy=("y", "sum"),
                        sxx=("sxx", "sum"), sxy=("sxy", "sum"),
                        syy=("syy", "sum")).reset_index()
                else:
                    g = df.groupby("prov").agg(
                        value=("value", "first"),
                        n_cells=("value", "size"),
                        min_x=("x", "min"), min_y=("y", "min"),
                        max_x=("x", "max"), max_y=("y", "max")
                    ).reset_index()
                out.append(g)
            cols = ["prov", "value", "n_cells", "min_x", "min_y",
                    "max_x", "max_y"] + (
                ["sx", "sy", "sxx", "sxy", "syy"] if moments else [])
            yield pd.concat(out, ignore_index=True) if out else pd.DataFrame(
                columns=cols).astype("int64")

    m_schema = (", sx long, sy long, sxx long, sxy long, syy long"
                if moments else "")
    stats = tiles.mapInPandas(
        emit_stats, schema=("prov long, value long, n_cells long, "
                            "min_x long, min_y long, max_x long, "
                            "max_y long" + m_schema))

    cc = dup_clusters(edges, max_iters=max_iters)
    m_cols = ["sx", "sy", "sxx", "sxy", "syy"] if moments else []
    merged = (stats.join(cc, stats.prov == cc.id, "left")
              .select(F.coalesce("cluster_id", "prov").alias("region_id"),
                      "value", "n_cells", "min_x", "min_y",
                      "max_x", "max_y", *m_cols))
    return merged.groupBy("region_id").agg(
        F.first("value").alias("value"),
        F.sum("n_cells").alias("n_cells"),
        F.min("min_x").alias("min_x"), F.min("min_y").alias("min_y"),
        F.max("max_x").alias("max_x"), F.max("max_y").alias("max_y"),
        *[F.sum(c).alias(c) for c in m_cols])
