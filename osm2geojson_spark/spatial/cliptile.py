"""Exact integer segment clipping + MVT LINESTRING tile rendering.

Extends ``spatial/mvt.py`` from points to POLYLINES — the missing half
of a real vector-tile pipeline (reference parity: the assembled way
geometries of osm2geojson are LineStrings, `OsmJoin.java`'s ordered
node chains; a tile server has to CLIP them per tile before encoding).

Pipeline shape (and why it scales):

1. vertices → global integer pixel lattice at ``res + log2(extent)``
   (the heatmap/vector_tiles quantization — pure codegen, no UDF);
2. one shuffle on the path key builds consecutive segments (window
   lead) — this is the ONLY shuffle that carries raw vertices;
3. a teleport filter drops segments longer than ``max_seg_px``
   (standard GPS hygiene, and the explicit bound that caps the
   candidate-tile fanout at ``(max_seg_px/extent + 2)²`` per segment);
4. a map-side Arrow kernel explodes each segment to the tiles of its
   bbox and clips with an EXACT rational Liang–Barsky — int64
   cross-multiplication only, no floats anywhere, so the Spark kernel
   (vectorized numpy) and the Spark-free oracle twin (scalar
   ``fractions.Fraction``) agree bit-for-bit. Empty clips die HERE,
   map-side, before the tile shuffle;
5. one shuffle keyed by tile feeds ``applyInPandas``: clipped segments
   re-chain into maximal polylines (same path, consecutive segment
   index, shared rounded endpoint) and serialize as a
   vector-tile-spec 2.1 LINESTRING layer (the byte-exact encoder from
   ``spatial/mvt.py``). Feature order is pinned (path id, first
   segment) so tile bytes are partition-invariant.

Exactness contract: with coordinates < 2^28 every intermediate product
fits int64 (t = n/d with n ≤ d ≤ 2^29; comparisons cross-multiply to
< 2^58; the half-up rounding numerator stays < 2^60). ``MAX_RES`` = 26
keeps the lattice within that bound by construction. Clipped endpoints
round half-up onto the lattice; a value inside the closed box stays
inside after rounding, so local coords are always in [0, extent).
Segments that round to a single point are dropped (MVT forbids
zero-length LineTo deltas).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm2geojson_spark.functions import cells as C
from osm2geojson_spark.spatial.mvt import (
    LINESTRING,
    encode_feature,
    encode_geometry,
    encode_layer,
    encode_tile,
)

__all__ = [
    "clip_segment",
    "clip_segments_np",
    "line_tiles",
    "chain_polylines",
    "linestring_layer_bytes",
]


# ------------------------------------------------------------- clipping
def clip_segment(x0: int, y0: int, x1: int, y1: int,
                 bx0: int, by0: int, bx1: int, by1: int):
    """Clip one integer segment to the closed box — scalar exact
    reference (``fractions.Fraction`` Liang–Barsky). Returns the
    half-up-rounded ``((cx0, cy0), (cx1, cy1))`` or ``None`` when the
    intersection is empty or rounds to a single lattice point. The
    vectorized kernel below must match this bit-for-bit (pinned by a
    hypothesis test)."""
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = Fraction(0), Fraction(1)
    for p, q in ((-dx, x0 - bx0), (dx, bx1 - x0),
                 (-dy, y0 - by0), (dy, by1 - y0)):
        if p == 0:
            if q < 0:
                return None
        else:
            r = Fraction(q, p)
            if p < 0:
                if r > t0:
                    t0 = r
            else:
                if r < t1:
                    t1 = r
    if t0 > t1:
        return None

    def rnd(a: int, d: int, t: Fraction) -> int:
        v = a + d * t
        return (2 * v.numerator + v.denominator) // (2 * v.denominator)

    c0 = (rnd(x0, dx, t0), rnd(y0, dy, t0))
    c1 = (rnd(x0, dx, t1), rnd(y0, dy, t1))
    if c0 == c1:
        return None
    return c0, c1


def clip_segments_np(x0, y0, x1, y1, bx0, by0, bx1, by1):
    """Vectorized exact Liang–Barsky: int64 arrays in, ``(keep, cx0,
    cy0, cx1, cy1)`` out. Parametric bounds are kept as fractions
    ``n/d`` (d > 0) and every comparison cross-multiplies — no float
    ever touches a coordinate."""
    x0 = np.asarray(x0, np.int64)
    y0 = np.asarray(y0, np.int64)
    x1 = np.asarray(x1, np.int64)
    y1 = np.asarray(y1, np.int64)
    bx0 = np.asarray(bx0, np.int64)
    by0 = np.asarray(by0, np.int64)
    bx1 = np.asarray(bx1, np.int64)
    by1 = np.asarray(by1, np.int64)
    dx, dy = x1 - x0, y1 - y0

    n0 = np.zeros_like(x0)
    d0 = np.ones_like(x0)
    n1 = np.ones_like(x0)
    d1 = np.ones_like(x0)
    alive = np.ones(x0.shape, dtype=bool)

    for p, q in ((-dx, x0 - bx0), (dx, bx1 - x0),
                 (-dy, y0 - by0), (dy, by1 - y0)):
        alive &= ~((p == 0) & (q < 0))
        rn = np.where(p < 0, -q, q)
        rd = np.where(p < 0, -p, p)  # > 0 wherever p != 0
        upd = (p < 0) & alive & (rn * d0 > n0 * rd)
        n0 = np.where(upd, rn, n0)
        d0 = np.where(upd, rd, d0)
        upd = (p > 0) & alive & (rn * d1 < n1 * rd)
        n1 = np.where(upd, rn, n1)
        d1 = np.where(upd, rd, d1)

    alive &= n0 * d1 <= n1 * d0

    def rnd(a, d, tn, td):
        return (2 * (a * td + d * tn) + td) // (2 * td)

    cx0 = rnd(x0, dx, n0, d0)
    cy0 = rnd(y0, dy, n0, d0)
    cx1 = rnd(x0, dx, n1, d1)
    cy1 = rnd(y0, dy, n1, d1)
    alive &= (cx0 != cx1) | (cy0 != cy1)
    return alive, cx0, cy0, cx1, cy1


# ----------------------------------------------------------- assembling
def chain_polylines(path_id, seg, lx0, ly0, lx1, ly1):
    """Re-chain clipped segments (sorted by (path_id, seg)) into
    maximal polylines: a chain extends while the path matches, the
    segment index is consecutive, and the rounded endpoint meets the
    next rounded start. Returns ``[(path_id, first_seg, [(x, y),
    ...])]`` — numpy break detection, per-feature vertex slices."""
    m = len(path_id)
    if m == 0:
        return []
    path_id = np.asarray(path_id, np.int64)
    seg = np.asarray(seg, np.int64)
    lx0 = np.asarray(lx0, np.int64)
    ly0 = np.asarray(ly0, np.int64)
    lx1 = np.asarray(lx1, np.int64)
    ly1 = np.asarray(ly1, np.int64)
    brk = np.ones(m, dtype=bool)
    brk[1:] = ((path_id[1:] != path_id[:-1])
               | (seg[1:] != seg[:-1] + 1)
               | (lx0[1:] != lx1[:-1])
               | (ly0[1:] != ly1[:-1]))
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], m)
    out = []
    for s, e in zip(starts, ends):
        verts = [(int(lx0[s]), int(ly0[s]))]
        verts.extend((int(lx1[i]), int(ly1[i])) for i in range(s, e))
        out.append((int(path_id[s]), int(seg[s]), verts))
    return out


def linestring_layer_bytes(chains, name: str = "paths",
                           extent: int = 4096) -> bytes:
    """Serialize chained polylines (already sorted by (path_id,
    first_seg)) as one MVT LINESTRING layer; feature id = path id, no
    properties (deterministic bytes need no value table)."""
    feats = [
        encode_feature(pid, LINESTRING, encode_geometry([verts],
                                                        LINESTRING), [])
        for pid, _s, verts in chains
    ]
    return encode_tile([encode_layer(name, feats, [], [], extent=extent)])


# ------------------------------------------------------------- operator
def line_tiles(
    vertices: DataFrame,
    res: int = 3,
    extent: int = 4096,
    max_seg_px: int | None = None,
    id_col: str = "path_id",
    order_cols: tuple = ("pos",),
    lon_col: str = "lon",
    lat_col: str = "lat",
    layer: str = "paths",
) -> DataFrame:
    """Per-path ordered vertices → one MVT LINESTRING tile per touched
    Morton tile at resolution ``res``. Returns ``(tile, n_features,
    n_vertices, mvt)`` with byte-deterministic tiles.

    ``max_seg_px`` (default ``extent``) is the teleport filter: GPS
    jumps longer than one tile width are dropped, which is both
    standard trajectory hygiene and the bound that keeps the per-
    segment candidate-tile fanout ≤ 9."""
    shift = (extent - 1).bit_length()
    if 1 << shift != extent:
        raise ValueError("extent must be a power of two")
    pix_res = res + shift
    if pix_res > C.MAX_RES:
        raise ValueError(f"res + log2(extent) must be <= {C.MAX_RES}")
    if max_seg_px is None:
        max_seg_px = extent

    w = Window.partitionBy(id_col).orderBy(*[F.col(c) for c in order_cols])
    gx = C.lon_ix(F.col(lon_col), pix_res)
    gy = C.lat_iy(F.col(lat_col), pix_res)
    segs = (
        vertices.select(
            F.col(id_col).cast("long").alias("path_id"),
            *[F.col(c) for c in order_cols],
            gx.alias("gx0"), gy.alias("gy0"),
        )
        .select(
            "path_id",
            (F.row_number().over(w) - 1).alias("seg"),
            "gx0", "gy0",
            F.lead("gx0").over(w).alias("gx1"),
            F.lead("gy0").over(w).alias("gy1"),
        )
        .where(F.col("gx1").isNotNull())
        .where(
            F.greatest(
                F.abs(F.col("gx1") - F.col("gx0")),
                F.abs(F.col("gy1") - F.col("gy0")),
            ) <= F.lit(int(max_seg_px)))
    )

    import pandas as pd

    def clip_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px0 = pdf["gx0"].to_numpy(np.int64)
            py0 = pdf["gy0"].to_numpy(np.int64)
            px1 = pdf["gx1"].to_numpy(np.int64)
            py1 = pdf["gy1"].to_numpy(np.int64)
            tx_lo = np.minimum(px0, px1) >> shift
            tx_hi = np.maximum(px0, px1) >> shift
            ty_lo = np.minimum(py0, py1) >> shift
            ty_hi = np.maximum(py0, py1) >> shift
            ntx = tx_hi - tx_lo + 1
            rep = ntx * (ty_hi - ty_lo + 1)
            idx = np.repeat(np.arange(len(pdf)), rep)
            offs = (np.arange(int(rep.sum()), dtype=np.int64)
                    - np.repeat(np.cumsum(rep) - rep, rep))
            tx = tx_lo[idx] + offs % ntx[idx]
            ty = ty_lo[idx] + offs // ntx[idx]
            bx0 = tx << shift
            by0 = ty << shift
            keep, cx0, cy0, cx1, cy1 = clip_segments_np(
                px0[idx], py0[idx], px1[idx], py1[idx],
                bx0, by0, bx0 + extent - 1, by0 + extent - 1)
            k = np.flatnonzero(keep)
            tile = (C._spread_np(tx[k])
                    | (C._spread_np(ty[k]) << 1)).astype(np.int64)
            yield pd.DataFrame({
                "tile": tile,
                "path_id": pdf["path_id"].to_numpy(np.int64)[idx[k]],
                "seg": pdf["seg"].to_numpy(np.int64)[idx[k]],
                "lx0": cx0[k] - bx0[k], "ly0": cy0[k] - by0[k],
                "lx1": cx1[k] - bx0[k], "ly1": cy1[k] - by0[k],
            })

    clipped = segs.mapInPandas(
        clip_batches,
        schema=("tile long, path_id long, seg long, "
                "lx0 long, ly0 long, lx1 long, ly1 long"))

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = int(pdf["tile"].iloc[0])
        pdf = pdf.sort_values(["path_id", "seg"], kind="mergesort")
        chains = chain_polylines(
            pdf["path_id"], pdf["seg"],
            pdf["lx0"], pdf["ly0"], pdf["lx1"], pdf["ly1"])
        buf = linestring_layer_bytes(chains, name=layer, extent=extent)
        n_vertices = sum(len(v) for _p, _s, v in chains)
        return pd.DataFrame(
            [(tile, len(chains), n_vertices, buf)],
            columns=["tile", "n_features", "n_vertices", "mvt"])

    return clipped.groupBy("tile").applyInPandas(
        render,
        schema="tile long, n_features long, n_vertices long, mvt binary")
