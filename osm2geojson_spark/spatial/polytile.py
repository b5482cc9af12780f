"""Integer Sutherland–Hodgman polygon clipping + MVT POLYGON tiles.

Completes the vector-tile feature triple: ``spatial/mvt.py`` renders
POINT layers, ``spatial/cliptile.py`` LINESTRING layers, this module
POLYGON layers — the shape osm2geojson's assembled areas take (closed
ways and multipolygon relations, ``OsmEntityHandler.java``'s
polygon/ring semantics) once a tile server has to cut them per tile.

Pipeline shape (and why it scales):

1. vertices → the global integer pixel lattice at
   ``res + log2(extent)`` (same quantization as the heatmap / point /
   line renderers — pure codegen, no UDF);
2. ONE shuffle keyed by (poly, ring) assembles ordered ring arrays
   (``repartition`` by the group key first — collect_list has no
   map-side reduction, so this is the same single exchange with full
   scan parallelism; the way_assembly lesson);
3. a map-side Arrow kernel replicates each ring across the tiles of
   its bbox (fanout = bbox area in tiles — polygons pay for the tiles
   they actually cover, with an explicit ``max_tiles_per_ring`` guard)
   and clips every (ring, tile) instance with an integer
   Sutherland–Hodgman: per half-plane, crossings are computed as exact
   int64 cross-multiplications and rounded half-up back onto the
   lattice. Rounding per stage keeps every intermediate an int64
   (products stay < 2^55 for MAX_RES = 26 coordinates) at a bounded
   deviation of < 1 px per stage; a point inside the closed box stays
   inside after rounding, so local coords are always in [0, extent).
   Empty / degenerate clips (fewer than 3 distinct vertices, or zero
   shoelace area) die HERE, map-side, before the tile shuffle;
4. one shuffle keyed by tile feeds ``applyInPandas``: rings regroup by
   polygon, winding is normalized to the vector-tile-spec 2.1 rule
   (exterior ring positive surveyor's-formula area, interior rings
   negative), invisible features (net area 0 — a hole that fills its
   exterior inside this tile) are dropped, and features serialize in
   (poly_id) order so tile bytes are partition-invariant.

Sutherland–Hodgman against a convex box yields exactly subject ∩ box;
for non-convex subject rings the output may contain zero-width bridge
edges (the classic S-H degeneracy) — retained deterministically, and
renderers treat them as invisible. The scalar clipper below is the
Spark-free oracle twin; the vectorized numpy kernel is pinned
bit-for-bit against it by a hypothesis test.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.functions import cells as C
from osm2geojson_spark.spatial.mvt import (
    POLYGON,
    encode_feature,
    encode_geometry,
    encode_layer,
    encode_tile,
)

__all__ = [
    "clip_ring",
    "clip_rings_np",
    "shoelace2",
    "polygon_layer_bytes",
    "polygon_tiles",
]


def _rnd_div(n: int, d: int) -> int:
    """Half-up rounding of n/d for d > 0 (exact integer arithmetic)."""
    return (2 * n + d) // (2 * d)


# ------------------------------------------------------------- clipping
def clip_ring(ring, bx0: int, by0: int, bx1: int, by1: int):
    """Clip one integer ring (closing vertex NOT repeated) to the
    closed box — scalar exact reference. Returns the clipped ring with
    consecutive duplicates removed, or ``None`` when the intersection
    is empty or degenerate (fewer than 3 distinct vertices / zero
    area). Orientation of the input is preserved. The vectorized
    kernel below must match this bit-for-bit."""
    pts = [(int(x), int(y)) for x, y in ring]
    for axis, sign, c in ((0, 1, bx0), (0, -1, bx1),
                          (1, 1, by0), (1, -1, by1)):
        if len(pts) < 3:
            return None
        out = []
        m = len(pts)
        for i in range(m):
            px, py = pts[i]
            qx, qy = pts[(i + 1) % m]
            pv = px if axis == 0 else py
            qv = qx if axis == 0 else qy
            pin = sign * pv >= sign * c
            qin = sign * qv >= sign * c
            if pin:
                out.append((px, py))
            if pin != qin:
                if axis == 0:
                    den = qx - px
                    num = py * den + (qy - py) * (c - px)
                else:
                    den = qy - py
                    num = px * den + (qx - px) * (c - py)
                if den < 0:
                    num, den = -num, -den
                r = _rnd_div(num, den)
                out.append((c, r) if axis == 0 else (r, c))
        pts = out
    if len(pts) < 3:
        return None
    pts = [p for i, p in enumerate(pts) if p != pts[i - 1]]
    if len(pts) < 3 or shoelace2(pts) == 0:
        return None
    return pts


def shoelace2(ring) -> int:
    """Twice the signed area (surveyor's formula), exact int."""
    s = 0
    m = len(ring)
    for i in range(m):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % m]
        s += int(x0) * int(y1) - int(x1) * int(y0)
    return s


def _next_idx(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    nxt = np.arange(1, int(lens.sum()) + 1, dtype=np.int64)
    ends = starts + lens
    nxt[ends - 1] = starts
    return nxt


def clip_rings_np(xs, ys, lens, bx0, by0, bx1, by1):
    """Vectorized integer Sutherland–Hodgman over a BATCH of ring
    instances. ``xs/ys`` are the flattened vertices of all instances,
    ``lens[i]`` the vertex count of instance ``i``, and the box arrays
    are per-instance. Returns ``(keep_idx, out_xs, out_ys, out_lens,
    out_area2)`` where ``keep_idx`` maps surviving instances back to
    input positions — bit-identical to ``clip_ring`` per instance."""
    xs = np.asarray(xs, np.int64)
    ys = np.asarray(ys, np.int64)
    lens = np.asarray(lens, np.int64)
    boxes = [np.asarray(b, np.int64) for b in (bx0, by0, bx1, by1)]
    idx = np.arange(len(lens), dtype=np.int64)

    def _filter(keepr, xs, ys, lens, idx):
        vkeep = np.repeat(keepr, lens)
        return xs[vkeep], ys[vkeep], lens[keepr], idx[keepr]

    keepr = lens >= 3
    xs, ys, lens, idx = _filter(keepr, xs, ys, lens, idx)

    for axis, sign, bsel in ((0, 1, 0), (0, -1, 2), (1, 1, 1), (1, -1, 3)):
        if len(lens) == 0:
            break
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        nxt = _next_idx(starts, lens)
        rid = np.repeat(np.arange(len(lens)), lens)
        c = boxes[bsel][idx][rid]
        v = xs if axis == 0 else ys
        pin = sign * v >= sign * c
        qin = pin[nxt]
        emit_i = pin != qin
        cnt = pin.astype(np.int64) + emit_i
        pos = np.cumsum(cnt) - cnt
        total = int(cnt.sum())
        ox = np.empty(total, np.int64)
        oy = np.empty(total, np.int64)
        ox[pos[pin]] = xs[pin]
        oy[pos[pin]] = ys[pin]
        si = np.flatnonzero(emit_i)
        if len(si):
            ipos = pos[si] + pin[si]
            px, py = xs[si], ys[si]
            qx, qy = xs[nxt[si]], ys[nxt[si]]
            cc = c[si]
            if axis == 0:
                den = qx - px
                num = py * den + (qy - py) * (cc - px)
            else:
                den = qy - py
                num = px * den + (qx - px) * (cc - py)
            neg = den < 0
            num = np.where(neg, -num, num)
            den = np.where(neg, -den, den)
            r = (2 * num + den) // (2 * den)
            ox[ipos] = np.where(axis == 0, cc, r)
            oy[ipos] = np.where(axis == 0, r, cc)
        newlens = np.add.reduceat(cnt, starts) if len(starts) else cnt[:0]
        keepr = newlens >= 3
        xs, ys, lens, idx = _filter(keepr, ox, oy, newlens, idx)

    if len(lens) == 0:
        e = np.empty(0, np.int64)
        return e, e, e, e, e

    # cyclic consecutive-duplicate removal
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    ends = starts + lens
    prv = np.arange(-1, int(lens.sum()) - 1, dtype=np.int64)
    prv[starts] = ends - 1
    keepv = (xs != xs[prv]) | (ys != ys[prv])
    newlens = np.add.reduceat(keepv.astype(np.int64), starts)
    xs, ys = xs[keepv], ys[keepv]
    keepr = newlens >= 3
    vkeep = np.repeat(keepr, newlens)
    xs, ys, lens, idx = xs[vkeep], ys[vkeep], newlens[keepr], idx[keepr]

    if len(lens) == 0:
        e = np.empty(0, np.int64)
        return e, e, e, e, e

    # exact twice-signed-area; zero-area instances die here
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    nxt = _next_idx(starts, lens)
    cross = xs * ys[nxt] - xs[nxt] * ys
    area2 = np.add.reduceat(cross, starts)
    keepr = area2 != 0
    vkeep = np.repeat(keepr, lens)
    return (idx[keepr], xs[vkeep], ys[vkeep], lens[keepr], area2[keepr])


# ------------------------------------------------------------ rendering
def _orient(ring: list, want_positive: bool, area2: int) -> list:
    """Normalize ring winding to the MVT spec rule (exterior positive
    surveyor area, interior negative) keeping the first vertex fixed —
    so normalization is invariant to the input's winding."""
    if (area2 > 0) == want_positive:
        return ring
    return [ring[0]] + ring[:0:-1]


def polygon_layer_bytes(features, name: str = "polys",
                        extent: int = 4096) -> bytes:
    """Serialize ``[(poly_id, [(area2, ring), ...])]`` (ring 0 first =
    exterior, already sorted by poly_id, invisible features already
    filtered — see ``visible_features``) as one MVT POLYGON layer with
    winding normalized to the spec rule."""
    feats = []
    for pid, rings in features:
        if not rings:
            continue
        parts = [_orient(rings[0][1], True, rings[0][0])]
        parts.extend(_orient(r, False, a2) for a2, r in rings[1:])
        feats.append(encode_feature(
            pid, POLYGON, encode_geometry(parts, POLYGON), []))
    return encode_tile([encode_layer(name, feats, [], [], extent=extent)])


# ------------------------------------------------------------- operator
def polygon_tiles(
    vertices: DataFrame,
    res: int = 3,
    extent: int = 4096,
    id_col: str = "poly_id",
    ring_col: str = "ring",
    order_col: str = "pos",
    lon_col: str = "lon",
    lat_col: str = "lat",
    layer: str = "polys",
    max_tiles_per_ring: int = 4096,
) -> DataFrame:
    """Per-polygon ordered ring vertices (ring 0 = exterior, ring ≥ 1 =
    holes; closing vertex NOT repeated) → one MVT POLYGON tile per
    Morton tile the polygon touches at resolution ``res``. Returns
    ``(tile, n_features, n_rings, mvt)`` with byte-deterministic tiles.

    ``max_tiles_per_ring`` bounds the per-ring bbox fanout (a
    continent-sized polygon at deep zoom must be pre-cut upstream;
    exceeding the guard raises rather than silently exploding the
    shuffle)."""
    shift = (extent - 1).bit_length()
    if 1 << shift != extent:
        raise ValueError("extent must be a power of two")
    pix_res = res + shift
    if pix_res > C.MAX_RES:
        raise ValueError(f"res + log2(extent) must be <= {C.MAX_RES}")
    guard = int(max_tiles_per_ring)

    rings = (
        vertices.select(
            F.col(id_col).cast("long").alias("poly_id"),
            F.col(ring_col).cast("long").alias("ring"),
            F.col(order_col).cast("long").alias("pos"),
            C.lon_ix(F.col(lon_col), pix_res).alias("gx"),
            C.lat_iy(F.col(lat_col), pix_res).alias("gy"),
        )
        # group-key repartition: collect_list has no map-side reduction,
        # so this is the same single shuffle with full scan parallelism
        .repartition("poly_id", "ring")
        .groupBy("poly_id", "ring")
        .agg(F.sort_array(F.collect_list(
            F.struct("pos", "gx", "gy"))).alias("v"))
        .select(
            "poly_id", "ring",
            F.col("v.gx").alias("xs"), F.col("v.gy").alias("ys"))
    )

    import pandas as pd

    def clip_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lens = pdf["xs"].map(len).to_numpy(np.int64)
            fx = np.concatenate([np.asarray(v, np.int64)
                                 for v in pdf["xs"]]) if lens.sum() else \
                np.empty(0, np.int64)
            fy = np.concatenate([np.asarray(v, np.int64)
                                 for v in pdf["ys"]]) if lens.sum() else \
                np.empty(0, np.int64)
            vstarts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # per-ring tile bbox on the pixel lattice
            rid_v = np.repeat(np.arange(len(pdf)), lens)
            tx_lo = np.full(len(pdf), np.iinfo(np.int64).max, np.int64)
            tx_hi = np.full(len(pdf), np.iinfo(np.int64).min, np.int64)
            ty_lo = tx_lo.copy()
            ty_hi = tx_hi.copy()
            np.minimum.at(tx_lo, rid_v, fx >> shift)
            np.maximum.at(tx_hi, rid_v, fx >> shift)
            np.minimum.at(ty_lo, rid_v, fy >> shift)
            np.maximum.at(ty_hi, rid_v, fy >> shift)
            ntx = tx_hi - tx_lo + 1
            nt = ntx * (ty_hi - ty_lo + 1)
            if int(nt.max(initial=0)) > guard:
                raise ValueError(
                    f"ring bbox covers {int(nt.max())} tiles at res "
                    f"{res} > max_tiles_per_ring={guard}; pre-cut the "
                    "polygon or lower the resolution")
            # replicate each ring once per candidate tile
            inst_r = np.repeat(np.arange(len(pdf)), nt)
            offs = (np.arange(int(nt.sum()), dtype=np.int64)
                    - np.repeat(np.cumsum(nt) - nt, nt))
            tx = tx_lo[inst_r] + offs % ntx[inst_r]
            ty = ty_lo[inst_r] + offs // ntx[inst_r]
            ilens = lens[inst_r]
            vidx = (np.repeat(vstarts[inst_r], ilens)
                    + (np.arange(int(ilens.sum()), dtype=np.int64)
                       - np.repeat(np.cumsum(ilens) - ilens, ilens)))
            bx0 = tx << shift
            by0 = ty << shift
            keep, cxs, cys, clens, careas = clip_rings_np(
                fx[vidx], fy[vidx], ilens,
                bx0, by0, bx0 + extent - 1, by0 + extent - 1)
            if len(keep) == 0:
                continue
            tile = (C._spread_np(tx[keep])
                    | (C._spread_np(ty[keep]) << 1)).astype(np.int64)
            cstarts = np.concatenate(([0], np.cumsum(clens)[:-1]))
            ox = bx0[keep]
            oy = by0[keep]
            pids = pdf["poly_id"].to_numpy(np.int64)[inst_r[keep]]
            rids = pdf["ring"].to_numpy(np.int64)[inst_r[keep]]
            yield pd.DataFrame({
                "tile": tile,
                "poly_id": pids,
                "ring": rids,
                "area2": careas,
                "lxs": [
                    (cxs[s:s + n] - o).tolist()
                    for s, n, o in zip(cstarts, clens, ox)],
                "lys": [
                    (cys[s:s + n] - o).tolist()
                    for s, n, o in zip(cstarts, clens, oy)],
            })

    clipped = rings.mapInPandas(
        clip_batches,
        schema=("tile long, poly_id long, ring long, area2 long, "
                "lxs array<long>, lys array<long>"))

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = int(pdf["tile"].iloc[0])
        pdf = pdf.sort_values(["poly_id", "ring"], kind="mergesort")
        feats: list = []
        n_rings = 0
        for pid, grp in pdf.groupby("poly_id", sort=True):
            ring_ids = grp["ring"].tolist()
            if ring_ids[0] != 0:
                continue  # exterior clipped away entirely
            rings = [
                (int(a2), list(zip((int(x) for x in lx),
                                   (int(y) for y in ly))))
                for a2, lx, ly in zip(grp["area2"], grp["lxs"], grp["lys"])
            ]
            # invisible inside this tile: a hole exactly fills the
            # exterior's clipped area (both clip to the same region)
            if abs(rings[0][0]) - sum(abs(a2) for a2, _r in rings[1:]) == 0:
                continue
            feats.append((int(pid), rings))
            n_rings += len(rings)
        buf = polygon_layer_bytes(feats, name=layer, extent=extent)
        return pd.DataFrame(
            [(tile, len(feats), n_rings, buf)],
            columns=["tile", "n_features", "n_rings", "mvt"])

    return clipped.groupBy("tile").applyInPandas(
        render,
        schema="tile long, n_features long, n_rings long, mvt binary")
