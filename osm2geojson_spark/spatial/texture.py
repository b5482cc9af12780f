"""Gray-level co-occurrence matrices (GLCM) over tiled rasters.

The Haralick texture substrate (contrast / energy / homogeneity all
derive from it): counts of quantized value pairs at offset (1,0) and
(0,1). Distributed shape: each tile needs only a 1-wide strip from
its RIGHT / BOTTOM neighbor (the `spatial/ncc.py` one-sided halo at
margin 1), the kernel bincounts level pairs locally, and the global
matrix is a groupBy-sum of L² partials per direction — the shuffle
is bounded by tiles·L², independent of raster size. Quantization is
pure integer: ``level = (v - lo)·L div (hi - lo + 1)`` clamped to
[0, L), exactly reproducible in SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["glcm_tiles", "edge_orientation_hist", "harris_response"]


def glcm_tiles(tiles: DataFrame, tile_size: int, grid_w: int, grid_h: int,
               levels: int = 8, lo: int = 0, hi: int = 255) -> DataFrame:
    """``(tx, ty, data array<long>)`` tiles → global co-occurrence
    counts ``(dir, la, lb, cnt)`` for dir 0 = (1,0) right and
    dir 1 = (0,1) below, values quantized to ``levels`` bins over
    ``[lo, hi]`` (out-of-range values clamp). Pairs are ordered
    (anchor, neighbor) — build the symmetric matrix downstream by
    adding the transpose."""
    t, lv = int(tile_size), int(levels)
    lo, hi = int(lo), int(hi)
    if lv < 2 or hi < lo:
        raise ValueError("levels >= 2 and hi >= lo required")
    gw, gh = int(grid_w), int(grid_h)
    w_px, h_px = gw * t, gh * t

    import pandas as pd

    def emit(batches):
        for pdf in batches:
            out = []
            for tx, ty, data in zip(pdf["tx"], pdf["ty"], pdf["data"]):
                a = np.asarray(data, np.int64).reshape(t, t)
                tx, ty = int(tx), int(ty)
                out.append((tx, ty, 0, list(data)))
                if tx > 0:
                    out.append((tx - 1, ty, 1, a[:, 0].tolist()))
                if ty > 0:
                    out.append((tx, ty - 1, 2, a[0, :].tolist()))
            yield pd.DataFrame(
                out, columns=["tx", "ty", "part", "payload"])

    halo = tiles.mapInPandas(
        emit, schema="tx long, ty long, part int, payload array<long>")

    span = hi - lo + 1

    def quant(a):
        return np.clip((a - lo) * lv // span, 0, lv - 1)

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        parts = {int(p): np.asarray(v, np.int64)
                 for p, v in zip(pdf["part"], pdf["payload"])}
        p = np.zeros((t + 1, t + 1), dtype=np.int64)
        p[:t, :t] = parts[0].reshape(t, t)
        if 1 in parts:
            p[:t, t] = parts[1]
        if 2 in parts:
            p[t, :t] = parts[2]
        q = quant(p)
        rows = []
        # valid anchors: pair stays inside the raster
        ncr = min(t, w_px - 1 - tx * t)   # anchors with a right neighbor
        ncb = min(t, h_px - 1 - ty * t)   # anchors with a below neighbor
        for d, (aa, bb) in enumerate((
                (q[:t, :ncr], q[:t, 1:ncr + 1]),
                (q[:ncb, :t], q[1:ncb + 1, :t]))):
            if aa.size == 0:
                continue
            flat = np.bincount(
                (aa * lv + bb).ravel(), minlength=lv * lv)
            nz = np.nonzero(flat)[0]
            rows.extend((d, int(i) // lv, int(i) % lv, int(flat[i]))
                        for i in nz)
        return pd.DataFrame(rows, columns=["dir", "la", "lb", "cnt"])

    partials = (halo.groupBy("tx", "ty")
                .applyInPandas(assemble, schema="dir int, la int, lb int, "
                                                "cnt long"))
    return (partials.groupBy("dir", "la", "lb")
            .agg(F.sum("cnt").alias("cnt")))


def edge_orientation_hist(tiles: DataFrame, tile_size: int,
                          grid_w: int, grid_h: int) -> DataFrame:
    """HOG-style edge-orientation census over a tiled raster: per
    pixel the clamped central differences gx = f(x+1,y) − f(x−1,y),
    gy = f(x,y+1) − f(x,y−1), bucketed into 8 octants by an EXACT
    integer comparison ladder (no atan2 — sign tests + |gy| vs |gx|,
    ties resolved by the documented first-match order; zero gradient
    → bucket 8 "flat"), rolled up to ``(sector, n, mag2_sum)`` with
    mag2 = gx² + gy². Halo: the 4 EDGE strips only (central
    differences need no corners) — one bounded shuffle, then ≤ 9
    partial rows per tile groupBy-summed. The ladder, in order:
    flat; gy≥0: (gx>0: |gy|<|gx| → 0 else 1), (gx=0 → 2),
    (gx<0: |gy|≥|gx| → 2 else 3); gy<0: (gx<0: |gy|<|gx| → 4 else
    5), (gx=0 → 6), (gx>0: |gy|≥|gx| → 6 else 7)."""
    t = int(tile_size)
    gw, gh = int(grid_w), int(grid_h)

    import pandas as pd

    def emit(batches):
        for pdf in batches:
            out = []
            for tx, ty, data in zip(pdf["tx"], pdf["ty"], pdf["data"]):
                a = np.asarray(data, np.int64).reshape(t, t)
                tx, ty = int(tx), int(ty)
                out.append((tx, ty, 4, list(data)))
                if tx > 0:
                    out.append((tx - 1, ty, 5, a[:, 0].tolist()))
                if tx < gw - 1:
                    out.append((tx + 1, ty, 3, a[:, -1].tolist()))
                if ty > 0:
                    out.append((tx, ty - 1, 7, a[0, :].tolist()))
                if ty < gh - 1:
                    out.append((tx, ty + 1, 1, a[-1, :].tolist()))
            yield pd.DataFrame(
                out, columns=["tx", "ty", "part", "payload"])

    halo = tiles.mapInPandas(
        emit, schema="tx long, ty long, part int, payload array<long>")

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        parts = {int(p): np.asarray(v, np.int64)
                 for p, v in zip(pdf["part"], pdf["payload"])}
        c = parts[4].reshape(t, t)
        p = np.empty((t + 2, t + 2), dtype=np.int64)
        p[1:-1, 1:-1] = c
        # edge replication == the coordinate clamp; neighbor strips
        # override where a neighbor exists
        p[1:-1, 0] = parts[3] if 3 in parts else c[:, 0]
        p[1:-1, -1] = parts[5] if 5 in parts else c[:, -1]
        p[0, 1:-1] = parts[1] if 1 in parts else c[0, :]
        p[-1, 1:-1] = parts[7] if 7 in parts else c[-1, :]
        gx = p[1:-1, 2:] - p[1:-1, :-2]
        gy = p[2:, 1:-1] - p[:-2, 1:-1]
        ax, ay = np.abs(gx), np.abs(gy)
        sector = np.select(
            [(gx == 0) & (gy == 0),
             (gy >= 0) & (gx > 0) & (ay < ax),
             (gy >= 0) & (gx > 0),
             (gy >= 0) & (gx == 0),
             (gy >= 0) & (ay >= ax),
             (gy >= 0),
             (gy < 0) & (gx < 0) & (ay < ax),
             (gy < 0) & (gx < 0),
             (gy < 0) & (gx == 0),
             (gy < 0) & (ay >= ax)],
            [8, 0, 1, 2, 2, 3, 4, 5, 6, 6], default=7).ravel()
        mag2 = (gx * gx + gy * gy).ravel()
        n = np.bincount(sector, minlength=9)
        # np.bincount weights are float64 — sum mag2 in int64 instead
        m_int = np.zeros(9, dtype=np.int64)
        np.add.at(m_int, sector, mag2)
        rows = [(int(s), int(n[s]), int(m_int[s]))
                for s in range(9) if n[s]]
        return pd.DataFrame(rows, columns=["sector", "n", "mag2_sum"])

    partials = (halo.groupBy("tx", "ty")
                .applyInPandas(assemble,
                               schema="sector int, n long, mag2_sum long"))
    return (partials.groupBy("sector")
            .agg(F.sum("n").alias("n"),
                 F.sum("mag2_sum").alias("mag2_sum")))


def harris_response(tiles: DataFrame, tile_size: int,
                    grid_w: int, grid_h: int) -> DataFrame:
    """Harris-Stephens corner response over a tiled raster, exact in
    int64: per pixel the structure tensor's 3×3 box sums Sxx, Syy,
    Sxy of clamped central-difference gradient products, and
    ``resp = 20·(Sxx·Syy − Sxy²) − (Sxx + Syy)²`` — the classic
    k = 0.05 scaled through by 20 so the detector stays integral
    (corners: resp ≫ 0; edges: resp < 0). ONE halo pass at margin 2
    (gradients need ±1, the window another ±1); output restricted to
    pixels whose 3×3 window lies fully inside the raster — the
    unambiguous valid-mode convention (gradients at window cells
    still use clamped differences, so raster-edge-adjacent windows
    are exact, not approximate). Rows: (x, y, sxx, syy, sxy, resp)."""
    t = int(tile_size)
    gw, gh = int(grid_w), int(grid_h)
    w_px, h_px = gw * t, gh * t
    m = 2

    import pandas as pd

    def emit(batches):
        for pdf in batches:
            out = []
            for tx, ty, data in zip(pdf["tx"], pdf["ty"], pdf["data"]):
                a = np.asarray(data, np.int64).reshape(t, t)
                tx, ty = int(tx), int(ty)
                out.append((tx, ty, 4, list(data)))
                for sdy in (-1, 0, 1):
                    for sdx in (-1, 0, 1):
                        if sdx == 0 and sdy == 0:
                            continue
                        rx, ry = tx - sdx, ty - sdy
                        if not (0 <= rx < gw and 0 <= ry < gh):
                            continue
                        ys = slice(None) if sdy == 0 else (
                            slice(0, m) if sdy == 1 else slice(t - m, t))
                        xs = slice(None) if sdx == 0 else (
                            slice(0, m) if sdx == 1 else slice(t - m, t))
                        out.append((rx, ry, (sdy + 1) * 3 + (sdx + 1),
                                    a[ys, xs].ravel().tolist()))
            yield pd.DataFrame(
                out, columns=["tx", "ty", "part", "payload"])

    halo = tiles.mapInPandas(
        emit, schema="tx long, ty long, part int, payload array<long>")

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        parts = {int(p): np.asarray(v, np.int64)
                 for p, v in zip(pdf["part"], pdf["payload"])}
        p = np.zeros((t + 2 * m, t + 2 * m), dtype=np.int64)
        p[m:-m, m:-m] = parts[4].reshape(t, t)
        shapes = {0: (m, m), 1: (m, t), 2: (m, m), 3: (t, m),
                  5: (t, m), 6: (m, m), 7: (m, t), 8: (m, m)}
        sl = {0: (slice(0, m), slice(0, m)),
              1: (slice(0, m), slice(m, -m)),
              2: (slice(0, m), slice(-m, None)),
              3: (slice(m, -m), slice(0, m)),
              5: (slice(m, -m), slice(-m, None)),
              6: (slice(-m, None), slice(0, m)),
              7: (slice(-m, None), slice(m, -m)),
              8: (slice(-m, None), slice(-m, None))}
        for code, (ys, xs) in sl.items():
            if code in parts:
                p[ys, xs] = parts[code].reshape(shapes[code])
        # raster-boundary clamp = edge replication of the VALUE raster
        if ty == 0:
            p[:m, :] = p[m, :]
        if ty == gh - 1:
            p[-m:, :] = p[-m - 1, :]
        if tx == 0:
            p[:, :m] = p[:, [m]]
        if tx == gw - 1:
            p[:, -m:] = p[:, [-m - 1]]
        # gradients on the ±1 region around the tile
        q = p[1:-1, 1:-1]  # (t+2)²; tile pixel (r,c) at q[r+1, c+1]
        gx = p[1:-1, 2:] - p[1:-1, :-2]
        gy = p[2:, 1:-1] - p[:-2, 1:-1]
        # 3×3 box sums of products, valid for the t² tile anchors
        def box3(a):
            s = np.zeros((t, t), dtype=np.int64)
            for dy in (0, 1, 2):
                for dx in (0, 1, 2):
                    s += a[dy:dy + t, dx:dx + t]
            return s
        sxx, syy, sxy = box3(gx * gx), box3(gy * gy), box3(gx * gy)
        resp = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
        ys_, xs_ = np.mgrid[0:t, 0:t]
        gxs = tx * t + xs_
        gys = ty * t + ys_
        keep = ((gxs >= 1) & (gxs <= w_px - 2)
                & (gys >= 1) & (gys <= h_px - 2)).ravel()
        _ = q  # documented coordinate frame
        return pd.DataFrame({
            "x": gxs.ravel()[keep], "y": gys.ravel()[keep],
            "sxx": sxx.ravel()[keep], "syy": syy.ravel()[keep],
            "sxy": sxy.ravel()[keep], "resp": resp.ravel()[keep]})

    return (halo.groupBy("tx", "ty")
            .applyInPandas(assemble,
                           schema="x long, y long, sxx long, syy long, "
                                  "sxy long, resp long"))
