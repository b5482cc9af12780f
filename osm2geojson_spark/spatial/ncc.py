"""Template matching over tiled rasters — exact integer NCC moments.

Normalized cross-correlation is the classic template detector; at
continental-raster scale the textbook sliding-window scan doesn't
exist, but the distributed shape is the same halo discipline as
`spatial/focal.py`: the template (a SMALL constant, broadcast inside
the kernel closure) anchors top-left at every pixel whose h×w window
lies fully inside the raster, so each tile only needs (th-1)/(tw-1)
wide strips from its RIGHT / BOTTOM / BOTTOM-RIGHT neighbors — one
uniform bounded shuffle, no global state.

Everything stays in int64: per anchor the kernel emits

    cross = Σ f·t            (the correlation numerator's raw term)
    sf    = Σ f              (window sum of the raster)
    sf2   = Σ f²             (window sum of squares)

from which NCC's exact rational pieces are pure column arithmetic:
``num = n·cross − sf·Σt`` and ``denf = n·sf2 − sf²`` (n, Σt, Σt²
are template constants) — ``num² / (denf·dent)`` is NCC², compared
cross-multiplied, never divided. Window sums come from a LOCAL
summed-area table of the padded tile (O(1) per anchor); Σf·t is the
direct 16-shift accumulation (th·tw full-array adds, numpy-side).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

__all__ = ["match_template_tiles"]


def match_template_tiles(tiles: DataFrame, tile_size: int,
                         template: np.ndarray,
                         grid_w: int, grid_h: int) -> DataFrame:
    """``(tx, ty, data array<long>)`` row-major tiles → per-anchor
    rows ``(x, y, cross, sf, sf2)`` for every pixel (x, y) whose
    template-shaped window fits inside the raster (valid-mode
    correlation, the unambiguous convention). Template height/width
    must be ≤ tile_size."""
    t = int(tile_size)
    tmpl = np.asarray(template, np.int64)
    th, tw = tmpl.shape
    if not (1 <= th <= t and 1 <= tw <= t):
        raise ValueError("template must fit inside one tile")
    gw, gh = int(grid_w), int(grid_h)
    w_px, h_px = gw * t, gh * t
    my, mx = th - 1, tw - 1  # halo margins down / right

    import pandas as pd

    def emit(batches):
        for pdf in batches:
            out = []
            for tx, ty, data in zip(pdf["tx"], pdf["ty"], pdf["data"]):
                a = np.asarray(data, np.int64).reshape(t, t)
                tx, ty = int(tx), int(ty)
                out.append((tx, ty, 0, list(data)))
                # right (1), bottom (2), bottom-right (3) strips only
                if mx and tx > 0:
                    out.append((tx - 1, ty, 1, a[:, :mx].ravel().tolist()))
                if my and ty > 0:
                    out.append((tx, ty - 1, 2, a[:my, :].ravel().tolist()))
                if mx and my and tx > 0 and ty > 0:
                    out.append((tx - 1, ty - 1, 3,
                                a[:my, :mx].ravel().tolist()))
            yield pd.DataFrame(
                out, columns=["tx", "ty", "part", "payload"])

    halo = tiles.mapInPandas(
        emit, schema="tx long, ty long, part int, payload array<long>")

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        parts = {int(p): np.asarray(v, np.int64)
                 for p, v in zip(pdf["part"], pdf["payload"])}
        p = np.zeros((t + my, t + mx), dtype=np.int64)
        p[:t, :t] = parts[0].reshape(t, t)
        if 1 in parts:
            p[:t, t:] = parts[1].reshape(t, mx)
        if 2 in parts:
            p[t:, :t] = parts[2].reshape(my, t)
        if 3 in parts:
            p[t:, t:] = parts[3].reshape(my, mx)
        # valid anchors within this tile: window fully inside raster
        nr = min(t, h_px - my - ty * t)
        nc = min(t, w_px - mx - tx * t)
        if nr <= 0 or nc <= 0:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64")
                 for c in ("x", "y", "cross", "sf", "sf2")})
        cross = np.zeros((nr, nc), dtype=np.int64)
        for dy in range(th):
            for dx in range(tw):
                if tmpl[dy, dx]:
                    cross += tmpl[dy, dx] * p[dy:dy + nr, dx:dx + nc]
        # local SAT (exclusive zero margin) → O(1) anchored window sums
        def anchored(arr):
            z = np.zeros((t + my + 1, t + mx + 1), dtype=np.int64)
            np.cumsum(np.cumsum(arr, axis=0), axis=1, out=z[1:, 1:])
            return (z[th:th + nr, tw:tw + nc] - z[:nr, tw:tw + nc]
                    - z[th:th + nr, :nc] + z[:nr, :nc])
        sf = anchored(p)
        sf2 = anchored(p * p)
        ys, xs = np.mgrid[0:nr, 0:nc]
        return pd.DataFrame({
            "x": (tx * t + xs).ravel(), "y": (ty * t + ys).ravel(),
            "cross": cross.ravel(), "sf": sf.ravel(),
            "sf2": sf2.ravel()})

    return (halo.groupBy("tx", "ty")
            .applyInPandas(assemble, schema="x long, y long, cross long, "
                                            "sf long, sf2 long"))
