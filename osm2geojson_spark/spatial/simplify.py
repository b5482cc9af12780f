"""Geometry simplification (Ramer-Douglas-Peucker) — the per-zoom
pre-serving step of a tiling engine: ways keep their shape within a
tolerance while vertex counts (and tile payload bytes) drop.

Vectorized kernel: the point-to-segment distances for a whole span are
one numpy broadcast; the span recursion is an explicit stack (no Python
recursion limits on pathological chains). Spark wiring is an
Arrow-batched pandas UDF over the assembled ``nodes`` array — simplify
runs WHERE the geometry already is (no extra shuffle after assembly).

Public algorithm (Ramer '72 / Douglas-Peucker '73); planar perpendicular
distance, which is the standard choice for per-tile simplification where
coordinates are already projected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def rdp_mask(pts: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask for an (N,2) polyline under tolerance eps.
    Endpoints always kept; a point survives iff some retained span has it
    as its farthest-beyond-eps vertex."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n < 3:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        sub = pts[i + 1:j]
        l2 = float(seg @ seg)
        if l2 == 0.0:
            d = np.linalg.norm(sub - pts[i], axis=1)
        else:
            t = np.clip(((sub - pts[i]) @ seg) / l2, 0.0, 1.0)
            d = np.linalg.norm(sub - (pts[i] + t[:, None] * seg), axis=1)
        k = int(np.argmax(d))
        if float(d[k]) > eps:
            mid = i + 1 + k
            keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return keep


_OUT_T = T.ArrayType(T.StructType([
    T.StructField("lon", T.DoubleType()),
    T.StructField("lat", T.DoubleType()),
]))


def simplified_nodes_udf(tolerance: float):
    """pandas UDF: array<struct<…lon,lat…>> → simplified
    array<struct<lon,lat>> (subset of input vertices, order preserved)."""

    @F.pandas_udf(_OUT_T)
    def simp(nodes: pd.Series) -> pd.Series:
        out = []
        for arr in nodes:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            pts = np.asarray([[p["lon"], p["lat"]] for p in arr], dtype=np.float64)
            m = rdp_mask(pts, tolerance)
            out.append([{"lon": float(x), "lat": float(y)} for x, y in pts[m]])
        return pd.Series(out)

    return simp


def simplify_ways(assembled: DataFrame, tolerance: float,
                  nodes_col: str = "nodes") -> DataFrame:
    """Adds ``simple_nodes`` (RDP-simplified chain) + before/after vertex
    counts to an assembled-ways DataFrame."""
    simp = simplified_nodes_udf(tolerance)
    return assembled.withColumn("simple_nodes", simp(F.col(nodes_col))) \
        .withColumn("n_pts", F.size(nodes_col)) \
        .withColumn("n_simple", F.size("simple_nodes"))


def densify_paths(geoms: DataFrame, k: int,
                  id_col: str = "obj_id",
                  pts_col: str = "pts") -> DataFrame:
    """RDP's inverse — parameter-space densification: each segment
    (v_j → v_{j+1}) emits ``k`` points ``v_j + ((v_{j+1}−v_j)·i) div k``
    for i = 0..k−1, plus the final vertex (seq = j·k + i). The step a
    renderer/map-matcher runs before distance-based ops so long segments
    can't tunnel through cells.

    EXACT integer semantics with FLOOR division on signed deltas —
    Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors,
    so the engine computes ``(d − pmod(d, k)) div k`` (pmod ≥ 0), which
    equals floor division for every sign. All map-side JVM array algebra
    (two shifted slices zipped, nested transform, one flatten) — zero
    shuffle, zero Python; posexplode fans back to point rows.

    ``geoms``: (id, pts array<struct<x,y>>) from e.g.
    ``hausdorff.collect_geoms``. Single-point objects emit their one
    vertex. Returns (id, seq, x, y).
    """
    kk = int(k)
    if kk < 1:
        raise ValueError("k must be >= 1")

    def seg_points(a, b):
        # (d − pmod(d,k)) is divisible by k, so the double division is
        # exact (|d| « 2^53) and the long cast loses nothing
        def at(i):
            dx = (b["x"] - a["x"]) * i
            dy = (b["y"] - a["y"]) * i
            return F.struct(
                (a["x"] + (dx - ((dx % kk) + kk) % kk) / kk)
                .cast("long").alias("x"),
                (a["y"] + (dy - ((dy % kk) + kk) % kk) / kk)
                .cast("long").alias("y"))

        return F.transform(F.sequence(F.lit(0), F.lit(kk - 1)), at)

    pts = F.col(pts_col)
    n = F.size(pts)
    segs = F.zip_with(
        F.slice(pts, F.lit(1), n - 1),
        F.slice(pts, F.lit(2), n - 1),
        seg_points)
    last = F.array(F.element_at(pts, -1))
    dense = F.when(n >= 2, F.concat(F.flatten(segs), last)).otherwise(pts)
    return (geoms.select(F.col(id_col), F.posexplode(dense)
                         .alias("seq", "p"))
            .select(F.col(id_col), F.col("seq").cast("long").alias("seq"),
                    F.col("p.x").alias("x"), F.col("p.y").alias("y")))
