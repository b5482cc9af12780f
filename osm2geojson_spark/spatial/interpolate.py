"""Inverse-distance-weighted (IDW) spatial interpolation — scattered
samples to a smoothed raster, the surface-modeling operator (sensor
fields, elevation, signal-strength maps).

Semantics: every OCCUPIED grid cell at resolution ``res`` gets the
IDW estimate of its center from all samples in its 3×3 cell
neighborhood, weight = 1/(d² + eps). Estimating at occupied cells keeps
the operator output-bounded by the data (a raster of the whole world
would be mostly empty); the 3×3 stencil makes the support explicit and
the explode factor constant.

Scale shape: each sample explodes to ≤9 candidate target cells
(constant fan-out, pure codegen), one equi-join on the occupied-cell
set filters dead cells, and ONE shuffle groups candidates by target.
No KNN search, no theta join, no driver collect.

Determinism: float weight sums are order-sensitive, so per cell the
(weight, weight·value) pairs are collected, sorted by sample id, and
folded LEFT-TO-RIGHT with ``F.aggregate`` — the same fold DuckDB
replays with ``list_reduce`` — making the doubles bit-exact across
engines and partitionings (the ``trajectory_stats`` discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.functions import cells as C

__all__ = ["idw_smooth"]


def idw_smooth(
    points: DataFrame,
    value_col: str = "v",
    res: int = 6,
    eps: float = 1e-12,
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_col: str = "sample_id",
) -> DataFrame:
    """→ ``(cell, ix, iy, n_samples, idw)`` per occupied cell at
    ``res``. ``order_col`` must be a unique sample key — it pins the
    fold order that makes the float output deterministic."""
    n = 1 << res
    ix = C.lon_ix(F.col(lon_col), res)
    iy = C.lat_iy(F.col(lat_col), res)
    samples = points.select(
        F.col(order_col).alias("o"),
        F.col(lon_col).alias("x"),
        F.col(lat_col).alias("y"),
        F.col(value_col).cast("double").alias("v"),
        ix.alias("six"),
        iy.alias("siy"),
    )
    occupied = samples.select(
        F.col("six").alias("tix"), F.col("siy").alias("tiy")).distinct()

    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    cand = (
        samples.select("o", "x", "y", "v", F.explode(offs).alias("of"),
                       "six", "siy")
        .select(
            "o", "x", "y", "v",
            (F.col("six") + F.col("of.dx")).alias("tix"),
            (F.col("siy") + F.col("of.dy")).alias("tiy"),
        )
        .where((F.col("tix") >= 0) & (F.col("tix") < n)
               & (F.col("tiy") >= 0) & (F.col("tiy") < n))
        .join(occupied, ["tix", "tiy"])
    )

    # target-center coordinates and weights — expression shapes mirror
    # the SQL twin token-for-token so the doubles agree bit-for-bit
    cx = ((F.col("tix").cast("double") + F.lit(0.5)) / F.lit(float(n))) \
        * F.lit(360.0) - F.lit(180.0)
    cy = ((F.col("tiy").cast("double") + F.lit(0.5)) / F.lit(float(n))) \
        * F.lit(180.0) - F.lit(90.0)
    dx = F.col("x") - cx
    dy = F.col("y") - cy
    w = F.lit(1.0) / ((dx * dx + dy * dy) + F.lit(float(eps)))
    weighted = cand.select(
        "tix", "tiy", "o", w.alias("w"), (w * F.col("v")).alias("wv"))

    g = weighted.groupBy("tix", "tiy").agg(
        F.array_sort(F.collect_list(F.struct("o", "w", "wv"))).alias("arr"))
    # left fold in sample-id order: sw = ((w1+w2)+w3)..., same for wv —
    # exactly what DuckDB's list_reduce produces over the ORDER BY list
    acc0 = F.struct(F.lit(0.0).alias("w"), F.lit(0.0).alias("wv"))
    folded = F.aggregate(
        F.col("arr"), acc0,
        lambda a, e: F.struct(
            (a["w"] + e["w"]).alias("w"), (a["wv"] + e["wv"]).alias("wv")),
    )
    staged = g.select(
        "tix", "tiy", F.size("arr").alias("n_samples"),
        folded.alias("f"))
    return staged.select(
        C.cell_from_ixiy(F.col("tix"), F.col("tiy")).alias("cell"),
        "tix", "tiy",
        F.col("n_samples").cast("long").alias("n_samples"),
        (F.col("f.wv") / F.col("f.w")).alias("idw"),
    )
