"""Planar geometry measures as fold-exact column functions.

The ST_Area / ST_Centroid / ST_Perimeter / ST_Envelope surface over
rings stored as ordered integer-lattice vertex arrays (microdegrees or
pixels — any int64 lattice). osm2geojson computes areas/winding with
the shoelace formula on assembled rings (`OsmEntityHandler.java`'s
polygon handling); these are the same measures as first-class Spark
columns.

Cross-engine determinism contract (the repo's oracle rules):

- ``ring_area2`` is a pure int64 left fold — EXACT, no floats; twice
  the signed area so callers choose the division.
- centroid numerators and the perimeter are LEFT-TO-RIGHT ``F.
  aggregate`` folds over the edge array — DuckDB replays the identical
  fold with ``list_reduce``, so the doubles match bit-for-bit even
  where products exceed 2^53 (same IEEE ops, same order).
- ``sqrt`` is IEEE-correctly-rounded everywhere, so edge lengths are
  safe; trig is not used (libm drift — see queries.py rules).

All folds run over ONE materialized ``edges`` column (see
``ring_edges``): HOF lambdas do not CSE captured expressions, so
folding over a freshly-built array expression would rebuild it per
element (the O(L²) pitfall from round 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ring_edges",
    "ring_area2",
    "ring_perimeter",
    "ring_centroid",
    "ring_bbox",
    "ring_measures",
]


def ring_edges(v: Column | str) -> Column:
    """Ordered vertex array<struct<x,y>> (closing vertex NOT repeated)
    → the cyclic edge array<struct<p, q>>. Materialize this once
    (``withColumn``) before applying the folds below."""
    v = F.col(v) if isinstance(v, str) else v
    n = F.size(v)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.element_at(v, i).alias("p"),
            F.element_at(v, (i % n) + 1).alias("q")))


def _cross(e: Column) -> Column:
    return e["p"]["x"] * e["q"]["y"] - e["q"]["x"] * e["p"]["y"]


def ring_area2(edges: Column | str) -> Column:
    """Twice the signed shoelace area — exact int64 (positive = CCW)."""
    edges = F.col(edges) if isinstance(edges, str) else edges
    return F.aggregate(
        edges, F.lit(0).cast("long"), lambda acc, e: acc + _cross(e))


def ring_perimeter(edges: Column | str) -> Column:
    """Planar perimeter in lattice units — ordered double fold of
    IEEE-exact-rounded edge lengths."""
    edges = F.col(edges) if isinstance(edges, str) else edges

    def step(acc: Column, e: Column) -> Column:
        d2 = ((e["q"]["x"] - e["p"]["x"]) * (e["q"]["x"] - e["p"]["x"])
              + (e["q"]["y"] - e["p"]["y"]) * (e["q"]["y"] - e["p"]["y"]))
        return acc + F.sqrt(d2.cast("double"))

    return F.aggregate(edges, F.lit(0.0), step)


def ring_centroid(edges: Column | str, area2: Column | str) -> Column:
    """Polygon centroid struct<cx, cy> in lattice units: the standard
    cross-weighted vertex-mean. Numerator terms exceed 2^53 on a
    microdegree lattice, so they are computed as ORDERED double folds
    (bit-deterministic, not exact) and divided by 3·area2 once."""
    edges = F.col(edges) if isinstance(edges, str) else edges
    area2 = F.col(area2) if isinstance(area2, str) else area2

    def num(coord: str):
        def step(acc: Column, e: Column) -> Column:
            return acc + (
                (e["p"][coord] + e["q"][coord]).cast("double")
                * _cross(e).cast("double"))
        return F.aggregate(edges, F.lit(0.0), step)

    d = F.lit(3.0) * area2.cast("double")
    return F.struct(
        (num("x") / d).alias("cx"), (num("y") / d).alias("cy"))


def ring_bbox(v: Column | str) -> Column:
    """struct<min_x, min_y, max_x, max_y> — exact int64."""
    v = F.col(v) if isinstance(v, str) else v
    xs = F.transform(v, lambda p: p["x"])
    ys = F.transform(v, lambda p: p["y"])
    return F.struct(
        F.array_min(xs).alias("min_x"), F.array_min(ys).alias("min_y"),
        F.array_max(xs).alias("max_x"), F.array_max(ys).alias("max_y"))


def ring_measures(
    vertices: DataFrame,
    id_cols: tuple = ("poly_id", "ring"),
    order_col: str = "pos",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-ring measures over a vertex table (id..., pos, x, y int64):
    one group-key shuffle assembles each ring, then every measure is a
    codegen fold — no UDFs, no second shuffle. Returns
    ``(*id_cols, n_vertices, area2, perimeter, cx, cy, min_x, min_y,
    max_x, max_y)``."""
    keys = list(id_cols)
    rings = (
        vertices.select(
            *[F.col(c) for c in keys],
            F.col(order_col).alias("pos"),
            F.col(x_col).cast("long").alias("x"),
            F.col(y_col).cast("long").alias("y"))
        .repartition(*keys)
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list(
            F.struct("pos", "x", "y"))).alias("vraw"))
        .withColumn("v", F.transform(
            "vraw", lambda s: F.struct(s["x"].alias("x"),
                                       s["y"].alias("y"))))
        .withColumn("edges", ring_edges("v"))
        .withColumn("area2", ring_area2("edges"))
    )
    return rings.select(
        *keys,
        F.size("v").alias("n_vertices"),
        "area2",
        ring_perimeter("edges").alias("perimeter"),
        ring_centroid("edges", "area2")["cx"].alias("cx"),
        ring_centroid("edges", "area2")["cy"].alias("cy"),
        ring_bbox("v")["min_x"].alias("min_x"),
        ring_bbox("v")["min_y"].alias("min_y"),
        ring_bbox("v")["max_x"].alias("max_x"),
        ring_bbox("v")["max_y"].alias("max_y"),
    )
