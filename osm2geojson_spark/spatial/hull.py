"""Distributed convex hull — the aggregate-geometry operator (coverage
footprints, viewport extents, cluster outlines).

Scale shape: convex hull is a classic ALGEBRAIC aggregate — the hull of
a union is the hull of the unions' hulls — so it distributes exactly
like a sum: stage 1 collapses every partition to its partial hull
(mapInPandas, ≤ a few dozen vertices out of millions of points), stage
2 merges the tiny partials (one shuffle of hull vertices only, never
raw points). A billion-point footprint costs one scan + a shuffle of
O(partitions × hull size) rows.

Exactness: all geometry is int64 cross products (callers pass integer
coordinates, e.g. microdegrees) — no floats anywhere, so the output is
engine-independent and the partial/merge path is provably identical to
a single-pass hull, which the tests pin against a Spark-free reference
(``pyref.ref_convex_hull``) under every partitioning.

Output is canonical: counter-clockwise, starting at the
lexicographically smallest (x, y) vertex, collinear points dropped —
one deterministic answer per point set.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["convex_hull", "monotone_chain"]


def monotone_chain(pts: list[tuple]) -> list[tuple]:
    """Andrew's monotone chain over integer coordinates: CCW hull
    starting at the smallest (x, y); strict turns only (collinear
    dropped). Pure Python ints — exact at any magnitude."""
    pts = sorted(set((int(x), int(y)) for x, y in pts))
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[tuple] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple] = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def convex_hull(
    points: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    group_col: str | None = None,
) -> DataFrame:
    """Convex hull of all points (or per ``group_col``) →
    ``(pos, x, y)`` rows (plus the group column), CCW from the smallest
    vertex. Coordinates are cast to long — pass integer units
    (microdegrees); floats would make the turn predicate inexact."""
    import pandas as pd

    gcols = [group_col] if group_col else []
    src = points.select(
        *gcols,
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )

    part_schema = (
        (f"{group_col} long, " if group_col else "") + "x long, y long")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if group_col:
                out = []
                for g, grp in pdf.groupby(group_col, sort=False):
                    for x, y in monotone_chain(
                            zip(grp["x"], grp["y"])):
                        out.append((g, x, y))
                yield pd.DataFrame(out, columns=[group_col, "x", "y"])
            else:
                hull = monotone_chain(zip(pdf["x"], pdf["y"]))
                yield pd.DataFrame(hull, columns=["x", "y"])

    partials = src.mapInPandas(partial, schema=part_schema)

    out_schema = (
        (f"{group_col} long, " if group_col else "") + "pos int, x long, y long")

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        hull = monotone_chain(zip(pdf["x"], pdf["y"]))
        if group_col:
            g = pdf[group_col].iloc[0]
            return pd.DataFrame(
                [(g, i, x, y) for i, (x, y) in enumerate(hull)],
                columns=[group_col, "pos", "x", "y"])
        return pd.DataFrame(
            [(i, x, y) for i, (x, y) in enumerate(hull)],
            columns=["pos", "x", "y"])

    if group_col:
        return partials.groupBy(group_col).applyInPandas(
            final, schema=out_schema)
    # global hull: the merge input is O(partitions × hull size) rows —
    # a single group is fine because the heavy lifting already happened
    return partials.groupBy(F.lit(0).alias("_g")).applyInPandas(
        lambda pdf: final(pdf), schema=out_schema)
