"""Hausdorff distance between geometries — the trajectory/shape
similarity measure (map-matching QA, duplicate-geometry detection,
cross-source conflation).

GRAFT extension (no reference analog). Exact integer semantics: the
SQUARED symmetric Hausdorff distance on int-lattice coordinates —
``max(h(A,B), h(B,A))`` with ``h(A,B) = max_{a∈A} min_{b∈B} d²(a,b)``
— all mul/add int64, no sqrt (the knn/measures discipline: ranking and
thresholds work on squared values; callers take one sqrt at the edge if
they must display meters).

Scale shape: geometries collapse to per-object point ARRAYS once
(bounded geometry size — the same contract as way assembly), candidate
pairs come from a cell/MBR prefilter upstream, and the O(|A|·|B|)
min/max double loop runs JVM-side as nested higher-order functions on
the joined arrays — zero Python, zero per-pair shuffle. The DuckDB twin
deliberately takes the OTHER route (unnest → cross join within pair →
GROUP BY min → GROUP BY max) so the match pins semantics, not code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["collect_geoms", "directed_hausdorff_sq", "hausdorff_pairs"]


def collect_geoms(pts: DataFrame, id_col: str = "obj_id",
                  seq_col: str = "seq", x_col: str = "x",
                  y_col: str = "y") -> DataFrame:
    """(obj, seq, x, y) point rows → (obj, pts array<struct<x,y>>) in
    seq order. One groupBy; repartition by the group key first when the
    scan has few splits (the way_assembly lesson — collect_list has no
    map-side reduction)."""
    return (pts.groupBy(F.col(id_col).alias("obj_id"))
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct(
                    F.col(seq_col).alias("seq"),
                    F.col(x_col).alias("x"),
                    F.col(y_col).alias("y")))),
                lambda s: F.struct(s["x"].alias("x"), s["y"].alias("y")))
                .alias("pts")))


def directed_hausdorff_sq(pa: Column, pb: Column) -> Column:
    """max over a∈pa of (min over b∈pb of d²(a,b)) as nested JVM HOFs.
    int64 throughout; requires non-empty arrays."""
    big = F.lit(1 << 62).cast("long")

    def min_d2(a):
        return F.aggregate(
            pb, big,
            lambda acc, b: F.least(
                acc,
                (a["x"] - b["x"]) * (a["x"] - b["x"])
                + (a["y"] - b["y"]) * (a["y"] - b["y"])))

    return F.aggregate(
        F.transform(pa, min_d2),
        F.lit(0).cast("long"), lambda acc, v: F.greatest(acc, v))


def hausdorff_pairs(geoms: DataFrame, pairs: DataFrame) -> DataFrame:
    """Symmetric squared Hausdorff for candidate pairs.

    ``geoms``: (obj_id, pts) from :func:`collect_geoms`; ``pairs``:
    (id_a, id_b). Returns (id_a, id_b, h_ab, h_ba, h_sq) with
    ``h_sq = max`` of the two directed values. Both joins are id-keyed;
    broadcast-ability follows the usual size guard upstream."""
    ga = geoms.select(F.col("obj_id").alias("id_a"),
                      F.col("pts").alias("pa"))
    gb = geoms.select(F.col("obj_id").alias("id_b"),
                      F.col("pts").alias("pb"))
    j = pairs.join(ga, "id_a").join(gb, "id_b")
    h_ab = directed_hausdorff_sq(F.col("pa"), F.col("pb"))
    h_ba = directed_hausdorff_sq(F.col("pb"), F.col("pa"))
    return (j.select("id_a", "id_b",
                     h_ab.alias("h_ab"), h_ba.alias("h_ba"))
            .withColumn("h_sq", F.greatest("h_ab", "h_ba")))
