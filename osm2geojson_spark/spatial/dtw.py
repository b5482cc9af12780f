"""Dynamic-time-warping and discrete Fréchet distance for candidate
trajectory pairs — the alignment-aware companions to the positional
Hausdorff measure (map-matching QA, trip near-dup, trajectory
clustering).

GRAFT extension (no reference analog). EXACT integer semantics on the
int-lattice: per-step costs are squared distances (mul/add int64, no
sqrt); DTW returns the MINIMUM SUM of aligned squared distances,
discrete Fréchet the minimax (max cost along the best simultaneous
walk). Both are O(|A|·|B|) dynamic programs whose row recurrence
serializes — not expressible as Spark column algebra — so the kernel is
an Arrow-batched ``mapInPandas`` over the joined per-object point
arrays: per-pair work is bounded by geometry size (the way-assembly
contract), candidate pairs come from a cell/MBR prefilter upstream, and
the DP never shuffles. Python ints inside the DP (no overflow at any
path length; numpy would wrap silently past int64 on pathological
inputs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dtw_int", "frechet_int", "trajectory_similarity_pairs",
           "lcss_int", "edr_int", "lcss_similarity_pairs"]


def _costs(pa, pb) -> "list[list[int]]":
    return [[(ax - bx) * (ax - bx) + (ay - by) * (ay - by)
             for bx, by in pb] for ax, ay in pa]


def dtw_int(pa: "list[tuple]", pb: "list[tuple]") -> int:
    """Classic DTW: dp[i][j] = c[i][j] + min(↑, ←, ↖). Rolling row."""
    c = _costs(pa, pb)
    m = len(pb)
    prev = [0] * m
    prev[0] = c[0][0]
    for j in range(1, m):
        prev[j] = prev[j - 1] + c[0][j]
    for i in range(1, len(pa)):
        cur = [0] * m
        cur[0] = prev[0] + c[i][0]
        for j in range(1, m):
            cur[j] = c[i][j] + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return prev[-1]


def frechet_int(pa: "list[tuple]", pb: "list[tuple]") -> int:
    """Discrete Fréchet: dp[i][j] = max(c[i][j], min(↑, ←, ↖))."""
    c = _costs(pa, pb)
    m = len(pb)
    prev = [0] * m
    prev[0] = c[0][0]
    for j in range(1, m):
        prev[j] = max(prev[j - 1], c[0][j])
    for i in range(1, len(pa)):
        cur = [0] * m
        cur[0] = max(prev[0], c[i][0])
        for j in range(1, m):
            cur[j] = max(c[i][j], min(prev[j], cur[j - 1], prev[j - 1]))
        prev = cur
    return prev[-1]


def trajectory_similarity_pairs(geoms: DataFrame,
                                pairs: DataFrame) -> DataFrame:
    """(id_a, id_b, dtw_sq_sum, frechet_sq) for candidate pairs.

    ``geoms``: (obj_id, pts array<struct<x,y>>) from
    ``hausdorff.collect_geoms``; ``pairs``: (id_a, id_b). Empty
    geometries are the caller's bug (raises in the kernel)."""
    ga = geoms.select(F.col("obj_id").alias("id_a"),
                      F.col("pts").alias("pa"))
    gb = geoms.select(F.col("obj_id").alias("id_b"),
                      F.col("pts").alias("pb"))
    j = pairs.join(ga, "id_a").join(gb, "id_b")

    out_schema = ("id_a long, id_b long, dtw_sq_sum long, "
                  "frechet_sq long")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                pa = [(int(p["x"]), int(p["y"])) for p in t.pa]
                pb = [(int(p["x"]), int(p["y"])) for p in t.pb]
                if not pa or not pb:
                    raise ValueError("empty geometry in similarity pair")
                rows.append((t.id_a, t.id_b, dtw_int(pa, pb),
                             frechet_int(pa, pb)))
            yield pd.DataFrame(rows, columns=[
                "id_a", "id_b", "dtw_sq_sum", "frechet_sq"])

    return j.mapInPandas(run, out_schema)


def lcss_int(pa: "list[tuple]", pb: "list[tuple]", eps_sq: int) -> int:
    """Longest common subsequence under an ε-match (squared-distance
    threshold, exact ints): dp[i][j] = dp[i-1][j-1]+1 on match else
    max(↑, ←). Rolling row; returns the match length."""
    c = _costs(pa, pb)
    m = len(pb)
    prev = [0] * (m + 1)
    for i in range(len(pa)):
        cur = [0] * (m + 1)
        for j in range(m):
            if c[i][j] <= eps_sq:
                cur[j + 1] = prev[j] + 1
            else:
                cur[j + 1] = max(prev[j + 1], cur[j])
        prev = cur
    return prev[m]


def edr_int(pa: "list[tuple]", pb: "list[tuple]", eps_sq: int) -> int:
    """Edit Distance on Real sequences (Chen et al.): unit-cost
    insert/delete/substitute with a free ε-match — the robust
    companion to DTW (outliers cost 1, not their squared distance).
    dp[i][j] = min(↖ + (0 if match else 1), ↑+1, ←+1)."""
    c = _costs(pa, pb)
    m = len(pb)
    prev = list(range(m + 1))
    for i in range(len(pa)):
        cur = [i + 1] + [0] * m
        for j in range(m):
            sub = prev[j] + (0 if c[i][j] <= eps_sq else 1)
            cur[j + 1] = min(sub, prev[j + 1] + 1, cur[j] + 1)
        prev = cur
    return prev[m]


def lcss_similarity_pairs(geoms: DataFrame, pairs: DataFrame,
                          eps_sq: int) -> DataFrame:
    """(id_a, id_b, lcss_len, lcss_ppm, edr_dist) for candidate pairs —
    the threshold-based trajectory similarity family (LCSS match
    length, LCSS similarity as exact integer ppm of min length, EDR).
    Same contract and kernel shape as trajectory_similarity_pairs."""
    ga = geoms.select(F.col("obj_id").alias("id_a"),
                      F.col("pts").alias("pa"))
    gb = geoms.select(F.col("obj_id").alias("id_b"),
                      F.col("pts").alias("pb"))
    j = pairs.join(ga, "id_a").join(gb, "id_b")
    e = int(eps_sq)

    out_schema = ("id_a long, id_b long, lcss_len long, "
                  "lcss_ppm long, edr_dist long")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                pa = [(int(p["x"]), int(p["y"])) for p in t.pa]
                pb = [(int(p["x"]), int(p["y"])) for p in t.pb]
                if not pa or not pb:
                    raise ValueError("empty geometry in similarity pair")
                ll = lcss_int(pa, pb, e)
                rows.append((t.id_a, t.id_b, ll,
                             ll * 1_000_000 // min(len(pa), len(pb)),
                             edr_int(pa, pb, e)))
            yield pd.DataFrame(rows, columns=[
                "id_a", "id_b", "lcss_len", "lcss_ppm", "edr_dist"])

    return j.mapInPandas(run, out_schema)
