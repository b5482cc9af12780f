"""Skyline (Pareto-dominance front) — the classic multi-criteria
operator (Börzsönyi et al., ICDE 2001): keep every row no other row
dominates, where q dominates p iff q <= p on ALL dimensions and q < p
on at least one (all dimensions minimized; negate a column to
maximize).

GRAFT extension (no reference analog — the reference is a fixed
3-table join; this is the "best trade-off" query a curation pipeline
runs to pick frontier documents, e.g. minimize perplexity AND toxicity
AND duplication simultaneously).

Scale design (100 TB):

1. **Pivot prefilter** — ONE aggregation finds the min-sum point
   (lexicographic struct min, deterministic ties). The pivot is itself
   a skyline member, and anything it dominates is out; on roughly
   uniform data that removes ~99% of rows with a broadcast filter, no
   shuffle. Sound by transitivity: if a removed q dominated a survivor
   p, the pivot would dominate p too, so p would have been removed.
2. **Per-partition local skyline** — an Arrow-batched numpy kernel.
   A point can only be dominated by a point of strictly smaller
   dim-sum (all <= and one < forces the sum strictly down), so the
   kernel sorts each batch by sum and screens every point against the
   kept set only — O(n·k) with k = local skyline size (polylog for
   independent dims), vectorized over the kept array.
3. **Merge** — the union of local skylines (small by step 2) collapses
   to one partition and runs the same kernel once more. The global
   skyline is a subset of every partitioning's local-skyline union, so
   the result is EXACT; the single-partition stage is bounded by the
   sum of local skyline sizes, not the data. Anti-correlated inputs
   (skyline ~ n) degrade the merge — same contract as any broadcast
   guard in this repo; callers with adversarial data should bound dims
   or pre-bucket.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skyline", "local_skyline_kernel"]


def local_skyline_kernel(pts):
    """numpy (n, d) int64 -> boolean keep-mask for the batch-local
    skyline. Exact: sorts by dim-sum so only already-kept points can
    dominate the current one; duplicates of a frontier point all
    survive (neither strictly dominates the other)."""
    import numpy as np

    n = pts.shape[0]
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    order = np.lexsort(tuple(pts[:, i] for i in range(pts.shape[1] - 1, -1, -1)))
    order = order[np.argsort(pts[order].sum(axis=1), kind="stable")]
    kept: list = []
    for idx in order:
        p = pts[idx]
        if kept:
            ka = np.asarray(kept)
            dom = (ka <= p).all(axis=1) & (ka < p).any(axis=1)
            if dom.any():
                continue
        kept.append(p)
        keep[idx] = True
    return keep


def skyline(df: DataFrame, dims: list[str]) -> DataFrame:
    """All rows of ``df`` not dominated on the int64 ``dims`` columns
    (minimized). Returns the input columns unchanged."""
    if not dims:
        raise ValueError("dims must be non-empty")
    cols = df.columns
    s = " + ".join(f"`{d}`" for d in dims)

    # 1. pivot prefilter: lexicographic (sum, dims...) struct min is one
    #    deterministic skyline point; broadcast it and drop everything
    #    it strictly dominates (transitivity keeps the result exact)
    piv = df.select(
        F.min(F.struct(F.expr(s).alias("_s"),
                       *[F.col(d).alias(f"_p{i}")
                         for i, d in enumerate(dims)])).alias("_piv"))
    strict = " OR ".join(
        f"_piv._p{i} < `{d}`" for i, d in enumerate(dims))
    weak = " AND ".join(
        f"_piv._p{i} <= `{d}`" for i, d in enumerate(dims))
    cand = (df.crossJoin(F.broadcast(piv))
            .where(~F.expr(f"({weak}) AND ({strict})"))
            .drop("_piv"))

    def _stage(it: Iterator, schema_cols=tuple(cols), dcols=tuple(dims)):
        import pandas as pd

        batches = [pdf for pdf in it if len(pdf)]
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True)
        pts = pdf[list(dcols)].to_numpy(dtype="int64")
        yield pdf[local_skyline_kernel(pts)]

    local = cand.mapInPandas(_stage, schema=cand.select(*cols).schema)
    # 3. exact merge: local skylines are small; one partition finishes
    return local.repartition(1).mapInPandas(
        _stage, schema=local.schema)
