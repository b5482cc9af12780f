"""Categorical association statistics (chi-square / Cramér's V).

The feature-screening primitive a training-data pipeline runs before
keeping a categorical column: does attribute A carry signal about
attribute B? Exact end-to-end: with O the observed cell count, r/c the
marginals and N the total, the cell's chi-square contribution
``(O − rc/N)²/(rc/N)`` is the rational ``(O·N − r·c)²/(N·r·c)``, so
``cell_ppm = (10⁶·(O·N − r·c)²) div (N·r·c)`` is pure integer
arithmetic (DECIMAL(38,0) — the square overflows int64), identical in
Spark and DuckDB. ZERO cells are included (a missing combination still
contributes (r·c)²·10⁶/(N·r·c) — dropping them understates the
statistic), via a tiny distinct×distinct cross join.

Scale shape: ONE data-sized shuffle (the groupBy(a,b) count); marginals
are aggregates OVER THE COUNTS (cells ≤ |A|·|B|, metadata-sized) and
re-attach by broadcast. Cramér's V² in ppb derives per-table:
``v2_ppb = (10³·chi2_ppm) div (N·(min(|A|,|B|)−1))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["contingency_chi2", "cramers_v2_ppb"]

_D = "CAST({} AS DECIMAL(38,0))"


def contingency_chi2(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Per-cell exact chi-square contributions for the contingency
    table of two categorical columns. Returns (a, b, o, r, c, n,
    cell_ppm) for EVERY observed-category pair, including zero
    cells."""
    pair = df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
    counts = pair.groupBy("a", "b").agg(F.count("*").alias("o"))
    grid = (counts.select("a").distinct()
            .crossJoin(counts.select("b").distinct()))
    full = (grid.join(counts, ["a", "b"], "left")
            .select("a", "b", F.coalesce("o", F.lit(0)).alias("o")))
    rt = full.groupBy("a").agg(F.sum("o").alias("r"))
    ct = full.groupBy("b").agg(F.sum("o").alias("c"))
    nt = full.agg(F.sum("o").alias("n"))
    cell = (full
            .join(F.broadcast(rt), "a")
            .join(F.broadcast(ct), "b")
            .crossJoin(F.broadcast(nt)))
    dev = f"({_D.format('o')} * n - {_D.format('r')} * c)"
    return cell.select(
        "a", "b", "o", "r", "c", "n",
        F.expr(f"CAST(({_D.format('1000000')} * {dev} * {dev})"
               f" div ({_D.format('n')} * r * c) AS BIGINT)")
        .alias("cell_ppm"))


def cramers_v2_ppb(cells: DataFrame) -> DataFrame:
    """Collapse :func:`contingency_chi2` output to one row:
    (n, n_a, n_b, chi2_ppm, v2_ppb) with
    V² = chi2 / (N·(min(|A|,|B|)−1)) in exact ppb."""
    agg = cells.agg(
        F.max("n").alias("n"),
        F.countDistinct("a").alias("n_a"),
        F.countDistinct("b").alias("n_b"),
        F.sum("cell_ppm").alias("chi2_ppm"))
    return agg.select(
        "n", "n_a", "n_b", "chi2_ppm",
        F.expr(f"CAST(({_D.format('1000')} * chi2_ppm)"
               f" div ({_D.format('n')} * (least(n_a, n_b) - 1))"
               " AS BIGINT)").alias("v2_ppb"))
