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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["contingency_chi2", "cramers_v2_ppb", "otsu_curve", "otsu_threshold"]

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


def otsu_curve(df: DataFrame, value_col: str) -> DataFrame:
    """Otsu's between-class variance curve over an integer-valued
    column — the global-threshold primitive for image binarization
    (blob_stats' fixed luma_threshold, made data-driven). For every
    candidate threshold t (each distinct value), the EXACT rational
    between-class variance σ²_B(t) = num/den with

        num = (s0·N − S·n0)²      den = n0·(N − n0)

    (n0, s0 = count/sum at values ≤ t; N, S = totals). No floats:
    pick argmax by cross-multiplying num·den' vs num'·den downstream
    (Python ints — the curve is ≤ |distinct values| rows, O(1)
    driver). Scale shape: ONE groupBy on the value (the histogram —
    the only data-sized pass), then window algebra over the tiny
    histogram itself; the global window is one task over ≤ 2^16 rows
    for any real bit depth. int64 bound: requires S·N < 3·10⁹ — i.e.
    Σv · pixel-count products beyond that need the curve computed on
    a SAMPLED histogram or per-partition rasters."""
    v = F.col(value_col).cast("long")
    h = df.groupBy(v.alias("t")).agg(F.count("*").alias("c"))
    tot = h.agg(F.sum("c").alias("n_tot"),
                F.sum(F.col("t") * F.col("c")).alias("s_tot"))
    w = (Window.orderBy("t")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (h.crossJoin(F.broadcast(tot))
           .withColumn("n0", F.sum("c").over(w))
           .withColumn("s0", F.sum(F.col("t") * F.col("c")).over(w)))
    d = (F.col("s0") * F.col("n_tot") - F.col("s_tot") * F.col("n0"))
    return cum.select(
        "t",
        (d * d).alias("num"),
        (F.col("n0") * (F.col("n_tot") - F.col("n0"))).alias("den"))


def otsu_threshold(df: DataFrame, value_col: str) -> int:
    """The argmax of :func:`otsu_curve` — exact fraction comparison
    with Python bignums over the collected (tiny) curve; smallest t
    wins ties (deterministic)."""
    rows = sorted((r["t"], r["num"], r["den"])
                  for r in otsu_curve(df, value_col).collect())
    best_t, best_num, best_den = None, -1, 1
    for t, num, den in rows:
        if den == 0:
            continue
        if num * best_den > best_num * den:
            best_t, best_num, best_den = t, num, den
    if best_t is None:
        raise ValueError("otsu_threshold needs >= 2 distinct values")
    return int(best_t)


def exact_quantiles(df: DataFrame, value_col: str,
                    p_ppms: list[int],
                    bucket_expr: str | None = None,
                    max_buckets: int = 1_000_000) -> DataFrame:
    """EXACT order statistics without a global sort — the scalable
    counterpart to approx_percentile when the answer must be a real
    data value: rank k = ceil(p·n) (integer ppm ceil) is located by
    a VALUE-bucket histogram (one groupBy; bucket key = floor(v) by
    default — any monotone int expression works), the cumulative
    walk runs over the SMALL histogram (one window task over
    |distinct buckets| rows), and only the one bucket containing
    each rank is sorted (collect_list over bucket-sized groups).
    Values pass through untouched (doubles stay bit-identical).
    Returns ``(p_ppm, k, value)``.

    The histogram-walk bound is SELF-ENFORCING: the single aggregate
    that counts n also counts distinct buckets at a ladder of
    right-shift coarsenings (``b div 2^s`` — truncating div is
    monotone, so a coarsened bucket is still a valid bucket; ties
    just share one), and the smallest shift whose bucket count fits
    ``max_buckets`` is applied automatically. ``div 2^56`` leaves at
    most 256 int64 buckets, so the ladder always terminates — a
    pathological value spread degrades to bigger in-bucket sorts,
    never to a data-sized single-task window."""
    if not p_ppms:
        raise ValueError("p_ppms must be non-empty")
    if any(not 0 < p <= 1_000_000 for p in p_ppms):
        raise ValueError("p_ppms must be in (0, 1e6]")
    if max_buckets < 1:
        raise ValueError("max_buckets must be >= 1")
    b_expr = bucket_expr or f"CAST(floor(`{value_col}`) AS BIGINT)"
    src = df.select(F.col(value_col).alias("v"),
                    F.expr(b_expr).alias("b"))
    shifts = [0, 8, 16, 24, 32, 40, 48, 56]
    stat = src.agg(
        F.count("*").alias("n"),
        *[F.countDistinct(F.expr(f"b div {1 << s}")).alias(f"d{s}")
          for s in shifts]).collect()[0]
    n = stat["n"]
    if n == 0:
        raise ValueError("exact_quantiles needs a non-empty input")
    # d56 <= 256 always, so the default 1M cap always resolves; a
    # caller-set cap below 256 gets the coarsest ladder rung (best
    # effort — still bounded by 256 buckets)
    shift = next((s for s in shifts if stat[f"d{s}"] <= max_buckets), 56)
    if shift:
        src = src.withColumn("b", F.expr(f"b div {1 << shift}"))
    ks = [(int(p), (int(p) * n + 999_999) // 1_000_000)
          for p in sorted(set(p_ppms))]
    spark = df.sparkSession
    kdf = spark.createDataFrame(ks, "p_ppm long, k long")

    hist = src.groupBy("b").agg(F.count("*").alias("c"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = (hist.withColumn("cum", F.sum("c").over(w))
           .withColumn("before", F.col("cum") - F.col("c")))
    # the one bucket holding each rank; offset inside the bucket
    hit = (cum.join(F.broadcast(kdf),
                    (F.col("before") < F.col("k"))
                    & (F.col("k") <= F.col("cum")))
           .select("p_ppm", "k", "b",
                   (F.col("k") - F.col("before")).alias("off")))
    vals = (src.join(F.broadcast(hit.select("b").distinct()), "b")
            .groupBy("b")
            .agg(F.sort_array(F.collect_list("v")).alias("vs")))
    return (hit.join(vals, "b")
            .select("p_ppm", "k",
                    F.element_at("vs", F.col("off").cast("int"))
                    .alias("value")))
