"""Ordered time-series operators: EWMA and linear gap-fill — engine-new.

Both are "per-key ordered" shapes: one shuffle on the key, then pure
column algebra over the collected, explicitly ordered series. The
determinism discipline is the trajectory/IDW one (queries.py module
docstring): every float fold is LEFT-TO-RIGHT via ``F.aggregate`` so
the DuckDB twin's ``list_reduce`` over the same ``ORDER BY`` list
reproduces the doubles bit-for-bit — a parallel float sum would
reorder IEEE additions and drift.

Scale note: the per-key series is collected into one array, so the
contract is "series per key fits an executor row" (same bound as
collect_list sessionization and every window over the key). At 100 TB
the shuffle is the key-hash exchange only; no global sort, no driver
data. For unbounded per-key streams the streaming twins keep running
state instead (streaming/events.py keeps that family's patterns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def ewma_last(
    df: DataFrame,
    key: str,
    sec_col: str,
    id_col: str,
    value_col: str,
    alpha: float = 0.25,
) -> DataFrame:
    """Exponentially weighted moving average per key, returning the
    final smoothed level: ``e_1 = v_1``, ``e_t = e_{t-1} + (v_t -
    e_{t-1}) * alpha`` folded in (sec, id) order. Returns
    ``(key, n_events, last_value, ewma)``."""
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(sec_col).alias("s"),
                                F.col(id_col).alias("i"),
                                F.col(value_col).alias("v"))))
    g = df.groupBy(key).agg(arr.alias("arr"))
    vs = F.transform(F.col("arr"), lambda e: e["v"])
    rest = F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0)))
    folded = F.aggregate(
        rest, F.element_at(vs, 1),
        lambda a, b: a + ((b - a) * F.lit(alpha)))
    return g.select(
        key,
        F.size("arr").cast("long").alias("n_events"),
        F.element_at(vs, -1).alias("last_value"),
        folded.alias("ewma"))


def gap_fill_linear(
    df: DataFrame,
    key: str,
    sec_col: str,
    id_col: str,
    value_col: str,
    step: int = 60,
) -> DataFrame:
    """Linear interpolation onto the regular ``step``-second grid:
    for every consecutive pair of observations per key, emit the grid
    instants STRICTLY between them with
    ``v0 + (v1 - v0) * ((t - t0) / (t1 - t0))``.

    Grid bounds in pure int64 (``div`` truncation — positive epochs),
    so Spark and the SQL twin enumerate identical instants; the
    interpolation expression is written identically on both sides, so
    the doubles match bit-for-bit. Returns
    ``(key, t_sec, value_interp)``."""
    w = Window.partitionBy(key).orderBy(sec_col, id_col)
    paired = (df.select(
        key, F.col(sec_col).alias("t0"), F.col(value_col).alias("v0"),
        F.lead(sec_col).over(w).alias("t1"),
        F.lead(value_col).over(w).alias("v1"))
        .where(F.col("t1").isNotNull()))
    m0 = F.expr(f"(t0 div {step}) + 1")
    m1 = F.expr(f"(t1 - 1) div {step}")
    grid = (paired
            .withColumn("mi", F.explode(
                F.when(m1 >= m0, F.sequence(m0, m1))
                 .otherwise(F.array().cast("array<bigint>")))))
    t = F.col("mi") * step
    frac = (t - F.col("t0")).cast("double") \
        / (F.col("t1") - F.col("t0")).cast("double")
    return grid.select(
        key,
        t.cast("long").alias("t_sec"),
        (F.col("v0") + ((F.col("v1") - F.col("v0")) * frac))
            .alias("value_interp"))


def locf_resample(
    df: DataFrame,
    key: str,
    sec_col: str,
    id_col: str,
    value_col: str,
    step: int = 60,
) -> DataFrame:
    """Last-observation-carried-forward onto the regular ``step``-
    second grid — the step-function sibling of
    :func:`gap_fill_linear` (sensor snapshots, price marks): each
    consecutive observation pair per key emits the grid instants in
    ``[t0, t1)`` carrying v0 unchanged (no extrapolation past the
    last observation; a grid instant equal to a tied-second
    observation takes the LAST observation of that second — pairs
    are ordered (sec, id) and the earlier pair's range is empty).
    Values pass through untouched, so doubles stay bit-identical
    across engines. Returns ``(key, t_sec, value_locf)``."""
    w = Window.partitionBy(key).orderBy(sec_col, id_col)
    paired = (df.select(
        key, F.col(sec_col).alias("t0"), F.col(value_col).alias("v0"),
        F.lead(sec_col).over(w).alias("t1"))
        .where(F.col("t1").isNotNull()))
    m0 = F.expr(f"(t0 + {step} - 1) div {step}")
    m1 = F.expr(f"(t1 - 1) div {step}")
    grid = (paired
            .withColumn("mi", F.explode(
                F.when(m1 >= m0, F.sequence(m0, m1))
                 .otherwise(F.array().cast("array<bigint>")))))
    return grid.select(
        key,
        (F.col("mi") * step).cast("long").alias("t_sec"),
        F.col("v0").alias("value_locf"))


def acf_lags(df, key_col: str, order_cols: list, value_col: str,
             max_lag: int = 3):
    """Per-key autocorrelation function at lags 1..max_lag →
    ``(key, lag, n_pairs, acf)`` — one window pass, one shuffle.

    Exactness discipline: every base moment is an order-free exact sum
    (decimal(38,6) for the linear sums, decimal(38,4) for the
    squares/products — the anomaly_zscore 2^53 headroom rule), and the
    final ``acf`` double is ONE expression written identically in the
    SQL twin:

        acf(ℓ) = [Σ x_t·x_{t+ℓ} − m·(S_head + S_tail) + (n−ℓ)·m²]
                 / [Σ x² − n·m²],  m = full-series mean.

    Shape: one partitioned window (lag columns for every ℓ in the same
    pass) + one groupBy(key) aggregate. Lags are conditional sums over
    the SAME scan — max_lag never multiplies data passes."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key_col).orderBy(*order_cols)
    lag_cols = [F.lag(F.col(value_col), lg).over(w).alias(f"_l{lg}")
                for lg in range(1, max_lag + 1)]
    base = df.select(F.col(key_col).alias("key"),
                     F.col(value_col).alias("v"), *lag_cols)
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,4)"))
        .cast("double").alias("ss"),
    ]
    for lg in range(1, max_lag + 1):
        l = F.col(f"_l{lg}")
        aggs += [
            F.count(l).alias(f"np{lg}"),
            F.sum((F.col("v") * l).cast("decimal(38,4)"))
            .cast("double").alias(f"sxy{lg}"),
            # head = the lagged copies that participate (x_1..x_{n-ℓ});
            # tail = the current values with a non-null lag (x_{ℓ+1}..x_n)
            F.sum(F.when(l.isNotNull(), l).cast("decimal(38,6)"))
            .cast("double").alias(f"sh{lg}"),
            F.sum(F.when(l.isNotNull(), F.col("v")).cast("decimal(38,6)"))
            .cast("double").alias(f"st{lg}"),
        ]
    per_key = base.groupBy("key").agg(*aggs)
    m = "(s / CAST(n AS DOUBLE))"
    lag_structs = [
        F.struct(
            F.lit(lg).cast("long").alias("lag"),
            F.col(f"np{lg}").alias("n_pairs"),
            F.expr(
                f"((sxy{lg} - ({m} * (sh{lg} + st{lg})))"
                f" + (CAST(np{lg} AS DOUBLE) * ({m} * {m})))"
                f" / (ss - (CAST(n AS DOUBLE) * ({m} * {m})))"
            ).alias("acf"))
        for lg in range(1, max_lag + 1)
    ]
    return (per_key.select(
        "key", F.explode(F.array(*lag_structs)).alias("o"))
        .select("key", "o.lag", "o.n_pairs", "o.acf"))


def seasonal_profile(
    df: DataFrame,
    key_col: str,
    sec_col: str,
    value_col: str,
    period_secs: int = 86_400,
    n_phases: int = 24,
) -> DataFrame:
    """Seasonal (phase-of-period) decomposition profile → one row per
    ``(key, phase)``: ``(key, phase, n, sum_value, mean_value)`` with
    phase = (sec div (period/n_phases)) mod n_phases — the additive-
    seasonal component a pipeline subtracts before trend/anomaly work
    (hour-of-day over a daily period by default). ``sum_value`` rides
    DECIMAL (exact, order-free) and is cast to double once;
    ``mean_value`` is the single division. ONE groupBy shuffle on
    (key, phase); no windows, no iteration."""
    slot = int(period_secs) // int(n_phases)
    phase = F.expr(f"({sec_col} div {slot}) % {n_phases}")
    return (
        df.groupBy(F.col(key_col).alias("key"), phase.alias("phase"))
        .agg(F.count("*").alias("n"),
             F.expr(f"CAST(SUM(CAST({value_col} AS DECIMAL(28,6)))"
                    " AS DOUBLE)").alias("sum_value"))
        .select("key", "phase", "n", "sum_value",
                F.expr("sum_value / CAST(n AS DOUBLE)")
                .alias("mean_value")))


def cusum_alerts(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    value_col: str,
    target,
    threshold,
) -> DataFrame:
    """CUSUM level-shift detection per key: running sum of
    ``value − target`` in DECIMAL (exact, so the running state is
    bit-stable under any partitioning), emitting the rows where
    ``|cusum|`` crosses ``threshold`` → input row + ``cusum`` (double,
    one cast at the end). The classic mean-shift changepoint alarm
    over a metric stream. One partitioned window per key ordered by
    ``order_cols`` — the sessionize/staypoints shuffle shape; per-key
    series bound is the module contract above.

    ``target=None`` centers on the PER-KEY MEAN — the usual retro
    scan, where a misspecified constant target turns the walk into a
    pure drift line and the alarm saturates. The mean is a rational
    (Σv)/n, so the comparison is cross-multiplied to stay EXACT and
    int64: values become micro-units
    ``v_u = CAST(CAST(v AS DECIMAL(28,6)) * 1000000 AS BIGINT)`` (one
    deterministic rounding, identical in both engines — decimal×
    decimal cross-products would hit the engines' DIFFERENT precision-
    cap rules), the alarm is ``|n·Σ_{j≤i} v_u − i·Σv_u| > n·thr_u``,
    and the reported ``cusum`` is that numerator divided once by
    n·10⁶ (double). Adds one per-key total aggregate re-attached by
    broadcast; threshold must be int-valued."""
    w = (Window.partitionBy(key_col).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, 0))
    if target is not None:
        cum = F.sum(
            F.expr(f"CAST(({value_col} - {target}) AS DECIMAL(28,6))")
        ).over(w)
        return (df.withColumn("cusum", cum.cast("double"))
                .where(F.abs(F.col("cusum")) > threshold))
    vu = (f"CAST((CAST({value_col} AS DECIMAL(28,6)) * 1000000)"
          " AS BIGINT)")
    tot = df.groupBy(F.col(key_col).alias("_ck")).agg(
        F.count("*").alias("_cn"),
        F.sum(F.expr(vu)).alias("_cs"))
    wi = Window.partitionBy(key_col).orderBy(*order_cols)
    walked = (
        df.join(F.broadcast(tot), F.col(key_col) == F.col("_ck"))
        .withColumn("_run", F.sum(F.expr(vu)).over(w))
        .withColumn("_i", F.row_number().over(wi).cast("long"))
        .withColumn("_num", F.expr("_cn * _run - _i * _cs")))
    thr_u = int(threshold) * 1_000_000
    return (walked
            .where(F.expr(f"abs(_num) > _cn * {thr_u}"))
            .withColumn("cusum", F.expr(
                "CAST(_num AS DOUBLE)"
                " / (CAST(_cn AS DOUBLE) * 1000000.0E0)"))
            .drop("_ck", "_cn", "_cs", "_run", "_i", "_num"))


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    okey_col: str,
    value_col: str,
    bucket_col: str,
) -> DataFrame:
    """OHLC resampling → one row per ``(key, bucket)``:
    ``(key, bucket, open, high, low, close, n)`` — the candlestick /
    metric-rollup primitive. ``okey_col`` is a caller-built UNIQUE
    int64 order key (e.g. ``sec·10⁷ + event_id`` — encoding the
    tie-break into one integer keeps open/close deterministic under
    any partitioning AND lets the DuckDB twin use the same
    ``min_by``/``max_by`` pair; struct-ordered arg-extremes don't
    exist portably). ONE groupBy shuffle, all aggregates map-side
    combinable."""
    return (
        df.groupBy(F.col(key_col).alias("key"),
                   F.col(bucket_col).alias("bucket"))
        .agg(F.expr(f"min_by({value_col}, {okey_col})").alias("open"),
             F.max(value_col).alias("high"),
             F.min(value_col).alias("low"),
             F.expr(f"max_by({value_col}, {okey_col})").alias("close"),
             F.count("*").alias("n")))


def seasonal_decompose(df, key_col: str, t_col: str, value_col: str,
                       period: int = 24, half: int = 12):
    """Classical additive seasonal decomposition (STL-lite) per key
    over an integer time grid → ``(key, t, v, wsum, wn, phase, snum,
    sden, trend, seasonal, resid)``.

    Exact core: the centered moving window ``[t−half, t+half]`` rides
    a RANGE window (gap-robust — missing grid points shrink ``wn`` and
    the trend is NULL unless the window is complete), so ``wsum``/
    ``wn`` are exact ints; the detrended value ``w·v − wsum`` (w =
    2·half+1) stays integer, and the per-phase seasonal component is
    the exact rational ``(snum, sden)`` aggregated over complete
    windows only. ``trend``/``seasonal``/``resid`` are fixed-order
    double expressions over those ints — bit-identical in any IEEE
    engine. Scale shape: one partitioned window pass + one
    (key, phase) aggregate joined back by broadcast-sized key·period
    table."""
    w = 2 * int(half) + 1
    p = int(period)
    src = df.select(F.col(key_col).alias("key"),
                    F.col(t_col).cast("long").alias("t"),
                    F.col(value_col).cast("long").alias("v"))
    win = (Window.partitionBy("key").orderBy("t")
           .rangeBetween(-int(half), int(half)))
    base = (src
            .withColumn("wsum", F.sum("v").over(win))
            .withColumn("wn", F.count("*").over(win))
            .withColumn("phase", F.expr(f"((t % {p}) + {p}) % {p}")))
    seas = (base.where(F.col("wn") == w)
            .groupBy("key", "phase")
            .agg(F.sum(F.expr(f"({w} * v) - wsum")).alias("snum"),
                 F.count("*").alias("sden")))
    trend = (f"CASE WHEN wn = {w} THEN CAST(wsum AS DOUBLE) / {w}.0E0"
             " ELSE NULL END")
    seasonal = ("CASE WHEN sden IS NULL THEN NULL ELSE"
                " CAST(snum AS DOUBLE)"
                f" / ({w}.0E0 * CAST(sden AS DOUBLE)) END")
    resid = (f"CASE WHEN (wn = {w}) AND (sden IS NOT NULL) THEN"
             f" (CAST(({w} * v) - wsum AS DOUBLE) / {w}.0E0)"
             " - (CAST(snum AS DOUBLE)"
             f" / ({w}.0E0 * CAST(sden AS DOUBLE)))"
             " ELSE NULL END")
    return (base.join(F.broadcast(seas), ["key", "phase"], "left")
            .select("key", "t", "v", "wsum", "wn", "phase",
                    "snum", "sden",
                    F.expr(trend).alias("trend"),
                    F.expr(seasonal).alias("seasonal"),
                    F.expr(resid).alias("resid")))
