"""Spatiotemporal co-location join (co-travel / contact detection) —
engine-new.

The engine already has the two marginal joins — distance join
(spatial/tiles.py) and interval join (operators/ranges.py); this is
the COMBINED one: pairs of pings from different users within ``eps``
planar distance AND ``window_sec`` of each other. The classic
epidemiology / co-travel primitive.

Scale shape: candidates come from ONE equi-join of the ping table
against its 27 (space 3x3 × time 3) bucket-offset images — bucket
sizes equal the thresholds, so every qualifying pair shares an offset
in [-1,1]³ and is found EXACTLY once per direction; the user_a <
user_b filter keeps one. No theta join, no cross join; the exact
distance/time tests are int64 algebra. Skewed hotspots (everyone in
one cell at rush hour) are the same hazard as every bucket join here —
cap or salt the bucket key at planet scale (the minhash discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OFFS = [(dx, dy, dt)
         for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dt in (-1, 0, 1)]


def colocation_pairs(
    pings: DataFrame,
    eps: int,
    window_sec: int,
) -> DataFrame:
    """Event-level co-location pairs. ``pings`` needs int64 columns
    ``(event_id, user_id, x, y, sec)`` (non-negative coords/epochs —
    div-as-floor). Returns one row per qualifying event pair:
    ``(user_a, user_b, event_a, event_b, d2, dt_sec)``."""
    e, t = int(eps), int(window_sec)
    base = pings.select(
        "event_id", "user_id", "x", "y", "sec",
        F.expr(f"x div {e}").alias("cx"),
        F.expr(f"y div {e}").alias("cy"),
        F.expr(f"sec div {t}").alias("tb"))
    off = F.array([
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(dt).alias("dt"))
        for dx, dy, dt in _OFFS
    ])
    img = (base.select(
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("user_b"),
        F.col("x").alias("xb"), F.col("y").alias("yb"),
        F.col("sec").alias("sb"),
        "cx", "cy", "tb", F.explode(off).alias("o"))
        .select("event_b", "user_b", "xb", "yb", "sb",
                (F.col("cx") + F.col("o.dx")).alias("cx"),
                (F.col("cy") + F.col("o.dy")).alias("cy"),
                (F.col("tb") + F.col("o.dt")).alias("tb")))
    d2 = ((F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb"))
          + (F.col("y") - F.col("yb")) * (F.col("y") - F.col("yb")))
    dt_abs = F.abs(F.col("sec") - F.col("sb"))
    return (base.join(img, ["cx", "cy", "tb"])
            .where((F.col("user_id") < F.col("user_b"))
                   & (d2 <= F.lit(e * e))
                   & (dt_abs <= F.lit(t)))
            .select(F.col("user_id").alias("user_a"), "user_b",
                    F.col("event_id").alias("event_a"), "event_b",
                    d2.cast("long").alias("d2"),
                    dt_abs.cast("long").alias("dt_sec")))


def cotravel_counts(
    pings: DataFrame,
    eps: int,
    window_sec: int,
    min_meetings: int = 1,
) -> DataFrame:
    """User-pair rollup of :func:`colocation_pairs`: meeting count +
    exact integer d2/dt sums (order-independent fingerprints)."""
    pairs = colocation_pairs(pings, eps, window_sec)
    return (pairs.groupBy("user_a", "user_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_meetings"),
                 F.sum("d2").cast("long").alias("d2_sum"),
                 F.sum("dt_sec").cast("long").alias("dt_sum"))
            .where(F.col("n_meetings") >= min_meetings))
