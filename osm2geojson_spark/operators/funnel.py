"""Funnel analysis — ordered stage progression over an event stream.

The product-analytics staple (signup funnel, checkout funnel): for each
entity, the earliest time it completed stage 1, then the earliest
stage-2 event STRICTLY AFTER that, then stage 3 after that, and so on —
a per-entity monotone chain, not a mere per-stage count (a purchase
before the first view must NOT count).

Distributed shape: one filtered groupBy per stage, each joined back on
the entity key — k stages ⇒ k aggregations + (k−1) equi-joins, all on
the SAME key, so AQE/the planner reuses one hash partitioning across
the whole chain; no windows over the full stream, no per-entity event
arrays collected. Determinism: stage times are integer-second minima
(ties collapse under MIN, so the result is order-free and the DuckDB
twin is value-exact).

Strictness choice (documented): stage i+1 must be > stage i's time in
whole seconds; same-second completions do not advance the funnel — the
conservative reading when sub-second ordering is not trustworthy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ["funnel_stages", "touch_attribution"]


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    sec_col: str = "sec",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-entity funnel times: ``(user_col, t_1, …, t_k)`` with
    ``t_i`` the earliest stage-i event strictly after ``t_{i-1}``
    (null once the chain breaks; only entities that completed stage 1
    appear — upstream outer-join against the entity dimension if the
    zero-stage population is needed)."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least 2 stages")
    out = (events.where(F.col(type_col) == stages[0])
           .groupBy(user_col)
           .agg(F.min(sec_col).alias("t_1")))
    for i, stage in enumerate(stages[1:], start=2):
        prev = f"t_{i - 1}"
        nxt = (events.where(F.col(type_col) == stage)
               .join(out.select(user_col, prev), user_col)
               .where(F.col(sec_col) > F.col(prev))
               .groupBy(user_col)
               .agg(F.min(sec_col).alias(f"t_{i}")))
        out = out.join(nxt, user_col, "left")
    return out


def touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    sec_col: str = "sec",
    id_col: str = "event_id",
    type_col: str = "event_type",
    touch_type: str = "click",
    convert_type: str = "purchase",
) -> DataFrame:
    """First-touch / last-touch attribution: for every conversion
    event, the user's FIRST and LATEST touch event at-or-before it →
    ``(user, convert_id, convert_sec, first_touch_id, last_touch_id)``
    (NULLs when the conversion has no preceding touch — kept: unattributed
    conversions are a metric, not noise).

    ONE partitioned window pass over the per-user ordered stream
    (first/last with ignorenulls over a touch-id carrier column), then
    a filter to conversions — no self-join, no per-conversion scan.
    Ties at the same second break by event id (deterministic total
    order, the sessionize rule)."""
    touch_id = F.when(F.col(type_col) == touch_type, F.col(id_col))
    w = (Window.partitionBy("user").orderBy("sec", "eid")
         .rowsBetween(Window.unboundedPreceding, 0))
    flagged = events.select(
        F.col(user_col).alias("user"),
        F.col(id_col).alias("eid"),
        F.col(sec_col).alias("sec"),
        F.col(type_col).alias("etype"),
        touch_id.alias("tid"))
    attached = flagged.select(
        "user", "eid", "sec", "etype",
        F.first("tid", ignorenulls=True).over(w).alias("first_touch_id"),
        F.last("tid", ignorenulls=True).over(w).alias("last_touch_id"))
    return (attached.where(F.col("etype") == convert_type)
            .select("user", F.col("eid").alias("convert_id"),
                    F.col("sec").alias("convert_sec"),
                    "first_touch_id", "last_touch_id"))
