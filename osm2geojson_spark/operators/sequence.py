"""Sequential pattern counting over ordered event streams.

The market-basket-over-time primitive (PrefixSpan's L2 census): for
every ordered type pair (a THEN b within ``max_gap`` positions),
count occurrences and distinct supporting entities. Funnel answers
"how far did each user get through ONE fixed chain"; this measures
ALL pairwise orderings at once — the input to sequence-rule mining.

Distributed shape: ONE shuffle on the entity key (repartition before
the ordered collect_list — it has no map-side reduction), then the
pair census is PURE CODEGEN array algebra per entity (nested
transform + slice, no self-join over the event table, no window over
the full stream), then one bounded groupBy on the (a, b) pair —
|types|² keys. A per-user stream of length m emits ≤ m·max_gap pair
rows; max_gap caps the blowup the naive rn-range self-join cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["seq_patterns"]


def seq_patterns(df: DataFrame, user_col: str, order_col: str,
                 type_col: str, max_gap: int = 3) -> DataFrame:
    """Count ordered type pairs within ``max_gap`` stream positions:
    ``(a, b, n_occ, n_users)``. ``order_col`` must be unique per
    entity (use the event id — timestamps tie). Gap 1 = adjacent."""
    g = int(max_gap)
    if g < 1:
        raise ValueError("max_gap must be >= 1")
    seqs = (
        df.repartition(F.col(user_col))
        .groupBy(user_col)
        .agg(F.transform(
            F.sort_array(F.collect_list(
                F.struct(F.col(order_col).alias("o"),
                         F.col(type_col).alias("t")))),
            lambda s: s["t"]).alias("seq")))
    pairs = seqs.select(
        F.col(user_col).alias("u"),
        F.explode(F.expr(
            f"flatten(transform(seq, (a, i) -> "
            f"transform(slice(seq, i + 2, {g}), "
            f"b -> struct(a AS a, b AS b))))")).alias("p"))
    return (pairs.select("u", F.col("p.a").alias("a"),
                         F.col("p.b").alias("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("n_occ"),
                 F.countDistinct("u").alias("n_users")))
