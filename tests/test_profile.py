from __future__ import annotations

import pandas as pd

from osm2geojson_spark.operators.profile import profile_table


def test_profile_stats_with_nulls(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "a": [1, 2, 2, None, 5],
        "s": ["x", None, "y", "y", "aa"]}))
    got = {r["column"]: r for r in profile_table(df).collect()}
    a, s = got["a"], got["s"]
    assert (a["n_rows"], a["n_nulls"], a["n_distinct"]) == (5, 1, 3)
    assert (a["min_num"], a["max_num"]) == (1.0, 5.0)
    assert a["min_str"] is None
    assert (s["n_nulls"], s["n_distinct"]) == (1, 3)
    assert (s["min_str"], s["max_str"]) == ("aa", "y")
    assert s["min_num"] is None


def test_two_agg_cross_plan(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "a": [1, 2], "b": [3.0, 4.0]}))
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    # two one-row aggregates crossed 1x1: the countDistinct Expand must NOT
    # carry the plain min/max/count aggs (measured 6x at sf0.1) -- so the
    # plan has exactly one (bounded) cross join and the Expand appears on
    # the distinct side only.
    assert plan.count("NestedLoopJoin BuildRight, Cross") == 1
    plain_side = plan.split("Expand")[0]
    assert "min(" in plain_side and "Expand" not in plain_side


def test_fingerprint_shards_order_invariant_and_sensitive(spark):
    from osm2geojson_spark.operators.profile import fingerprint_shards

    rows = [(i, f"name-{i}") for i in range(500)]
    a = spark.createDataFrame(rows, "id long, name string")
    b = spark.createDataFrame(rows[::-1], "id long, name string") \
        .repartition(7)

    def fp(df):
        return sorted(
            (r["shard"], r["n_rows"], r["xor_fp"], r["sum_fp"])
            for r in fingerprint_shards(df, ["id", "name"], 8).collect())

    fa, fb = fp(a), fp(b)
    assert fa == fb                       # order/partitioning invariant
    assert sum(r[1] for r in fa) == 500   # all rows counted

    # mutate ONE row: exactly one shard's digests move
    rows2 = list(rows)
    rows2[123] = (123, "name-123-CHANGED")
    fc = fp(spark.createDataFrame(rows2, "id long, name string"))
    diff = [i for i, (x, y) in enumerate(zip(fa, fc)) if x != y]
    assert len(diff) in (1, 2)  # old hash leaves one shard, new enters one
    changed = [(x, y) for x, y in zip(fa, fc) if x != y]
    assert all(x[0] == y[0] for x, y in changed)  # same shard ids differ
