"""Sketch operators (engine additions): HyperLogLog++ distinct counts
and quantile sketches — error-bounded vs exact, and layout-INVARIANT
(sketch merges are commutative, so results must not depend on
partitioning — the property that makes them safe at 1000 executors)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_hll_distinct_error_bound_and_invariance(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    approx1 = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02)).collect()[0][0]
    assert abs(approx1 - exact) / exact < 0.06, (approx1, exact)
    # merge commutativity: same answer at any partition layout
    approx2 = li.repartition(37, "l_orderkey").select(
        F.approx_count_distinct("l_partkey", rsd=0.02)).collect()[0][0]
    assert approx1 == approx2


def test_hll_groupwise_partial_merge(spark):
    """Grouped HLL: per-group sketches merge map-side (partial agg in
    plan) and each group's estimate stays within the error bound."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.03).alias("apx"),
        F.countDistinct("l_partkey").alias("exact"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan
    for r in agg.collect():
        assert abs(r["apx"] - r["exact"]) / r["exact"] < 0.09, r


def test_quantile_sketch_error_bound(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    vals = sorted(r[0] for r in orders.select("o_totalprice").collect())
    n = len(vals)
    rel_err = 0.01
    got = orders.select(
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.9],
                            int(1 / rel_err)).alias("q")).collect()[0]["q"]
    for p, g in zip([0.25, 0.5, 0.9], got):
        # rank guarantee: the returned value's rank is within rel_err*n
        lo = vals[max(0, int((p - rel_err) * n) - 1)]
        hi = vals[min(n - 1, int((p + rel_err) * n) + 1)]
        assert lo <= g <= hi, (p, g, lo, hi)
