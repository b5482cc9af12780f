"""As-of join correctness (vs brute-force python) + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2geojson_spark.operators.asof import asof_join


def _brute(left, right):
    out = {}
    for lid, k, lts in left:
        best = None
        for rk, rts, v in right:
            if rk == k and rts <= lts and (best is None or rts > best[0]):
                best = (rts, v)
        out[lid] = best
    return out


def test_asof_matches_bruteforce(spark):
    left_rows = [(i, i % 3, 10 * i + 5) for i in range(30)]
    right_rows = [(k, t, float(100 * k + t))
                  for k in range(3) for t in range(0, 300, 7)]
    left = spark.createDataFrame(left_rows, "lid long, k long, ts long")
    right = spark.createDataFrame(right_rows, "k long, ts long, v double")
    got = {r["lid"]: (r["ts_asof"], r["v_asof"])
           for r in asof_join(left, right, by="k").collect()}
    want = _brute(left_rows, right_rows)
    for lid, best in want.items():
        if best is None:
            assert got[lid] == (None, None), lid
        else:
            assert got[lid] == best, lid


def test_asof_tie_at_equal_ts_matches(spark):
    """right.ts == left.ts counts as preceding (≤ semantics)."""
    left = spark.createDataFrame([(1, 0, 100)], "lid long, k long, ts long")
    right = spark.createDataFrame([(0, 100, 7.0), (0, 99, 5.0)],
                                  "k long, ts long, v double")
    r = asof_join(left, right, by="k").collect()[0]
    assert (r["ts_asof"], r["v_asof"]) == (100, 7.0)


def test_asof_no_preceding_row_is_null(spark):
    left = spark.createDataFrame([(1, 0, 10)], "lid long, k long, ts long")
    right = spark.createDataFrame([(0, 50, 1.0)], "k long, ts long, v double")
    r = asof_join(left, right, by="k").collect()[0]
    assert r["ts_asof"] is None and r["v_asof"] is None


def test_asof_single_shuffle(spark):
    """Plan shape: union + ONE window exchange on the key — no
    range-join explosion, no extra shuffles."""
    left = spark.range(100).select(
        F.col("id").alias("lid"), (F.col("id") % 5).alias("k"),
        (F.col("id") * 3).alias("ts"))
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 7).alias("ts"),
        F.col("id").cast("double").alias("v"))
    plan = asof_join(left, right, by="k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_matches_bruteforce(spark):
    from osm2geojson_spark.operators.ranges import interval_join

    ev_rows = [(i, i % 4, 13 * i % 500) for i in range(60)]
    iv_rows = [(100 + j, j % 4, 20 * j % 450, 20 * j % 450 + (j * 7) % 90)
               for j in range(40)]
    ev = spark.createDataFrame(ev_rows, "eid long, k long, t long")
    iv = spark.createDataFrame(iv_rows, "iid long, k long, start long, end long")
    got = {(r["eid"], r["iid"]) for r in
           interval_join(ev, iv, on="k", ts="t", bucket=32).collect()}
    want = {(e, i) for e, ek, t in ev_rows for i, ik, s, en in iv_rows
            if ek == ik and s <= t <= en}
    assert got == want and want


def test_interval_join_no_theta_plan(spark):
    """The whole point: NO cartesian/nested-loop node; an equi-join on
    (key, bucket) carries the work."""
    from osm2geojson_spark.operators.ranges import interval_join

    ev = spark.range(1000).select(F.col("id").alias("eid"),
                                  (F.col("id") % 8).alias("k"),
                                  (F.col("id") * 3 % 999).alias("t"))
    iv = spark.range(300).select(F.col("id").alias("iid"),
                                 (F.col("id") % 8).alias("k"),
                                 (F.col("id") * 5 % 900).alias("start"),
                                 (F.col("id") * 5 % 900 + 50).alias("end"))
    plan = interval_join(ev, iv, on="k", ts="t") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_asof_nullable_payload_same_row(spark):
    """ADVICE round-2 fix: a NULL payload value in the most recent right
    row must NOT be skipped past — all as-of columns come from the SAME
    right row. Reference semantics: pandas merge_asof."""
    import numpy as np
    import pandas as pd

    left_rows = [(i, i % 2, 10 * i + 5) for i in range(20)]
    # v is NULL on every third right row; u never null — a per-column
    # last(ignorenulls) would mix rows exactly here
    right_rows = [(k, t, None if (t // 7) % 3 == 0 else float(k * 100 + t),
                   float(t)) for k in range(2) for t in range(0, 200, 7)]
    left = spark.createDataFrame(left_rows, "lid long, k long, ts long")
    right = spark.createDataFrame(
        right_rows, "k long, ts long, v double, u double")
    got = {r["lid"]: (r["ts_asof"], r["v_asof"], r["u_asof"])
           for r in asof_join(left, right, by="k").collect()}

    lp = pd.DataFrame(left_rows, columns=["lid", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v", "u"]).sort_values("ts")
    m = pd.merge_asof(lp, rp, on="ts", by="k", suffixes=("", "_r"))
    for row in m.itertuples(index=False):
        want_v = None if pd.isna(row.v) else row.v
        want_u = None if pd.isna(row.u) else row.u
        g = got[row.lid]
        assert g[1] == want_v and g[2] == want_u, (row.lid, g, want_v, want_u)
        # same-row invariant: ts_asof must be the matched right ts
        if want_u is not None:
            assert g[0] == int(want_u), row.lid


def test_asof_tie_heavy_deterministic(spark):
    """Duplicate right rows at the SAME (key, ts): dedup_right=True
    (default) picks the struct-max row — identical output at any
    parallelism, and every payload column from one row."""
    left = spark.createDataFrame(
        [(i, 0, 100) for i in range(5)], "lid long, k long, ts long")
    right_rows = [(0, 100, v, float(10 * v)) for v in (3.0, 9.0, 1.0)]
    right = spark.createDataFrame(right_rows, "k long, ts long, v double, u double")
    expected = [(100, 9.0, 90.0)] * 5  # struct-max = (9.0, 90.0)
    for parts in (1, 7):
        got = sorted(
            (r["ts_asof"], r["v_asof"], r["u_asof"])
            for r in asof_join(left.repartition(parts),
                               right.repartition(parts), by="k").collect())
        assert got == expected, (parts, got)


def test_asof_single_shuffle_with_default_dedup(spark):
    """The deterministic-tie rule must not add an exchange."""
    left = spark.range(100).select(
        F.col("id").alias("lid"), (F.col("id") % 5).alias("k"),
        (F.col("id") * 3).alias("ts"))
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 7).alias("ts"),
        F.col("id").cast("double").alias("v"))
    plan = asof_join(left, right, by="k", dedup_right=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
