"""Round-5 operators: HITS, label propagation, modularity, degree
assortativity, KS / Mann-Whitney rank tests, ACF, IQR outliers,
convoys. Each pinned against an independent hand computation or the
pyref twin on a graph/series SHAPE the catalog entry never exercises
(the codec-test discipline: pin paths the generator doesn't emit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long")


class TestHits:
    def test_star_authority(self, spark):
        # directed star 1..4 -> 0: node 0 is the unique authority,
        # spokes are the hubs
        from osm2geojson_spark.operators.graph import hits

        out = hits(_edges(spark, [(i, 0) for i in (1, 2, 3, 4)]),
                   n_iters=4).collect()
        byid = {r["node_id"]: r for r in out}
        assert byid[0]["auth"] == 10**8
        assert byid[0]["hub"] == 0
        hubs = [byid[i]["hub"] for i in (1, 2, 3, 4)]
        assert len(set(hubs)) == 1 and hubs[0] == 10**8 // 4

    def test_pyref_parity_hash_graph(self, spark):
        from osm2geojson_spark import pyref
        from osm2geojson_spark.operators.graph import hits

        g = pyref.hash_graph(23, 60)
        got = sorted(
            (r["node_id"], r["hub"], r["auth"])
            for r in hits(_edges(spark, g), n_iters=5).collect())
        assert got == pyref.ref_hits(g, n_iters=5)


class TestLabelProp:
    def test_barbell_splits(self, spark):
        # two 4-cliques joined by one bridge: LPA keeps two communities
        # (min-label CC would flood them into one)
        from osm2geojson_spark.operators.graph import label_propagation

        k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        bridge = [(3, 10)]
        labels = {r["node"]: r["label"] for r in label_propagation(
            _edges(spark, k1 + k2 + bridge), n_iters=4).collect()}
        left = {labels[v] for v in range(4)}
        right = {labels[v] for v in range(10, 14)}
        assert len(left) == 1 and len(right) == 1
        assert left != right

    def test_pyref_parity(self, spark):
        from osm2geojson_spark import pyref
        from osm2geojson_spark.operators.graph import label_propagation

        g = pyref.hash_graph(31, 90)
        got = sorted(
            (r["node"], r["label"]) for r in label_propagation(
                _edges(spark, g), n_iters=4).collect())
        assert got == pyref.ref_label_propagation(g, n_iters=4)


class TestModularity:
    def test_two_triangles_hand(self, spark):
        # two triangles + bridge, perfect partition: m = 7,
        # each community: m_in = 3, d_tot = 7 (2·3 intra + 1 bridge end)
        # q_num = 4·7·3 − 49 = 35, q_den = 196 → Q = 70/196 ≈ 0.357
        from osm2geojson_spark.operators.graph import modularity

        tri1 = [(0, 1), (1, 2), (2, 0)]
        tri2 = [(3, 4), (4, 5), (5, 3)]
        e = _edges(spark, tri1 + tri2 + [(0, 3)])
        labels = spark.createDataFrame(
            [(v, v // 3) for v in range(6)], "node long, label long")
        rows = {r["label"]: r for r in modularity(e, labels).collect()}
        for lab in (0, 1):
            assert rows[lab]["m_in"] == 3
            assert rows[lab]["d_tot"] == 7
            assert rows[lab]["q_num"] == 4 * 7 * 3 - 49
            assert rows[lab]["q_den"] == 4 * 49

    def test_pyref_parity(self, spark):
        from osm2geojson_spark import pyref
        from osm2geojson_spark.operators.graph import (
            label_propagation,
            modularity,
        )

        g = pyref.hash_graph(29, 80)
        e = _edges(spark, g)
        got = sorted(
            tuple(r) for r in modularity(
                e, label_propagation(e, n_iters=3)).collect())
        assert got == pyref.ref_modularity(
            g, pyref.ref_label_propagation(g, n_iters=3))


class TestDegreeAssort:
    def test_star_is_minus_one(self, spark):
        # a star is perfectly disassortative: r = -1
        from osm2geojson_spark.operators.graph import degree_assortativity

        row = degree_assortativity(
            _edges(spark, [(0, i) for i in range(1, 6)])).collect()[0]
        assert row["r"] == pytest.approx(-1.0)

    def test_complete_graph_nan_free_cycle(self, spark):
        # a cycle is degree-regular: zero variance → r is NaN (0/0);
        # the caller sees the raw moments to detect it
        from osm2geojson_spark.operators.graph import degree_assortativity

        row = degree_assortativity(
            _edges(spark, [(i, (i + 1) % 5) for i in range(5)])).collect()[0]
        assert row["n_pairs"] == 10
        assert row["sx"] == 20  # all degrees 2


class TestRankStats:
    def test_ks_identical_and_disjoint(self, spark):
        from osm2geojson_spark.operators.stats import ks_2samp

        rows = [(float(v), "a") for v in range(10)] + [
            (float(v), "b") for v in range(10)]
        df = spark.createDataFrame(rows, "value double, grp string")
        r = ks_2samp(df, "value", "grp", "a", "b").collect()[0]
        assert r["d_num"] == 0 and r["d"] == 0.0

        rows = [(float(v), "a") for v in range(5)] + [
            (float(v + 100), "b") for v in range(5)]
        df = spark.createDataFrame(rows, "value double, grp string")
        r = ks_2samp(df, "value", "grp", "a", "b").collect()[0]
        assert r["d"] == 1.0

    def test_ks_hand_case(self, spark):
        # a = [1,2,3], b = [2,3,4]: CDF gap peaks at v=1 → |1·3-0·3|=3,
        # D = 3/9 = 1/3
        from osm2geojson_spark.operators.stats import ks_2samp

        rows = [(1.0, "a"), (2.0, "a"), (3.0, "a"),
                (2.0, "b"), (3.0, "b"), (4.0, "b")]
        df = spark.createDataFrame(rows, "value double, grp string")
        r = ks_2samp(df, "value", "grp", "a", "b").collect()[0]
        assert (r["n1"], r["n2"], r["d_num"]) == (3, 3, 3)
        assert r["d"] == pytest.approx(1 / 3)

    def test_mwu_hand_case_with_ties(self, spark):
        # a = [1, 2, 2], b = [2, 3]: pooled sorted 1,2,2,2,3
        # midranks: 1→1, 2→3 (three-way tie over ranks 2-4), 3→5
        # R1 = 1+3+3 = 7 → r1_x2 = 14; U1 = 7 − 3·4/2 = 1 → u1_x2 = 2
        from osm2geojson_spark.operators.stats import mann_whitney_u

        rows = [(1.0, "a"), (2.0, "a"), (2.0, "a"),
                (2.0, "b"), (3.0, "b")]
        df = spark.createDataFrame(rows, "value double, grp string")
        r = mann_whitney_u(df, "value", "grp", "a", "b").collect()[0]
        assert (r["n1"], r["n2"]) == (3, 2)
        assert r["r1_x2"] == 14
        assert r["u1_x2"] == 2
        assert r["u2_x2"] == 2 * 2 * 3 - 2

    def test_iqr_flags_only_outliers(self, spark):
        from osm2geojson_spark.operators.stats import iqr_outliers

        vals = [float(v) for v in range(1, 21)] + [1000.0, -1000.0]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, value double")
        out = iqr_outliers(df, "value").collect()
        assert sorted(r["value"] for r in out) == [-1000.0, 1000.0]


class TestAcf:
    def test_against_numpy_formula(self, spark):
        import numpy as np

        from osm2geojson_spark.operators.timeseries import acf_lags

        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)],
            "i long, value double")
        out = {r["lag"]: r for r in acf_lags(
            df.withColumn("k", F.lit("s")), "k", ["i"], "value",
            max_lag=2).collect()}
        x = np.array(vals)
        m = x.mean()
        den = ((x - m) ** 2).sum()
        for lg in (1, 2):
            num = ((x[:-lg] - m) * (x[lg:] - m)).sum()
            assert out[lg]["n_pairs"] == len(x) - lg
            assert out[lg]["acf"] == pytest.approx(num / den, rel=1e-9)


class TestConvoys:
    def test_hand_built_runs(self, spark):
        from osm2geojson_spark.spatial.trajectory import convoys

        # users 1 and 2 share cell (0,0) in buckets 0,1,2 and 4 (gap at
        # 3 splits the runs); user 3 is elsewhere
        rows = []
        for b in (0, 1, 2, 4):
            for u in (1, 2):
                rows.append((u, b * 86_400, 1.0, 1.0))
        rows.append((1, 3 * 86_400, 1.0, 1.0))
        rows.append((2, 3 * 86_400, 100.0, 100.0))
        rows.append((3, 0, 200.0, 200.0))
        df = spark.createDataFrame(
            rows, "user_id long, secs long, x double, y double"
        ).select("user_id", F.col("secs").cast("timestamp").alias("ts"),
                 "x", "y")
        out = convoys(df, x_col="x", y_col="y", cell=8,
                      bucket_secs=86_400, min_len=3).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["user_a"], r["user_b"]) == (1, 2)
        assert (r["start_bucket"], r["end_bucket"], r["run_len"]) == (0, 2, 3)
