"""S2 cell index (functions/s2.py) — parity, invariants, Spark path.

The vectorized numpy kernel and the scalar pure-Python twin
(pyref.s2_encode) are INDEPENDENT implementations sharing only libm;
bit-exact agreement across random + adversarial points pins the whole
chain (face pick, uv, quadratic st, Hilbert walk, sentinel placement).
The (0,0) anchor is the publicly-known canonical S2 leaf id.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm2geojson_spark import pyref
from osm2geojson_spark.functions import s2

_EDGES = [
    (0.0, 0.0), (180.0, 0.0), (-180.0, 0.0), (0.0, 90.0), (0.0, -90.0),
    (90.0, 0.0), (-90.0, 0.0),
    # cube-corner directions (|x|=|y|=|z| ties in the face pick)
    (45.0, 35.26438968275465), (-135.0, -35.26438968275465),
    (135.0, 35.26438968275465), (-45.0, -35.26438968275465),
    (179.999999, 89.999999), (-179.999999, -89.999999),
]


def test_known_anchor_origin():
    # lat/lng (0, 0): canonical S2 leaf id 0x1000000000000001
    got = s2.encode_np(np.array([0.0]), np.array([0.0]), 30)[0]
    assert int(got) == 0x1000000000000001
    assert pyref.s2_encode(0.0, 0.0, 30) == 0x1000000000000001


def test_face_cells():
    # each face center maps onto its face (top 3 id bits) at every level;
    # faces with numerically-exact centers also hit the center child
    # (curve digit 2). lon=180 / the pole centers sit a rounding ulp off
    # the exact (u,v)=(0,0) center, so only the face bits are pinned.
    centers = [(0, 0), (90, 0), (0, 90), (180, 0), (-90, 0), (0, -90)]
    for f, (lon, lat) in enumerate(centers):
        got = int(s2.encode_np(np.array([lon], float),
                               np.array([lat], float), 1)[0]) & (2**64 - 1)
        assert got >> 61 == f
        assert got & ((1 << 58) - 1) == 0 and got & (1 << 58)  # level 1
    for f, (lon, lat) in [(0, (0, 0)), (1, (90, 0)), (4, (-90, 0))]:
        got = int(s2.encode_np(np.array([lon], float),
                               np.array([lat], float), 1)[0]) & (2**64 - 1)
        assert got == (f << 61) | (2 << 59) | (1 << 58)


def test_parity_numpy_vs_pyref_edges():
    lon = np.array([e[0] for e in _EDGES])
    lat = np.array([e[1] for e in _EDGES])
    for lvl in (30, 12, 4, 1):
        got = s2.encode_np(lon, lat, lvl)
        exp = [pyref.s2_encode(a, b, lvl) for a, b in zip(lon, lat)]
        assert got.tolist() == exp


@settings(max_examples=300, deadline=None)
@given(st.floats(-180.0, 180.0), st.floats(-90.0, 90.0),
       st.sampled_from([30, 17, 8, 2]))
def test_parity_numpy_vs_pyref_random(lon, lat, lvl):
    got = int(s2.encode_np(np.array([lon]), np.array([lat]), lvl)[0])
    assert got == pyref.s2_encode(lon, lat, lvl)


def test_hierarchy_containment():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    leaf = s2.encode_np(lon, lat, 30)
    for lvl in (29, 20, 9, 1):
        par = s2.encode_np(lon, lat, lvl)
        assert (s2.parent_np(leaf, lvl) == par).all()
        assert (s2.level_np(par) == lvl).all()
        # every leaf lies inside its parent's [range_min, range_max]
        assert ((leaf >= s2.range_min_np(par))
                & (leaf <= s2.range_max_np(par))).all()


def test_hilbert_locality_beats_morton():
    """The reason s2 ids are the zorder-compaction sort key: a sorted run
    of Hilbert ids spans a tighter lat/lon box than the same run of
    Morton ids (no seam jumps). Compare mean per-chunk bbox area over
    id-sorted chunks of one uniform sample."""
    from osm2geojson_spark.functions import cells as C

    rng = np.random.default_rng(3)
    lon = rng.uniform(-170, 170, 20000)
    lat = rng.uniform(-80, 80, 20000)

    def mean_chunk_area(ids):
        order = np.argsort(ids, kind="stable")
        lo, la = lon[order], lat[order]
        areas = []
        for s_ in range(0, len(lo) - 200, 200):
            sl = slice(s_, s_ + 200)
            areas.append((lo[sl].ptp()) * (la[sl].ptp()))
        return float(np.mean(areas))

    hil = mean_chunk_area(s2.encode_np(lon, lat, 30).view(np.uint64))
    mor = mean_chunk_area(C.encode_np(lon, lat, 15))
    assert hil < mor  # strictly tighter clustering


def test_spark_udf_matches_kernel(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({
        "lon": np.random.default_rng(5).uniform(-180, 180, 500),
        "lat": np.random.default_rng(6).uniform(-90, 90, 500)})
    df = spark.createDataFrame(pdf)
    enc = s2.s2_udf(level=14)
    out = (df.select("lon", "lat", enc(F.col("lon"), F.col("lat")).alias("c"))
           .toPandas())
    exp = s2.encode_np(out["lon"].to_numpy(), out["lat"].to_numpy(), 14)
    assert (out["c"].to_numpy() == exp).all()


def test_parent_expr_matches_np(spark):
    from pyspark.sql import functions as F

    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    leaf = s2.encode_np(lon, lat, 30)
    df = spark.createDataFrame([(int(x),) for x in leaf], "cell long")
    got = (df.select(s2.parent_expr(F.col("cell"), 7).alias("p"))
           .toPandas()["p"].to_numpy())
    assert sorted(got.tolist()) == sorted(s2.parent_np(leaf, 7).tolist())


def test_bad_level_rejected():
    with pytest.raises(ValueError):
        s2.encode_np(np.array([0.0]), np.array([0.0]), 31)
    with pytest.raises(ValueError):
        s2.encode_np(np.array([0.0]), np.array([0.0]), 0)
