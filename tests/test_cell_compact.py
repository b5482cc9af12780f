"""Cell-set compaction (functions/cells.compact_cells) vs a pure-Python
reference plus the uncompact roundtrip identity."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.functions.cells import (
    compact_cells,
    uncompact_cells,
)


def _ref_compact(cells: set, res: int, min_res: int = 0) -> set:
    cur, out = set(cells), set()
    for lvl in range(res, min_res, -1):
        parents = {c >> 2 for c in cur}
        full = {p for p in parents
                if all((p << 2) + i in cur for i in range(4))}
        out |= {(c, lvl) for c in cur if (c >> 2) not in full}
        cur = full
    return out | {(c, min_res) for c in cur}


def _ref_uncompact(rows: set, target: int) -> set:
    out = set()
    for c, r in rows:
        k = 1 << (2 * (target - r))
        out |= set(range(c * k, c * k + k))
    return out


def test_hand_quad(spark):
    # cells 4,5,6,7 form the complete quad of parent 1; cell 9 is loose
    df = spark.createDataFrame([(4,), (5,), (6,), (7,), (9,)], "cell long")
    got = {(r.cell, r.res) for r in compact_cells(df, res=2).collect()}
    assert got == {(1, 1), (9, 2)}


def test_matches_reference_and_roundtrip(spark):
    rng = random.Random(41)
    for trial in range(3):
        cells = set(rng.sample(range(4 ** 4), rng.randint(20, 180)))
        df = spark.createDataFrame([(c,) for c in cells], "cell long") \
            .repartition(5)
        comp = compact_cells(df, res=4)
        got = {(r.cell, r.res) for r in comp.collect()}
        assert got == _ref_compact(cells, 4), trial
        # no complete quad survives at any level (minimality)
        by_parent = {}
        for c, r in got:
            by_parent.setdefault((c >> 2, r), set()).add(c & 3)
        assert all(len(v) < 4 for v in by_parent.values())
        # uncompact inverts exactly
        back = {r.cell for r in uncompact_cells(comp, target_res=4).collect()}
        assert back == cells


def test_full_grid_collapses_to_root(spark):
    df = spark.createDataFrame([(c,) for c in range(64)], "cell long")
    got = {(r.cell, r.res) for r in compact_cells(df, res=3).collect()}
    assert got == {(0, 0)}


def test_min_res_floor(spark):
    df = spark.createDataFrame([(c,) for c in range(16)], "cell long")
    got = {(r.cell, r.res) for r in compact_cells(df, res=2, min_res=1).collect()}
    assert got == {(0, 1), (1, 1), (2, 1), (3, 1)}


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_deep_res_spread_identity_and_roundtrip():
    # round-4 MAX_RES raise: the added (16,...) spread stage must be
    # bit-for-bit identity for res <= 15 ids (committed oracles), and
    # encode/decode must round-trip at the new deep resolutions
    import numpy as np

    from osm2geojson_spark.functions import cells as C

    def spread_15(x):  # the pre-round-4 4-stage chain
        x = x.astype(np.int64)
        for shift, mask in ((8, 0x00FF00FF00FF00FF),
                            (4, 0x0F0F0F0F0F0F0F0F),
                            (2, 0x3333333333333333),
                            (1, 0x5555555555555555)):
            x = (x << shift | x) & mask
        return x

    xs = np.arange(0, 1 << 15, 97, dtype=np.int64)
    assert (C._spread_np(xs) == spread_15(xs)).all()

    rng = np.random.default_rng(7)
    for res in (16, 20, 26):
        n = 1 << res
        ix = rng.integers(0, n, 500)
        iy = rng.integers(0, n, 500)
        cell = C._spread_np(ix) | (C._spread_np(iy) << 1)
        assert int(cell.max()) < (1 << 53)
        gx, gy = C._compact_np(cell), C._compact_np(cell >> 1)
        assert (gx == ix).all() and (gy == iy).all()


def test_deep_res_spark_sql_numpy_agree(spark):
    import numpy as np

    from osm2geojson_spark import pyref
    from osm2geojson_spark.functions import cells as C
    from pyspark.sql import functions as F

    lons = [-179.9, -1.0, 0.0, 13.4049, 179.9]
    lats = [-84.9, 0.0, 0.1, 52.52, 84.9]
    res = 22
    df = spark.createDataFrame(
        list(zip(lons, lats)), "lon double, lat double")
    got = [r.c for r in df.select(
        C.cell_expr(F.col("lon"), F.col("lat"), res).alias("c")).collect()]
    want_np = C.encode_np(np.array(lons), np.array(lats), res).tolist()
    assert got == want_np
    # pyref spread twin agrees too
    n = 1 << res
    for lon, lat, g in zip(lons, lats, got):
        ix = min(max(int((lon + 180.0) / 360.0 * n), 0), n - 1)
        iy = min(max(int((lat + 90.0) / 180.0 * n), 0), n - 1)
        assert (pyref._morton_spread(ix)
                | (pyref._morton_spread(iy) << 1)) == g


def test_quadkey_prefix_is_ancestor(spark):
    import random

    from pyspark.sql import functions as F

    from osm2geojson_spark.functions import cells as C

    rng = random.Random(5)
    rows = [(rng.uniform(-180, 180), rng.uniform(-85, 85))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    out = df.select(
        C.quadkey_expr(C.cell_expr(F.col("lon"), F.col("lat"), 8), 8)
        .alias("qk8"),
        C.quadkey_expr(C.cell_expr(F.col("lon"), F.col("lat"), 4), 4)
        .alias("qk4"),
        C.cell_expr(F.col("lon"), F.col("lat"), 8).alias("cell"),
        C.quadkey_to_cell_expr(
            C.quadkey_expr(C.cell_expr(F.col("lon"), F.col("lat"), 8), 8)
        ).alias("back"),
    ).collect()
    for r in out:
        assert len(r.qk8) == 8 and set(r.qk8) <= set("0123")
        assert r.qk8[:4] == r.qk4          # prefix IS the ancestor key
        assert r.back == r.cell            # string -> id inverse
        # digit definition: base-4 expansion of the Morton id, plus the
        # Bing digit rule (x bit + 2*y bit per level), independently
        want = "".join(str((r.cell >> (2 * (8 - 1 - i))) & 3)
                       for i in range(8))
        assert r.qk8 == want
