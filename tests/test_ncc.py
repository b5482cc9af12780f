"""Template matching (spatial/ncc.py) vs full-array numpy reference.

Pins (1) cross/sf/sf2 exactness for valid-mode anchors on random
tiles with a signed template (zeros included — the skip branch), (2)
the anchor set is exactly the fully-inside window positions, (3)
1×1 and full-tile template edge cases, (4) partition invariance,
(5) the template-size guard."""

import numpy as np
import pytest

from osm2geojson_spark.spatial.focal import synth_dem_tiles
from osm2geojson_spark.spatial.ncc import match_template_tiles

T, TX, TY = 8, 3, 2


def _make_value_fn():
    # nested closure: cloudpickle ships it BY VALUE — a module-level
    # test function pickles by reference and executors can't import
    # the test module
    def fn(gx, gy):
        h = (gx * 2654435761 + gy * 97 + 13) & 0xFFFFFFFF
        return ((h >> 5) ^ h) % 400 - 100
    return fn


_value_fn = _make_value_fn()


def _full():
    gx = np.arange(TX * T, dtype=np.int64)[None, :]
    gy = np.arange(TY * T, dtype=np.int64)[:, None]
    return np.broadcast_to(_value_fn(gx, gy), (TY * T, TX * T)).copy()


def _ref(full, tmpl):
    th, tw = tmpl.shape
    h, w = full.shape
    rows = {}
    for y in range(h - th + 1):
        for x in range(w - tw + 1):
            win = full[y:y + th, x:x + tw]
            rows[(x, y)] = (int((win * tmpl).sum()), int(win.sum()),
                            int((win.astype(np.int64) ** 2).sum()))
    return rows


@pytest.fixture(scope="module")
def tiles(spark):
    return synth_dem_tiles(spark, TX, TY, T, value_fn=_value_fn).cache()


@pytest.mark.parametrize("shape", [(3, 4), (1, 1), (T, T)])
def test_matches_reference(tiles, shape):
    rng = np.random.RandomState(42)
    tmpl = rng.randint(-3, 4, size=shape).astype(np.int64)
    tmpl[0, 0] = 0  # exercise the zero-skip branch
    got = {(r["x"], r["y"]): (r["cross"], r["sf"], r["sf2"])
           for r in match_template_tiles(tiles, T, tmpl, TX, TY).collect()}
    exp = _ref(_full(), tmpl)
    assert got == exp


def test_partition_invariance(spark):
    tmpl = np.array([[1, -2], [0, 3]], dtype=np.int64)
    base = synth_dem_tiles(spark, TX, TY, T, value_fn=_value_fn)
    a = {(r["x"], r["y"]): (r["cross"], r["sf"], r["sf2"]) for r in
         match_template_tiles(base.repartition(1), T, tmpl, TX, TY)
         .collect()}
    b = {(r["x"], r["y"]): (r["cross"], r["sf"], r["sf2"]) for r in
         match_template_tiles(base.repartition(11), T, tmpl, TX, TY)
         .collect()}
    assert a == b


def test_template_size_guard(tiles):
    with pytest.raises(ValueError):
        match_template_tiles(tiles, T, np.ones((T + 1, 2)), TX, TY)
