"""densify_paths: exact floor-division interpolation vs python //."""

from __future__ import annotations

import pytest

from osm2geojson_spark.spatial.hausdorff import collect_geoms
from osm2geojson_spark.spatial.simplify import densify_paths


def _ref_densify(path, k):
    out = []
    for j in range(len(path) - 1):
        (ax, ay), (bx, by) = path[j], path[j + 1]
        for i in range(k):
            out.append((ax + ((bx - ax) * i) // k,
                        ay + ((by - ay) * i) // k))
    out.append(path[-1])
    return out


PATHS = {
    0: [(0, 0), (10, 0), (10, 7), (3, -5)],          # negative deltas
    1: [(5, 5)],                                     # single point
    2: [(100, 100), (100, 100), (93, 108)],          # repeated vertex
}


@pytest.fixture(scope="module")
def geoms(spark):
    rows = [(obj, i, x, y)
            for obj, path in PATHS.items()
            for i, (x, y) in enumerate(path)]
    return collect_geoms(
        spark.createDataFrame(rows,
                              "obj_id long, seq long, x long, y long"))


@pytest.mark.parametrize("k", [1, 3, 4])
def test_densify_matches_python_floor_div(geoms, k):
    got = {}
    for r in densify_paths(geoms, k).collect():
        got.setdefault(r.obj_id, []).append((r.seq, r.x, r.y))
    for obj, path in PATHS.items():
        pts = [(x, y) for _, x, y in sorted(got[obj])]
        if len(path) == 1:
            assert pts == path
        else:
            assert pts == _ref_densify(path, k)
            # original vertices survive at seq = j*k
            seqs = {s: (x, y) for s, x, y in got[obj]}
            for j, v in enumerate(path[:-1]):
                assert seqs[j * k] == v
            assert seqs[(len(path) - 1) * k] == path[-1]


def test_densify_k1_is_identity(geoms):
    rows = densify_paths(geoms, 1).collect()
    got = {}
    for r in rows:
        got.setdefault(r.obj_id, []).append((r.x, r.y))
    for obj, path in PATHS.items():
        assert sorted(got[obj]) == sorted(path)


def test_densify_rejects_bad_k(geoms):
    with pytest.raises(ValueError):
        densify_paths(geoms, 0)
