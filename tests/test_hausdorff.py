"""Hausdorff distance vs a brute-force python reference."""

from __future__ import annotations

import pytest

from osm2geojson_spark.spatial.hausdorff import collect_geoms, hausdorff_pairs


def _obj_pts(obj, m=10):
    return [((obj * 31 + i * 17) % 97, (obj * 29 + i * 13) % 89)
            for i in range(m)]


def _h_dir(a, b):
    return max(min((ax - bx) ** 2 + (ay - by) ** 2 for bx, by in b)
               for ax, ay in a)


@pytest.fixture(scope="module")
def geoms(spark):
    rows = [(obj, i, x, y)
            for obj in range(8)
            for i, (x, y) in enumerate(_obj_pts(obj))]
    pts = spark.createDataFrame(rows, "obj_id long, seq long, x long, y long")
    return collect_geoms(pts).cache()


def test_collect_geoms_orders_by_seq(geoms):
    row = geoms.where("obj_id = 3").first()
    assert [(p.x, p.y) for p in row.pts] == _obj_pts(3)


def test_hausdorff_matches_bruteforce(spark, geoms):
    pairs = spark.createDataFrame(
        [(a, b) for a in range(8) for b in range(8) if a < b],
        "id_a long, id_b long")
    got = {(r.id_a, r.id_b): (r.h_ab, r.h_ba, r.h_sq)
           for r in hausdorff_pairs(geoms, pairs).collect()}
    for (a, b), (h_ab, h_ba, h_sq) in got.items():
        pa, pb = _obj_pts(a), _obj_pts(b)
        assert h_ab == _h_dir(pa, pb)
        assert h_ba == _h_dir(pb, pa)
        assert h_sq == max(h_ab, h_ba)
    assert len(got) == 28


def test_hausdorff_identical_is_zero(spark, geoms):
    pairs = spark.createDataFrame([(2, 2)], "id_a long, id_b long")
    assert hausdorff_pairs(geoms, pairs).first().h_sq == 0


def test_hausdorff_asymmetry(spark):
    # B contains A, plus a far point: h(A,B)=0 but h(B,A) is large
    rows = [(0, 0, 0, 0), (1, 0, 0, 0), (1, 1, 100, 0)]
    geoms = collect_geoms(
        spark.createDataFrame(rows, "obj_id long, seq long, x long, y long"))
    pairs = geoms.sparkSession.createDataFrame([(0, 1)],
                                               "id_a long, id_b long")
    r = hausdorff_pairs(geoms, pairs).first()
    assert r.h_ab == 0 and r.h_ba == 10000 and r.h_sq == 10000
