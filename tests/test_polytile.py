"""MVT POLYGON tiles: integer Sutherland–Hodgman + winding + bytes.

Pins (1) the scalar clipper on hand geometry (identity, box-inside-
polygon, miss, crossing with rounding, degenerate slivers), (2) the
vectorized int64 kernel == the scalar reference across random rings
(the cross-engine exactness contract), (3) winding normalization
invariance (reversed input rings produce identical bytes), (4) hole
semantics incl. the net-zero invisible-feature drop, (5) the MVT
decoder round trip, (6) Spark == pyref end to end, (7) the bbox-fanout
guard."""

import random

import numpy as np
import pytest

from osm2geojson_spark.spatial.mvt import POLYGON, decode_tile
from osm2geojson_spark.spatial.polytile import (
    clip_ring,
    clip_rings_np,
    polygon_layer_bytes,
    shoelace2,
)

BOX = (0, 0, 99, 99)
SQ = [(10, 10), (20, 10), (20, 20), (10, 20)]


def test_ring_inside_is_identity():
    assert clip_ring(SQ, *BOX) == SQ


def test_box_inside_polygon_yields_full_box():
    big = [(-50, -50), (200, -50), (200, 200), (-50, 200)]
    out = clip_ring(big, *BOX)
    assert sorted(out) == [(0, 0), (0, 99), (99, 0), (99, 99)]
    assert abs(shoelace2(out)) == 2 * 99 * 99


def test_ring_fully_outside_is_none():
    assert clip_ring(SQ, 50, 50, 60, 60) is None


def test_degenerate_clip_is_none():
    # triangle touches the box only along one edge -> zero-area sliver
    tri = [(99, 0), (99, 50), (150, 25)]
    assert clip_ring(tri, *BOX) is None or shoelace2(clip_ring(tri, *BOX)) != 0


def test_crossing_rounds_half_up():
    tri = [(0, 0), (7, 3), (2, 9)]
    assert clip_ring(tri, 2, 1, 5, 8) == [
        (2, 1), (5, 2), (5, 5), (3, 8), (2, 8)]


def test_orientation_preserved_by_clipper():
    cw = list(reversed(SQ))
    out = clip_ring(cw, *BOX)
    assert shoelace2(out) == -shoelace2(SQ)


def test_vectorized_matches_scalar_random():
    rng = random.Random(7)
    rings, boxes = [], []
    for _ in range(400):
        m = rng.randint(3, 9)
        rings.append([(rng.randint(-40, 140), rng.randint(-40, 140))
                      for _ in range(m)])
        bx0 = rng.randint(-20, 80)
        by0 = rng.randint(-20, 80)
        boxes.append((bx0, by0, bx0 + rng.randint(1, 60),
                      by0 + rng.randint(1, 60)))
    xs = np.concatenate([np.array([p[0] for p in g]) for g in rings])
    ys = np.concatenate([np.array([p[1] for p in g]) for g in rings])
    lens = np.array([len(g) for g in rings])
    b = np.array(boxes).T
    keep, cx, cy, cl, a2 = clip_rings_np(xs, ys, lens, b[0], b[1], b[2], b[3])
    got = {}
    s = 0
    for i, (k, n) in enumerate(zip(keep, cl)):
        got[int(k)] = list(zip(cx[s:s + n].tolist(), cy[s:s + n].tolist()))
        assert shoelace2(got[int(k)]) == a2[i]
        s += n
    for i, (g, bx) in enumerate(zip(rings, boxes)):
        assert got.get(i) == clip_ring(g, *bx), f"ring {i}"


def test_layer_bytes_winding_normalized():
    # same geometry, one ring given CW and one CCW -> identical bytes
    ccw = [(a2 := shoelace2(SQ), SQ)]
    cw_ring = [SQ[0]] + SQ[:0:-1]
    cw = [(shoelace2(cw_ring), cw_ring)]
    assert a2 > 0
    assert (polygon_layer_bytes([(1, ccw)]) ==
            polygon_layer_bytes([(1, cw)]))


def test_decode_round_trip_with_hole():
    hole = [(12, 12), (14, 12), (14, 14), (12, 14)]
    feats = [(7, [(shoelace2(SQ), SQ), (shoelace2(hole), hole)])]
    buf = polygon_layer_bytes(feats, name="polys", extent=4096)
    lay = decode_tile(buf)[0]
    assert lay["name"] == "polys"
    (feat,) = lay["features"]
    assert feat["id"] == 7 and feat["type"] == POLYGON
    (p0, p1) = feat["parts"]
    assert p0[0] and p1[0]  # both closed
    assert shoelace2(p0[1]) > 0 > shoelace2(p1[1])  # spec winding rule
    assert set(p0[1]) == set(SQ) and set(p1[1]) == set(hole)


@pytest.fixture(scope="module")
def poly_df(spark):
    # two octagon-ish polygons with holes spanning tile borders at res 3
    rows = []
    polys = {
        1: ([(-30.0, -20.0), (40.0, -25.0), (50.0, 30.0), (-20.0, 35.0)],
            [(0.0, 0.0), (10.0, 2.0), (5.0, 9.0)]),
        2: ([(100.0, 10.0), (140.0, 12.0), (139.0, 44.0), (101.0, 42.0)],
            None),
    }
    for pid, (ext, hole) in polys.items():
        for i, (lon, lat) in enumerate(ext):
            rows.append((pid, 0, i, lon, lat))
        for i, (lon, lat) in enumerate(hole or []):
            rows.append((pid, 1, i, lon, lat))
    return (spark.createDataFrame(
        rows, "poly_id long, ring long, pos long, lon double, lat double"),
        polys)


def test_polygon_tiles_matches_pyref(poly_df):
    from osm2geojson_spark import pyref
    from osm2geojson_spark.spatial.polytile import polygon_tiles

    df, polys = poly_df
    got = {
        r["tile"]: (r["n_features"], r["n_rings"], bytes(r["mvt"]).hex().upper())
        for r in polygon_tiles(df, res=3, extent=4096).collect()}
    ref_in = [(pid, [ext] + ([hole] if hole else []))
              for pid, (ext, hole) in sorted(polys.items())]
    exp = {t: (nf, nr, hx)
           for t, nf, nr, hx in pyref.ref_polygon_tiles(ref_in, res=3)}
    assert got == exp
    assert len(got) >= 4  # genuinely spans multiple tiles


def test_polygon_tiles_partition_invariance(poly_df):
    from osm2geojson_spark.spatial.polytile import polygon_tiles

    df, _ = poly_df
    a = {r["tile"]: bytes(r["mvt"])
         for r in polygon_tiles(df, res=3).collect()}
    b = {r["tile"]: bytes(r["mvt"])
         for r in polygon_tiles(df.repartition(13), res=3).collect()}
    assert a == b


def test_net_zero_feature_dropped(spark):
    # hole == exterior: invisible everywhere -> no features, but the
    # tile row still appears (rings reached the render)
    from osm2geojson_spark.spatial.polytile import polygon_tiles

    sq = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]
    rows = [(1, r, i, lon, lat)
            for r in (0, 1) for i, (lon, lat) in enumerate(sq)]
    df = spark.createDataFrame(
        rows, "poly_id long, ring long, pos long, lon double, lat double")
    out = polygon_tiles(df, res=3, extent=4096).collect()
    assert len(out) == 1 and out[0]["n_features"] == 0


def test_fanout_guard_raises(spark):
    from osm2geojson_spark.spatial.polytile import polygon_tiles

    world = [(-179.0, -80.0), (179.0, -80.0), (179.0, 80.0), (-179.0, 80.0)]
    df = spark.createDataFrame(
        [(1, 0, i, lon, lat) for i, (lon, lat) in enumerate(world)],
        "poly_id long, ring long, pos long, lon double, lat double")
    with pytest.raises(Exception, match="max_tiles_per_ring"):
        polygon_tiles(df, res=8, extent=4096,
                      max_tiles_per_ring=16).collect()
