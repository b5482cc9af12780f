"""Mapbox Vector Tile codec (spatial/mvt): wire-format unit vectors,
hand-assembled byte pins, geometry command round-trips, and the Spark
operator == Spark-free pyref twin byte-for-byte."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark import pyref
from osm2geojson_spark.spatial import mvt as M


def test_varint_vectors():
    # protobuf's published example: 300 -> AC 02
    assert M._varint(0) == b"\x00"
    assert M._varint(1) == b"\x01"
    assert M._varint(127) == b"\x7f"
    assert M._varint(300) == b"\xac\x02"
    assert M._varint(4096) == b"\x80\x20"
    with pytest.raises(ValueError):
        M._varint(-1)


def test_zigzag_vectors():
    # spec table: 0->0, -1->1, 1->2, -2->3, 2147483647 -> 4294967294
    for plain, zz in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4),
                      (2147483647, 4294967294), (-2147483648, 4294967295)]:
        assert M._zigzag(plain) == zz
        assert M._unzigzag(zz) == plain


def test_single_point_tile_hand_bytes():
    # one POINT at pixel (3, 5) with count 2 — every byte derived by
    # hand from vector-tile-spec 2.1 + protobuf wire rules
    buf = M.point_layer_bytes([(3, 5, 2)], extent=4096)
    feature = bytes(
        [0x08, 0x83, 0xA0, 0x01]    # id = 5*4096+3 = 20483 = (1,32,3)_128
        + [0x12, 0x02, 0x00, 0x00]  # tags = [0, 0]
        + [0x18, 0x01]              # type = POINT
        + [0x22, 0x03, 0x09, 0x06, 0x0A]  # geom: MoveTo(1), zz(3), zz(5)
    )
    layer = (
        bytes([0x78, 0x02])                     # version = 2
        + bytes([0x0A, 0x06]) + b"points"       # name
        + bytes([0x12, len(feature)]) + feature # feature
        + bytes([0x1A, 0x01]) + b"n"            # keys = ["n"]
        + bytes([0x22, 0x02, 0x20, 0x02])       # values = [int 2]
        + bytes([0x28, 0x80, 0x20])             # extent = 4096
    )
    assert buf == bytes([0x1A, len(layer)]) + layer


def test_geometry_roundtrip_lines_and_polygons():
    # multi-part linestring with negative deltas
    parts = [[(2, 2), (2, 10), (10, 10)], [(1, 1), (3, 5)]]
    cmds = M.encode_geometry(parts, M.LINESTRING)
    assert M.decode_geometry(cmds) == [(False, parts[0]), (False, parts[1])]
    # polygon: ClosePath, closing vertex implicit
    ring = [(3, 6), (8, 12), (20, 34)]
    cmds = M.encode_geometry([ring], M.POLYGON)
    assert M.decode_geometry(cmds) == [(True, ring)]
    # spec 4.3.5.1 example: MoveTo(25,17) is literally 09 32 22
    assert M.encode_geometry([[(25, 17)]], M.POINT)[:3] == [9, 50, 34]


def test_geometry_guards():
    with pytest.raises(ValueError):
        M.encode_geometry([[]], M.LINESTRING)
    with pytest.raises(ValueError):
        M.encode_geometry([[(0, 0), (1, 1)]], M.POINT)


def test_value_messages_roundtrip():
    for v in ["abc", 0, 7, -4, True, False]:
        assert M._decode_value(M._value_msg(v)) == v


def test_spark_equals_pyref_twin(spark):
    rows = [((k * 2654435761) % 360_000_000 / 1e6 - 180.0,
             (k * 2246822519 + 1013904223) % 170_000_000 / 1e6 - 85.0)
            for k in range(1, 600)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    got = sorted(
        (r.tile, r.n_features, r.n_pts, bytes(r.mvt).hex().upper())
        for r in M.vector_tiles(df, res=3).collect())
    assert got == pyref.ref_vector_tiles(rows, res=3)
    # partition invariance: same bytes from a different layout
    got13 = sorted(
        (r.tile, r.n_features, r.n_pts, bytes(r.mvt).hex().upper())
        for r in M.vector_tiles(df.repartition(13), res=3).collect())
    assert got13 == got


def test_spark_tile_decodes_to_binned_counts(spark):
    # decoded feature set == independent per-pixel histogram
    import math
    from collections import Counter

    rows = [(-10.0 + i * 0.003, 5.0 + (i * 7 % 11) * 0.002)
            for i in range(400)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    out = M.vector_tiles(df, res=3).collect()
    n = 1 << 15
    ref = Counter()
    for lon, lat in rows:
        ix = min(max(math.floor((lon + 180.0) / 360.0 * n), 0), n - 1)
        iy = min(max(math.floor((lat + 90.0) / 180.0 * n), 0), n - 1)
        ref[(ix, iy)] += 1
    decoded = {}
    for r in out:
        lay = M.decode_tile(bytes(r.mvt))[0]
        assert lay["version"] == 2 and lay["extent"] == 4096
        assert lay["keys"] == ["n"]
        tx = ty = None  # recover tile grid origin from the Morton tile
        for f in lay["features"]:
            (closed, [(px, py)]), = f["parts"]
            assert not closed and f["type"] == M.POINT
            assert f["id"] == py * 4096 + px
            count = lay["values"][f["tags"][1]]
            decoded[(r.tile, px, py)] = count
    # map ref pixels into (tile, local) space and compare exactly
    exp = {}
    for (ix, iy), c in ref.items():
        tile = (pyref._morton_spread(ix >> 12)
                | (pyref._morton_spread(iy >> 12) << 1))
        exp[(tile, ix & 4095, iy & 4095)] = c
    assert decoded == exp


def test_extent_guards(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    with pytest.raises(ValueError):
        M.vector_tiles(df, res=3, extent=1000)
    with pytest.raises(ValueError):
        M.vector_tiles(df, res=15, extent=4096)  # 15 + 12 > MAX_RES 26


def test_vectorized_point_layer_matches_python_twin():
    # the numpy batch encoder (point_layer_bytes) must be byte-identical
    # to the per-feature wire writer (point_layer_bytes_py) across edge
    # cases: empty tile, corner pixels, multi-byte varint counts
    import random

    import numpy as np

    random.seed(7)
    cases = [
        [],
        [(3, 5, 2)],
        [(0, 0, 1)],
        [(4095, 4095, 1), (0, 0, 1)],
        [(10, 10, 1 << 40), (11, 10, 3), (10, 11, 1 << 40)],
    ]
    for _ in range(20):
        cases.append([
            (random.randint(0, 4095), random.randint(0, 4095),
             random.randint(1, 1 << random.randint(1, 50)))
            for _ in range(random.randint(1, 300))])
    for pix in cases:
        assert M.point_layer_bytes(pix) == M.point_layer_bytes_py(pix)
    # ndarray input path (what the Spark kernel passes) is identical too
    arr = np.asarray(cases[4], dtype=np.int64)
    assert M.point_layer_bytes(arr) == M.point_layer_bytes_py(cases[4])


def test_reader_foreign_wire_types():
    # fixed64 double Value (wire type 1) from foreign MVT writers decodes
    import struct

    buf = bytes([(3 << 3) | 1]) + struct.pack("<d", 2.5)
    assert M._decode_value(buf) == 2.5
    buf32 = bytes([(2 << 3) | 5]) + struct.pack("<f", 1.5)
    assert M._decode_value(buf32) == 1.5
    # truncated fixed32/fixed64 raise instead of silently short-slicing
    with pytest.raises(ValueError):
        list(M._Reader(bytes([(2 << 3) | 5, 0x01])).fields())
    with pytest.raises(ValueError):
        list(M._Reader(bytes([(3 << 3) | 1, 0x01, 0x02])).fields())
