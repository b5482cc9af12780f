"""Property-based tests (hypothesis) for the pure-python kernels —
mirrors the reference's randomized-invariant style (SortingWriterTest's
random no-loss test, SURVEY §5) without a SparkSession (fast)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm2geojson_spark.functions.cells import (
    cell_center_np,
    decode_np,
    disk_np,
    encode_np,
)
from osm2geojson_spark.functions.geometry import (
    _signed_area,
    build_multipolygon,
    stitch_rings,
)
from osm2geojson_spark.synth.images import (
    decode_bmp,
    decode_ppm,
    decode_qz6,
    encode_bmp,
    encode_ppm,
    encode_qz6,
    phash64,
)

lons = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=89.999999, allow_nan=False)


# ----------------------------------------------------------------- cells
@settings(max_examples=200, deadline=None)
@given(lons, lats, st.integers(min_value=1, max_value=15))
def test_cell_roundtrip_contains_point(lon, lat, res):
    """encode → decode(ix,iy) → the cell's bbox contains the point."""
    cell = encode_np(np.array([lon]), np.array([lat]), res)
    ix, iy = decode_np(cell, res)
    n = 1 << res
    assert 0 <= ix[0] < n and 0 <= iy[0] < n
    clon, clat = cell_center_np(cell, res)
    assert abs(clon[0] - lon) <= 360.0 / n
    assert abs(clat[0] - lat) <= 180.0 / n


@settings(max_examples=50, deadline=None)
@given(lons, lats, st.integers(min_value=2, max_value=10),
       st.integers(min_value=1, max_value=3))
def test_disk_contains_center_and_parent_consistency(lon, lat, res, k):
    cell = encode_np(np.array([lon]), np.array([lat]), res)
    disk = disk_np(cell, res, k)[0]
    assert cell[0] in disk
    valid = disk[disk >= 0]
    assert len(set(valid.tolist())) == len(valid)  # no duplicate cells
    # hierarchy: parent at res-1 = cell >> 2
    parent = encode_np(np.array([lon]), np.array([lat]), res - 1)
    assert (cell[0] >> 2) == parent[0]


# -------------------------------------------------------------- stitcher
@st.composite
def split_rings(draw):
    """A random closed CCW square ring, split into 2-4 chained fragments,
    each randomly reversed."""
    cx = draw(st.floats(min_value=-170, max_value=170, allow_nan=False))
    cy = draw(st.floats(min_value=-80, max_value=80, allow_nan=False))
    s = draw(st.floats(min_value=0.01, max_value=5.0, allow_nan=False))
    ids = list(range(1, 9))
    pts = [(cx, cy), (cx + s, cy), (cx + s, cy + s / 2), (cx + s, cy + s),
           (cx, cy + s), (cx, cy + s / 2), (cx, cy), ]
    node_ids = [1, 2, 3, 4, 5, 6, 1]
    cuts = sorted(draw(st.sets(st.integers(min_value=1, max_value=5),
                               min_size=1, max_size=3)))
    bounds = [0, *cuts, 6]
    frags = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        ids_f = node_ids[a:b + 1]
        coords_f = np.asarray(pts[a:b + 1], dtype=np.float64)
        if draw(st.booleans()):
            ids_f = ids_f[::-1]
            coords_f = coords_f[::-1]
        frags.append(("outer", ids_f, coords_f))
    order = draw(st.permutations(range(len(frags))))
    return [frags[i] for i in order]


@settings(max_examples=100, deadline=None)
@given(split_rings())
def test_stitch_reassembles_any_split_order_direction(frags):
    rings, leftover = stitch_rings(frags)
    assert leftover == []
    assert len(rings) == 1
    role, ring = rings[0]
    assert (ring[0] == ring[-1]).all()
    mp, n_rev, n_unc = build_multipolygon(frags)
    assert mp is not None and n_unc == 0
    assert _signed_area(np.asarray(mp[0][0])) > 0  # normalized CCW


# ----------------------------------------------------------------- codecs
rgb = st.integers(min_value=0, max_value=255)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=9999), st.integers(min_value=8, max_value=40),
       st.integers(min_value=8, max_value=40))
def test_codec_roundtrips(seed, w, h):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    rec = decode_qz6(encode_qz6(px))
    assert int(np.abs(rec.astype(int) - px.astype(int)).max()) <= 3
    # idempotence: re-encoding the lossy decode is lossless
    assert np.array_equal(decode_qz6(encode_qz6(rec)), rec)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=9999))
def test_phash_stable_under_qz6(seed):
    """phash of the lossy re-encode stays within hamming 10 of the
    original (near-dup detectability invariant)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8).repeat(4, 0).repeat(4, 1)
    h1 = phash64(base)
    h2 = phash64(decode_qz6(encode_qz6(base)))
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 10


def test_simhash_invariants():
    """SimHash column expr invariants via a throwaway local session are
    covered in catalog runs; here pin the pure construction property on
    the JVM side through a minimal DataFrame."""
    # (kept numpy-free: simhash is JVM-only; see tests/test_entry.py
    # catalog runs for execution coverage)
    from osm2geojson_spark.operators.dedup import _P

    assert _P == 2_147_483_647  # 2^31-1: a*h+b stays within int64
