"""Map matching (spatial/match.py) vs hand cases and a bit-exact
numpy brute-force reference (same IEEE-754 operation order)."""

from __future__ import annotations

import numpy as np
import pytest

from osm2geojson_spark.spatial.match import map_match

PTS = "point_id long, px double, py double"
SEGS = "seg_id long, ax double, ay double, bx double, by double"


def _ref(points, segs, eps):
    """Brute-force reference with the operator's exact formula."""
    out = {}
    for pid, px, py in points:
        best = None
        for sid, ax, ay, bx, by in segs:
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            t = ((px - ax) * dx + (py - ay) * dy) / len2
            tc = 0.0 if t < 0 else (1.0 if t > 1 else t)
            cx, cy = ax + tc * dx, ay + tc * dy
            d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
            if d2 <= eps * eps and (best is None or (d2, sid) < best[:2]):
                best = (d2, sid, cx, cy)
        if best is not None:
            out[pid] = (best[1], best[0], best[2], best[3])
    return out


def _got(df):
    return {r["point_id"]: (r["seg_id"], r["dist2"],
                            r["snap_lon"], r["snap_lat"])
            for r in df.collect()}


def test_hand_cases(spark):
    segs = [(1, 0.0, 0.0, 1.0, 0.0),   # unit horizontal
            (2, 0.0, 2.0, 1.0, 2.0)]   # parallel, 2 above
    pts = [(10, 0.5, 0.5),    # interior projection onto seg 1
           (11, 2.0, 0.5),    # beyond B -> clamp to endpoint (1, 0)
           (12, -3.0, 0.0),   # 2 beyond A -> outside eps
           (13, 0.5, 1.0)]    # equidistant seg 1 / seg 2 -> min seg_id
    out = _got(map_match(spark.createDataFrame(pts, PTS),
                         spark.createDataFrame(segs, SEGS),
                         eps=1.5, res=5))
    assert out[10] == (1, 0.25, 0.5, 0.0)
    assert out[11] == (1, 1.25, 1.0, 0.0)
    assert 12 not in out
    assert out[13][0] == 1 and out[13][1] == 1.0


def test_matches_numpy_reference(spark):
    rng = np.random.default_rng(17)
    segs = []
    for sid in range(40):
        ax, ay = rng.uniform(-20, 20), rng.uniform(-10, 10)
        segs.append((sid, float(ax), float(ay),
                     float(ax + rng.uniform(-2, 2)),
                     float(ay + rng.uniform(0.1, 2))))
    pts = [(pid, float(rng.uniform(-22, 22)), float(rng.uniform(-12, 12)))
           for pid in range(400)]
    eps = 1.2
    # res 5 -> 11.25 deg cells: matches routinely cross cell borders,
    # exercising the eps-expanded covering's completeness
    out = _got(map_match(spark.createDataFrame(pts, PTS).repartition(7),
                         spark.createDataFrame(segs, SEGS),
                         eps=eps, res=5))
    ref = _ref(pts, segs, eps)
    assert set(out) == set(ref)
    for pid in ref:   # exact doubles: same IEEE op order on both sides
        assert out[pid] == ref[pid], pid
    assert len(ref) > 60  # the fixture actually matches a lot


def test_no_cartesian_in_plan(spark):
    segs = spark.createDataFrame([(1, 0.0, 0.0, 1.0, 0.0)], SEGS)
    pts = spark.createDataFrame([(1, 0.5, 0.1)], PTS)
    plan = map_match(pts, segs, eps=0.5, res=6)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
