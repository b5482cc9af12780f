"""IDW interpolation (spatial/interpolate): hand-computed weights,
stencil completeness, fold-order determinism, partition invariance."""

from __future__ import annotations

import math

from osm2geojson_spark.spatial.interpolate import idw_smooth


def _ref_idw(samples, res):
    """Pure-Python twin replaying the exact fold order."""
    n = 1 << res

    def ij(lon, lat):
        ix = min(max(math.floor((lon + 180.0) / 360.0 * n), 0), n - 1)
        iy = min(max(math.floor((lat + 90.0) / 180.0 * n), 0), n - 1)
        return ix, iy

    occupied = {ij(x, y) for _, x, y, _ in samples}
    buckets: dict = {}
    for o, x, y, v in samples:
        six, siy = ij(x, y)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                t = (six + dx, siy + dy)
                if 0 <= t[0] < n and 0 <= t[1] < n and t in occupied:
                    buckets.setdefault(t, []).append((o, x, y, v))
    out = {}
    for (tix, tiy), rows in buckets.items():
        cx = ((float(tix) + 0.5) / float(n)) * 360.0 - 180.0
        cy = ((float(tiy) + 0.5) / float(n)) * 180.0 - 90.0
        sw = swv = 0.0
        for o, x, y, v in sorted(rows):
            w = 1.0 / (((x - cx) * (x - cx) + (y - cy) * (y - cy)) + 1e-12)
            sw += w
            swv += w * v
        out[(tix, tiy)] = (len(rows), swv / sw)
    return out


def _run(spark, samples, res, parts=None):
    df = spark.createDataFrame(
        samples, "sample_id long, lon double, lat double, v double")
    if parts:
        df = df.repartition(parts)
    out = idw_smooth(df, value_col="v", res=res)
    return {(r.tix, r.tiy): (r.n_samples, r.idw) for r in out.collect()}


def test_single_sample_is_its_own_estimate(spark):
    got = _run(spark, [(1, 10.0, 20.0, 7.0)], res=4)
    assert len(got) == 1
    ((_, (n, v)),) = got.items()
    # (w*v)/w rounds twice, so require ulp-level closeness to v and
    # BIT-exact agreement with the reference fold
    assert n == 1 and abs(v - 7.0) < 1e-12
    assert got == _ref_idw([(1, 10.0, 20.0, 7.0)], 4)


def test_hand_two_samples(spark):
    samples = [(1, 10.0, 20.0, 4.0), (2, 10.1, 20.1, 8.0)]
    got = _run(spark, samples, res=4)
    ref = _ref_idw(samples, 4)
    assert got == ref
    # both samples land in one res-4 cell -> exactly its 1 occupied cell
    assert len(got) == 1 and got[next(iter(got))][0] == 2


def test_neighbor_stencil_in_and_out(spark):
    # res 4: cell width 22.5 deg; two samples in ADJACENT cells see each
    # other (3x3 stencil), a third two cells away does not
    samples = [(1, -170.0, 0.0, 1.0), (2, -150.0, 0.0, 10.0),
               (3, -100.0, 0.0, 100.0)]
    got = _run(spark, samples, res=4)
    ref = _ref_idw(samples, 4)
    assert got == ref
    # sample 3's cell is isolated: its estimate uses only itself
    n = 1 << 4
    ix3 = math.floor((-100.0 + 180.0) / 360.0 * n)
    iy3 = math.floor((0.0 + 90.0) / 180.0 * n)
    assert got[(ix3, iy3)][0] == 1


def test_random_field_matches_reference_and_partitions(spark):
    samples = [
        (k,
         ((k * 2654435761) % 360_000_000) / 1e6 - 180.0,
         ((k * 2246822519 + 1013904223) % 170_000_000) / 1e6 - 85.0,
         float((k * 13) % 1000))
        for k in range(1, 800)
    ]
    ref = _ref_idw(samples, 6)
    got = _run(spark, samples, res=6)
    assert got == ref  # bit-exact doubles, not approx
    assert _run(spark, samples, res=6, parts=13) == ref
