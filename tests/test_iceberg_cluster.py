"""Hilbert clustering + manifest file-skipping (plans/iceberg_layout):
footer stats land in manifests, plan_files prunes on intervals,
clustered layouts skip most files for spatial box queries while
unclustered layouts skip none, and pruned reads stay value-correct."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.plans.iceberg_layout import IcebergLikeTable

N = 20_000
BOX = {"lon": (10.0, 20.0), "lat": (40.0, 45.0)}  # ~0.08% of the domain


def _points(spark, n=N):
    return spark.range(n).select(
        F.col("id"),
        (((F.col("id") * 2654435761) % 360_000_000).cast("double")
         / 1e6 - 180.0).alias("lon"),
        (((F.col("id") * 2246822519 + 1013904223) % 170_000_000)
         .cast("double") / 1e6 - 85.0).alias("lat"))


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("iceberg_cluster")
    pts = _points(spark)

    flat = IcebergLikeTable(str(root / "flat"))
    flat.append(pts.repartition(16), stats_cols=["lon", "lat"])

    clus = IcebergLikeTable(str(root / "clustered"))
    clus.append(pts.repartition(16), stats_cols=["lon", "lat"])
    clus.cluster(spark, "lon", "lat", n_files=16)
    return flat, clus


def test_manifest_carries_footer_stats(tables):
    flat, clus = tables
    for t in (flat, clus):
        entries = t._entries()
        assert entries and all("stats" in e for e in entries)
        for e in entries:
            lo, hi = e["stats"]["lon"]
            assert -180.0 <= lo <= hi <= 180.0
            lo, hi = e["stats"]["lat"]
            assert -85.0 <= lo <= hi <= 85.0


def test_clustered_files_have_tight_bounds(tables):
    _, clus = tables
    # mean per-file bbox area after Hilbert clustering is a small
    # fraction of the domain (an unclustered file spans all of it)
    areas = []
    for e in clus._entries():
        (x0, x1), (y0, y1) = e["stats"]["lon"], e["stats"]["lat"]
        areas.append((x1 - x0) * (y1 - y0))
    domain = 360.0 * 170.0
    assert np.mean(areas) < 0.25 * domain


def test_skipping_ratio_and_correctness(spark, tables):
    flat, clus = tables
    kept_flat, total_flat = flat.plan_files(BOX)
    kept_clus, total_clus = clus.plan_files(BOX)
    # unclustered: every file spans the domain -> nothing prunes
    assert len(kept_flat) == total_flat == 16
    # clustered: the tiny box touches a small minority of files
    assert total_clus == 16
    # a 10°x5° box may straddle a few Hilbert segments, but never most
    assert len(kept_clus) <= 6, (len(kept_clus), total_clus)

    pred = ((F.col("lon") >= BOX["lon"][0]) & (F.col("lon") <= BOX["lon"][1])
            & (F.col("lat") >= BOX["lat"][0]) & (F.col("lat") <= BOX["lat"][1]))
    full = sorted(r["id"] for r in flat.read(spark).filter(pred).collect())
    pruned = sorted(r["id"] for r in
                    clus.read(spark, prune=BOX).filter(pred).collect())
    assert pruned == full and len(full) > 0


def test_prune_to_empty_returns_typed_empty(spark, tables):
    _, clus = tables
    out = clus.read(spark, prune={"lon": (999.0, 1000.0)})
    assert out.count() == 0
    assert set(out.columns) == {"id", "lon", "lat"}


def test_pruning_without_stats_is_safe(spark, tmp_path):
    # a table appended WITHOUT stats_cols never prunes (superset rule)
    t = IcebergLikeTable(str(tmp_path / "nostats"))
    t.append(_points(spark, 1000).repartition(4))
    kept, total = t.plan_files(BOX)
    assert len(kept) == total == 4


def test_cluster_is_a_replace_commit(spark, tables):
    _, clus = tables
    snaps = clus.snapshots()
    assert snaps[-1]["summary"]["operation"] == "cluster"
    # pre-cluster snapshot still time-travelable
    first = snaps[0]["snapshot_id"]
    assert clus.read(spark, snapshot_id=first).count() == N
