"""Copy-on-write upsert (plans/iceberg_layout.IcebergLikeTable.upsert):
minimal file rewrite via manifest key-range stats, atomic REPLACE
commit, time travel, and GC safety of carried-by-reference files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.plans.iceberg_layout import IcebergLikeTable


def _rows(spark, lo, hi, tag):
    return (spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit(tag), F.col("id").cast("string"))
        .alias("val")))


@pytest.fixture()
def table(spark, tmp_path):
    t = IcebergLikeTable(str(tmp_path / "tbl"))
    # three single-file commits with disjoint id ranges + footer stats
    for lo in (0, 100, 200):
        t.append(_rows(spark, lo, lo + 100, "v1-").coalesce(1),
                 stats_cols=["id"])
    return t


def test_minimal_rewrite_set(spark, table):
    updates = _rows(spark, 150, 160, "v2-")
    res = table.upsert(spark, updates, "id")
    assert res["files_rewritten"] == 1          # only the 100-199 file
    assert res["files_carried"] == 2
    assert res["rows_upserted"] == 10

    got = {r["id"]: r["val"] for r in table.read(spark).collect()}
    assert len(got) == 300
    assert got[155] == "v2-155"
    assert got[150] == "v2-150"
    assert got[149] == "v1-149"                 # same file, not updated
    assert got[0] == "v1-0" and got[299] == "v1-299"   # carried files


def test_insert_new_keys(spark, table):
    updates = _rows(spark, 1000, 1003, "new-")
    res = table.upsert(spark, updates, "id")
    assert res["files_rewritten"] == 0          # no range contains 1000+
    got = {r["id"]: r["val"] for r in table.read(spark).collect()}
    assert len(got) == 303 and got[1000] == "new-1000"


def test_time_travel_preserves_pre_merge(spark, table):
    before = table.snapshots()[-1]["snapshot_id"]
    table.upsert(spark, _rows(spark, 0, 5, "v2-"), "id")
    old = {r["id"]: r["val"]
           for r in table.read(spark, snapshot_id=before).collect()}
    assert old[0] == "v1-0"
    new = {r["id"]: r["val"] for r in table.read(spark).collect()}
    assert new[0] == "v2-0"


def test_no_stats_files_conservatively_rewritten(spark, tmp_path):
    t = IcebergLikeTable(str(tmp_path / "tbl2"))
    t.append(_rows(spark, 0, 50, "v1-").coalesce(1))          # NO stats
    t.append(_rows(spark, 50, 100, "v1-").coalesce(1), stats_cols=["id"])
    res = t.upsert(spark, _rows(spark, 999, 1000, "x-"), "id")
    # stat-less file must be rewritten (could contain the key); the
    # stats file proves disjointness and carries over
    assert res["files_rewritten"] == 1 and res["files_carried"] == 1
    assert t.read(spark).count() == 101


def test_partitioned_table_rejected(spark, tmp_path):
    t = IcebergLikeTable(str(tmp_path / "tbl3"))
    df = _rows(spark, 0, 10, "v1-").withColumn("p", F.col("id") % 2)
    t.append(df, partition_by="p")
    with pytest.raises(ValueError, match="unpartitioned"):
        t.upsert(spark, df, "id")


def test_gc_keeps_carried_files(spark, table):
    """After upsert, expire_snapshots must NOT delete old-commit parquet
    files that the new manifest carries by reference — only the
    rewritten file becomes unreferenced."""
    table.upsert(spark, _rows(spark, 150, 160, "v2-"), "id")
    table.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    got = {r["id"]: r["val"] for r in table.read(spark).collect()}
    assert len(got) == 300
    assert got[0] == "v1-0" and got[155] == "v2-155" and got[299] == "v1-299"


def test_upsert_then_prune_reads_updated_values(spark, table):
    """New files get footer stats too, so plan-time pruning keeps
    working across a merge."""
    table.upsert(spark, _rows(spark, 150, 160, "v2-"), "id")
    kept, total = table.plan_files({"id": (150, 159)})
    assert len(kept) < total
    rows = table.read(spark, prune={"id": (150, 159)}) \
        .where(F.col("id").between(150, 159)).collect()
    assert {r["val"] for r in rows} == {f"v2-{i}" for i in range(150, 160)}


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


# ------------------------------------------------- merge-on-read deletes

def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_mor_delete_hides_rows_without_rewrite(spark, table):
    files_before = set(table._files())
    res = table.delete_keys(spark, _keys(spark, [5, 6, 250]), "id")
    assert res["keys_deleted"] == 3
    assert set(table._files()) == files_before     # zero data files touched
    got = {r["id"] for r in table.read(spark).collect()}
    assert len(got) == 297 and not {5, 6, 250} & got


def test_mor_delete_time_travel(spark, table):
    before = table.snapshots()[-1]["snapshot_id"]
    table.delete_keys(spark, _keys(spark, [7]), "id")
    assert 7 in {r["id"] for r in
                 table.read(spark, snapshot_id=before).collect()}
    assert 7 not in {r["id"] for r in table.read(spark).collect()}


def test_mor_readd_after_delete_survives(spark, table):
    """Sequence-number rule: a key appended AFTER the delete is newer
    than the delete file and must not be suppressed."""
    table.delete_keys(spark, _keys(spark, [42]), "id")
    assert 42 not in {r["id"] for r in table.read(spark).collect()}
    table.append(_rows(spark, 42, 43, "readd-").coalesce(1),
                 stats_cols=["id"])
    got = {r["id"]: r["val"] for r in table.read(spark).collect()}
    assert got[42] == "readd-42"


def test_compact_materializes_deletes(spark, table):
    table.delete_keys(spark, _keys(spark, [1, 2, 3]), "id")
    assert table._delete_specs()
    table.compact(spark, files_per_partition=2)
    assert not table._delete_specs()
    got = {r["id"] for r in table.read(spark).collect()}
    assert len(got) == 297 and not {1, 2, 3} & got


def test_upsert_blocked_by_outstanding_deletes(spark, table):
    table.delete_keys(spark, _keys(spark, [9]), "id")
    with pytest.raises(ValueError, match="outstanding equality deletes"):
        table.upsert(spark, _rows(spark, 0, 1, "x-"), "id")
    table.compact(spark)
    res = table.upsert(spark, _rows(spark, 0, 1, "x-"), "id")
    assert res["rows_upserted"] == 1
    got = {r["id"]: r["val"] for r in table.read(spark).collect()}
    assert got[0] == "x-0" and 9 not in got


def test_snapshot_diff_changelog(spark, table):
    s1 = table.snapshots()[-1]["snapshot_id"]
    # change 5 keys, insert 3 new, then MOR-delete 4 others
    table.upsert(spark,
                 _rows(spark, 10, 15, "v2-").unionByName(
                     _rows(spark, 900, 903, "new-")), "id",
                 stats_cols=["id"])
    table.delete_keys(spark, spark.range(250, 254).select("id"), "id")
    s2 = table.snapshots()[-1]["snapshot_id"]
    d = table.snapshot_diff(spark, s1, s2, "id")
    assert sorted(r.id for r in d["added"].collect()) == [900, 901, 902]
    assert sorted(r.id for r in d["removed"].collect()) \
        == [250, 251, 252, 253]
    ch = {r.id: (r.val, r.val_before) for r in d["changed"].collect()}
    assert ch == {i: (f"v2-{i}", f"v1-{i}") for i in range(10, 15)}


def test_snapshot_diff_identity_is_empty(spark, table):
    s = table.snapshots()[-1]["snapshot_id"]
    d = table.snapshot_diff(spark, s, s, "id")
    assert d["added"].count() == 0
    assert d["removed"].count() == 0
    assert d["changed"].count() == 0


def test_snapshot_diff_unchanged_upsert_rows_not_flagged(spark, table):
    # upserting the SAME value must not appear as a change
    s1 = table.snapshots()[-1]["snapshot_id"]
    table.upsert(spark, _rows(spark, 20, 22, "v1-"), "id",
                 stats_cols=["id"])
    s2 = table.snapshots()[-1]["snapshot_id"]
    d = table.snapshot_diff(spark, s1, s2, "id")
    assert d["changed"].count() == 0
    assert d["added"].count() == 0 and d["removed"].count() == 0
