from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.shards import pack_shards, shard_manifest


def _df(spark, items):
    return spark.createDataFrame(
        [(int(k), int(s)) for k, s in items], "okey long, sz long")


def ref_pack(items, cap):
    """Serial prefix-sum reference."""
    out, pos = {}, 0
    for k, s in sorted(items):
        out[k] = (pos, pos // cap)
        pos += s
    return out


def test_pack_matches_serial_reference(spark):
    items = [((i * 37) % 101, 10 + (i * 7) % 90) for i in range(101)]
    got = {
        r["okey"]: (r["offset"], r["shard_id"])
        for r in pack_shards(
            _df(spark, items).repartition(5), size_col="sz",
            order_col="okey", bucket=F.expr("okey div 16"),
            capacity=128).collect()
    }
    assert got == ref_pack(items, 128)


def test_oversized_record_owns_start_shard(spark):
    # 2nd record is 5x capacity: it sits at its start shard; the next
    # record's id jumps (gaps allowed, ids monotone in offset)
    items = [(1, 50), (2, 500), (3, 10)]
    got = {r["okey"]: r["shard_id"]
           for r in pack_shards(
               _df(spark, items), size_col="sz", order_col="okey",
               bucket=F.expr("okey div 2"), capacity=100).collect()}
    assert got == {1: 0, 2: 0, 3: 5}


def test_manifest_conserves_totals(spark):
    items = [(k, 17 + (k * 13) % 211) for k in range(500)]
    a = pack_shards(_df(spark, items).repartition(7), size_col="sz",
                    order_col="okey", bucket=F.expr("okey div 64"),
                    capacity=1024)
    m = shard_manifest(a, id_col="okey", size_col="sz",
                       order_col="okey").collect()
    assert sum(r["n_items"] for r in m) == len(items)
    assert sum(r["bytes"] for r in m) == sum(s for _, s in items)
    # shard order == key order: consecutive manifests join at boundaries
    rows = sorted(m, key=lambda r: r["shard_id"])
    firsts = [r["first_id"] for r in rows]
    lasts = [r["last_id"] for r in rows]
    assert firsts == sorted(firsts) and lasts == sorted(lasts)
    assert all(f <= l for f, l in zip(firsts, lasts))


def test_capacity_validated(spark):
    with pytest.raises(ValueError, match="capacity"):
        pack_shards(_df(spark, [(1, 1)]), size_col="sz",
                    order_col="okey", bucket=F.lit(0), capacity=0)
