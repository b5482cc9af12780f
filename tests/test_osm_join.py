"""Replays the reference's join/sort test suite as DataFrame tests
(SURVEY.md §5: EntryJoiningIterableTest, SortingWriterTest, OsmJoinTest)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2geojson_spark.operators.osm_join import (
    assemble_relations,
    assemble_ways,
    cogroup_join,
    dedup_kv,
    rel_member_edges,
    split_nodes,
    way_edges,
)


def test_cogroup_join_cardinalities(fixtures):
    """EntryJoiningIterableTest.java:46-60: exactly 3 groups; sizes
    (left x right) = 2x3, 1x2, 1x1; keys 3,4,6 dropped."""
    out = cogroup_join(fixtures["kv_left"], fixtures["kv_right"]).collect()
    assert len(out) == 3
    sizes = {r["key"]: (len(r["left_values"]), len(r["right_values"])) for r in out}
    assert sizes == {"1": (2, 3), "2": (1, 2), "5": (1, 1)}


def test_dedup_kv(spark):
    """SortingWriterTest golden-sort case: (k,v) duplicates collapse
    (SortingWriter.java:76-81) — 1001 rows, keys i%5, value '-' → 5 rows."""
    df = spark.range(1001).select(
        (F.col("id") % 5).cast("string").alias("key"), F.lit("-").alias("value")
    )
    assert dedup_kv(df).count() == 5


def test_no_loss_random_kv(spark):
    """SortingWriterTest.java:113-125 invariant: no entries lost through the
    shuffle/sort machinery (distinct pairs in == distinct pairs out)."""
    df = spark.range(20_000).select(
        F.conv((F.xxhash64("id") % 1296 + 1296) % 1296, 10, 36).alias("key"),
        F.sha2(F.col("id").cast("string"), 256).alias("value"),
    )
    n_distinct = df.distinct().count()
    out = dedup_kv(df.repartition(13, "key"))
    assert out.count() == n_distinct


def test_string_key_sort_order(fixtures):
    """O3: lexicographic string-key ordering ('10' < '9')."""
    df = fixtures["kv_left"].union(fixtures["kv_right"]).withColumn(
        "key", F.concat(F.col("key"), F.lit("0"))
    )
    keys = [r["key"] for r in df.sort("key").collect()]
    assert keys == sorted(keys)


def test_way_edges_order(fixtures):
    e = way_edges(fixtures["ways"]).filter(F.col("way_id") == 100).collect()
    assert [(r["pos"], r["node_id"]) for r in sorted(e, key=lambda r: r["pos"])] == [
        (0, 1), (1, 2), (2, 3)]


def test_rel_member_edges_drop_relation_members(fixtures):
    e = rel_member_edges(fixtures["relations"]).filter(F.col("rel_id") == 201).collect()
    assert {r["member_type"] for r in e} == {"way", "node"}
    assert len(e) == 2  # relation member 200 dropped (OsmJoin.java:245-246)


def test_split_nodes_quarantine(fixtures):
    good, bad = split_nodes(fixtures["nodes"])
    assert bad.count() == 1 and bad.first()["id"] == 14
    assert good.filter(F.col("id") == 14).count() == 0


def test_assemble_ways_chain_order(fixtures):
    aw = {r["id"]: r for r in assemble_ways(fixtures["nodes"], fixtures["ways"]).collect()}
    # open way 100: nodes 1,2,3 in ns order
    assert [n["id"] for n in aw[100]["nodes"]] == [1, 2, 3]
    assert aw[100]["nodes"][0]["lon"] == 5.0 and aw[100]["nodes"][0]["lat"] == 52.0
    # closed way 101 keeps duplicated first/last
    assert [n["id"] for n in aw[101]["nodes"]] == [4, 5, 8, 7, 4]
    # missing ref way 102 (OsmJoin.java:305-312)
    assert [n["id"] for n in aw[102]["nodes"]] == [1, 2]
    assert aw[102]["missing_node_refs"] == [999999]
    # repeated node id emits repeated coords (OsmJoin.java:297-312 walk)
    assert [n["id"] for n in aw[103]["nodes"]] == [1, 2, 1]


def test_assemble_ways_verbatim_coords(spark, fixtures):
    """OsmJoinTest.java:16-22 negative-coordinate regressions survive."""
    ways = spark.createDataFrame(
        [(900, {}, [25737250, 25737251, 25737252])],
        fixtures["ways"].schema,
    )
    row = assemble_ways(fixtures["nodes"], ways).first()
    got = [(n["lon"], n["lat"]) for n in row["nodes"]]
    assert got == [(-0.1130375, 51.5121071), (-0.1130375, -51.5121071),
                   (0.1130375, -51.5121071)]


def test_assemble_relations(fixtures):
    cw = assemble_ways(fixtures["nodes"], fixtures["ways"])
    rels = {r["id"]: r for r in
            assemble_relations(fixtures["nodes"], fixtures["relations"], cw).collect()}
    r200 = rels[200]
    assert [w["id"] for w in r200["ways"]] == [110, 111, 112, 113]
    assert [w["role"] for w in r200["ways"]] == ["outer", "outer", "inner", "outer"]
    # member ways carry full geometry (J5: assembled ways embedded)
    assert [n["id"] for n in r200["ways"][0]["nodes"]] == [20, 21, 22]
    r201 = rels[201]
    assert [n["id"] for n in r201["nodes"]] == [10]
    assert [w["id"] for w in r201["ways"]] == [100]


def test_salted_ordered_collect_equals_plain(spark):
    """Two-phase hot-key collect is a pure physical rewrite: identical
    chains, bounded per-task arrays (SURVEY §7 risk 5)."""
    from osm2geojson_spark.operators.osm_join import salted_ordered_collect

    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"),           # 7 keys, ~1400 rows each
        F.struct(F.col("id").alias("pos"), (F.col("id") * 3).alias("v")).alias("p"),
    )
    plain = {r["k"]: r["chain"] for r in
             df.groupBy("k").agg(
                 F.array_sort(F.collect_list("p")).alias("chain")).collect()}
    salted = {r["k"]: r["chain"] for r in
              salted_ordered_collect(df, "k", F.col("p"), n_salt=8).collect()}
    assert plain == salted


def test_multipolygon_orientation_lineage(fixtures):
    """GE3 lineage: way 113 (2nd outer) is listed CLOCKWISE and hole 112
    is listed CCW (inner must be CW) → exactly two rings record winding
    reversals; all member fragments chain (0 unclosed)."""
    from osm2geojson_spark.functions.geometry import relation_multipolygons
    from osm2geojson_spark.operators.osm_join import (
        assemble_relations as _ar,
        assemble_ways as _aw,
    )

    cw = _aw(fixtures["nodes"], fixtures["ways"])
    mp = {r["id"]: r for r in relation_multipolygons(
        _ar(fixtures["nodes"], fixtures["relations"], cw)).collect()}
    park = mp[200]
    assert park["n_rings"] == 3
    assert park["n_reversed"] == 2     # outer 113 CW→CCW, inner 112 CCW→CW
    assert park["n_unclosed"] == 0
