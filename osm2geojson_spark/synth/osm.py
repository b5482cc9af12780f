"""Deterministic OSM-shaped fixture + scale synthesizers (FIXTURES.md §1-4).

Two paths:

- :func:`fixture_tables` — small hand-built nodes/ways/relations covering
  every edge the reference's tests pin (verbatim coords from
  OsmJoinTest.java:16-22; join-cardinality keys from
  EntryJoiningIterableTest.java:19-38; open/closed/repeated/missing-ref
  ways per OsmJoin.java:290-323; multipolygon relations with split outer
  rings, holes, reversed winding for the GRAFT ring-stitcher).
- :func:`scale_tables` — seeded bulk generator built WITH Spark column
  expressions (``spark.range`` + deterministic arithmetic, no driver-side
  loops) so benchmarks can synthesize millions of ways cheaply.

All randomness is hash-of-id arithmetic — same rows at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
WAY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("ns", T.ArrayType(T.LongType()), False),
    ]
)
REL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "members",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType(), False),
                        T.StructField("type", T.StringType(), False),
                        T.StructField("role", T.StringType(), True),
                    ]
                )
            ),
            False,
        ),
    ]
)

# verbatim regression coords: reference OsmJoinTest.java:16-22
VERBATIM_NODES = [
    (25737250, -0.1130375, 51.5121071),
    (25737251, -0.1130375, -51.5121071),
    (25737252, 0.1130375, -51.5121071),
]

# verbatim join-cardinality fixture: EntryJoiningIterableTest.java:19-38
KV_LEFT = [
    ("1", "one"), ("1", "ein"), ("2", "two"), ("3", "drei"),
    ("3", "three"), ("3", "drie"), ("4", "four"), ("5", "five"),
]
KV_RIGHT = [
    ("1", "111111"), ("1", "111"), ("1", "1"), ("2", "22222"),
    ("2", "22"), ("5", "5555"), ("6", "6666"),
]


def fixture_tables(spark: SparkSession) -> dict[str, DataFrame]:
    """Hand-built mini OSM world (unit square near 5.0E,52.0N) + verbatim
    reference fixtures. Golden outputs in tests are hand-computed."""
    nodes = [
        # a 3x3 grid, ids 1..9, spacing 0.01 deg
        *[
            (i + 1, 5.0 + 0.01 * (i % 3), 52.0 + 0.01 * (i // 3), {})
            for i in range(9)
        ],
        # tagged POI nodes
        (10, 5.005, 52.005, {"name": "Cafe Centraal", "amenity": "cafe",
                             "addr:street": "Damrak", "addr:housenumber": "1",
                             "website": "http://example.org",
                             "name:nl": "Café Centraal", "name:de": "Cafe Zentral"}),
        (11, 5.006, 52.006, {"name": "A & B; Sons", "shop": "bakery"}),  # entity + ';' payload
        (12, 5.007, 52.007, {"amenity": "bench"}),  # no name → dropped by P8
        (13, 5.008, 52.008, {"name": "Tram X", "railway": "tram_stop"}),  # special-case rule
        (14, None, None, {"name": "broken"}),  # quarantine path (OsmJoin.java:176-179)
        # outer ring A: square 5.02..5.03 x 52.02..52.03, split across two ways
        (20, 5.02, 52.02, {}), (21, 5.03, 52.02, {}), (22, 5.03, 52.03, {}),
        (23, 5.02, 52.03, {}),
        # inner hole ring
        (30, 5.022, 52.022, {}), (31, 5.028, 52.022, {}),
        (32, 5.028, 52.028, {}), (33, 5.022, 52.028, {}),
        # second (disjoint) outer ring for the same multipolygon
        (40, 5.05, 52.05, {}), (41, 5.06, 52.05, {}), (42, 5.06, 52.06, {}),
        (43, 5.05, 52.06, {}),
        # verbatim regression nodes
        *[(i, lo, la, {}) for (i, lo, la) in VERBATIM_NODES],
    ]
    ways = [
        (100, {"name": "Open Street", "highway": "residential"}, [1, 2, 3]),          # LineString
        (101, {"name": "Closed Block", "building": "yes"}, [4, 5, 8, 7, 4]),          # Polygon (closed)
        (102, {"name": "Dangling"}, [1, 2, 999999]),                                  # missing ref
        (103, {"name": "Loopy"}, [1, 2, 1]),                                          # repeated node id
        (104, {}, [3, 6, 9]),                                                         # no name → dropped
        # multipolygon member ways: outer ring split into two chained halves
        (110, {}, [20, 21, 22]),            # half A (open)
        (111, {}, [22, 23, 20]),            # half B closes the ring
        (112, {}, [30, 31, 32, 33, 30]),    # inner hole (closed, CCW as listed)
        (113, {}, [40, 43, 42, 41, 40]),    # 2nd outer, listed CLOCKWISE → winding fix
    ]
    relations = [
        (200, {"type": "multipolygon", "name": "Park", "leisure": "park"},
         [(110, "way", "outer"), (111, "way", "outer"), (112, "way", "inner"),
          (113, "way", "outer")]),
        (201, {"type": "route", "name": "Bus 5"},
         [(100, "way", ""), (10, "node", "stop"),
          (200, "relation", "sub")]),   # relation member silently dropped (OsmJoin.java:245-246)
    ]
    return {
        "nodes": spark.createDataFrame(nodes, NODE_SCHEMA),
        "ways": spark.createDataFrame(ways, WAY_SCHEMA),
        "relations": spark.createDataFrame(relations, REL_SCHEMA),
        "kv_left": spark.createDataFrame(KV_LEFT, "key string, value string"),
        "kv_right": spark.createDataFrame(KV_RIGHT, "key string, value string"),
    }


def scale_tables(
    spark: SparkSession, n_ways: int = 100_000, nodes_per_way: int = 5,
    closed_frac: float = 0.25, seed: int = 42,
) -> dict[str, DataFrame]:
    """Bulk OSM-shaped tables, generated distributed (spark.range — no
    driver loop, no collect). Way i uses node ids [i*step .. i*step+k);
    a deterministic hash decides closed-ness and tags. Node coords are
    hash-derived with urban hot spots (skew for AQE/salting tests)."""
    n_nodes = n_ways * (nodes_per_way - 1) + nodes_per_way
    h = lambda c: F.abs(F.xxhash64(c, F.lit(seed)))  # noqa: E731

    ids = F.col("id")
    # 10% of nodes cluster into 3 "cities" (hot cells); rest uniform
    city = (h(ids) % 3).cast("double")
    hot = (h(ids + 7) % 10) == 0
    lon_u = (h(ids + 1) % 3_600_000).cast("double") / 10_000.0 - 180.0
    lat_u = (h(ids + 2) % 1_700_000).cast("double") / 10_000.0 - 85.0
    lon_c = city * 10.0 + 4.0 + ((h(ids + 3) % 1000).cast("double") / 10_000.0)
    lat_c = city * 5.0 + 50.0 + ((h(ids + 4) % 1000).cast("double") / 10_000.0)
    nodes = spark.range(n_nodes).select(
        ids.alias("id"),
        F.when(hot, lon_c).otherwise(lon_u).alias("lon"),
        F.when(hot, lat_c).otherwise(lat_u).alias("lat"),
        F.when(h(ids + 5) % 20 == 0,
               F.create_map(F.lit("name"), F.concat(F.lit("poi-"), ids.cast("string")),
                            F.lit("amenity"), F.lit("cafe")))
        .otherwise(F.create_map().cast("map<string,string>")).alias("tags"),
    )
    step = nodes_per_way - 1
    wid = F.col("id")
    base = wid * step
    chain = F.transform(F.sequence(F.lit(0), F.lit(step)), lambda j: base + j)
    closed = (h(wid + 11) % 100) < int(closed_frac * 100)
    ways = spark.range(n_ways).select(
        (wid + 1_000_000_000).alias("id"),
        F.when(h(wid + 12) % 4 == 0,
               F.create_map(F.lit("name"), F.concat(F.lit("way-"), wid.cast("string")),
                            F.lit("highway"), F.lit("residential")))
        .otherwise(F.create_map().cast("map<string,string>")).alias("tags"),
        F.when(closed, F.concat(chain, F.array(base))).otherwise(chain).alias("ns"),
    )
    return {"nodes": nodes, "ways": ways}
