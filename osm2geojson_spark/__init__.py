"""osm2geojson_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Recreates the query/data-processing semantics of jillesvangurp/osm2geojson
(reference at /root/reference, surveyed in SURVEY.md) as idiomatic Spark
DataFrame operators, extended to an H3/S2-style cell-indexed spatial-join +
tiling engine over tables of image+caption pairs.

Design principles (see SURVEY.md §1.4, §4):
- DataFrame/SQL first; Catalyst owns sorts, spills, merges, join strategy.
- Typed StructType schemas (tags as MapType) instead of dynamic JSON.
- Arrow-vectorized pandas UDFs only where built-in expressions genuinely
  cannot express the kernel (ray-cast PIP residual, ring stitching, image
  decode). No per-row Python anywhere.
- Order-preservation through shuffles is always explicit (posexplode +
  sort_array), never implicit row order.
"""

__version__ = "0.1.0"

from osm2geojson_spark.session import get_spark  # noqa: F401
