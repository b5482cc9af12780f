"""GeoJSON feature PARSING — the read side of the engine's round trip.

The emit side (``json_canon.geojson_doc``) produces the reference's
feature documents (osm2geojson's OsmPostProcessor output shape:
id/title/geometry/categories/address/links); this module parses those
documents back into typed columns and validates RFC 7946 invariants,
so ``parse_features(emit(x)) == x`` is testable end-to-end — the
"GeoJSON round-trip test cases" axis of the north star.

Spark-first design: scalar fields come out via ``get_json_object``
(JVM JsonPath, codegen — no Python), and coordinates are parsed with a
TYPE-SPECIFIC ``from_json`` schema per geometry class (GeoJSON nests
coordinates 1-4 levels deep depending on type, which a single fixed
schema cannot express). The per-type arrays are then normalized to one
flat point list with ``flatten``, so bbox / vertex-count / closure
checks are plain column expressions. Zero shuffles, zero Python — a
100 TB parse is a pure map stage.

Malformed documents (bad JSON, unknown geometry type, coordinate arity
mismatch) surface with ``error`` set — the reference's quarantine
discipline (OsmJoin.java:176-179), never a silent drop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEOM_TYPES = ("Point", "LineString", "Polygon", "MultiPolygon")

_DEPTH_SCHEMA = {
    "Point": "array<double>",
    "LineString": "array<array<double>>",
    "Polygon": "array<array<array<double>>>",
    "MultiPolygon": "array<array<array<array<double>>>>",
}


def _flat_points(gtype: Column, raw: Column) -> Column:
    """Normalize any geometry's coordinates to array<array<double>>
    (a flat vertex list) using the type-matched parse."""
    pt = F.from_json(raw, _DEPTH_SCHEMA["Point"])
    ln = F.from_json(raw, _DEPTH_SCHEMA["LineString"])
    pg = F.from_json(raw, _DEPTH_SCHEMA["Polygon"])
    mp = F.from_json(raw, _DEPTH_SCHEMA["MultiPolygon"])
    return (
        F.when(gtype == "Point", F.when(pt.isNotNull(), F.array(pt)))
        .when(gtype == "LineString", ln)
        .when(gtype == "Polygon", F.flatten(pg))
        .when(gtype == "MultiPolygon", F.flatten(F.flatten(mp)))
    )


def _ring_closed(gtype: Column, raw: Column) -> Column:
    """First-ring closure (RFC 7946 §3.1.6): first == last vertex.
    Null for non-areal types."""
    pg = F.from_json(raw, _DEPTH_SCHEMA["Polygon"])
    mp = F.from_json(raw, _DEPTH_SCHEMA["MultiPolygon"])
    ring = (
        F.when(gtype == "Polygon", F.element_at(pg, 1))
        .when(gtype == "MultiPolygon", F.element_at(F.element_at(mp, 1), 1))
    )
    return F.when(
        ring.isNotNull(),
        (F.element_at(ring, 1) == F.element_at(ring, F.size(ring)))
        & (F.size(ring) >= 4),
    )


def parse_features(df: DataFrame, doc_col: str = "geojson") -> DataFrame:
    """GeoJSON feature documents → typed columns:
    (feature_id, title, geom_type, n_points, min_lon, min_lat, max_lon,
    max_lat, ring_closed, categories, error).

    The document is tokenized exactly TWICE (json_tuple on the feature,
    json_tuple on its geometry substring) rather than once per extracted
    field — get_json_object re-parses the whole document per call, which
    at 10^12 documents is the difference between 2 and ~8 full JSON
    scans per row. The four type-specific from_json branches sit under
    one CaseWhen, so codegen evaluates only the matched parse per row."""
    staged = df.select(
        "*",
        F.json_tuple(F.col(doc_col), "id", "title", "geometry", "categories")
        .alias("_fid", "_title", "_geom", "_cats"),
    ).select(
        "*",
        F.json_tuple(F.col("_geom"), "type", "coordinates")
        .alias("_gtype", "_coords"),
    )
    return staged.select(_feature_cols())


def _feature_cols():
    gtype = F.col("_gtype")
    raw = F.col("_coords")
    pts = _flat_points(gtype, raw)
    xs = F.transform(pts, lambda p: F.element_at(p, 1))
    ys = F.transform(pts, lambda p: F.element_at(p, 2))
    bad_arity = F.exists(pts, lambda p: p.isNull() | (F.size(p) != 2))

    known = gtype.isin(*GEOM_TYPES)
    parsed_ok = known & pts.isNotNull() & (F.size(pts) > 0) & ~bad_arity
    error = (
        F.when(gtype.isNull(), F.lit("missing or unparseable geometry.type"))
        .when(~known, F.concat(F.lit("unknown geometry type "), gtype))
        .when(
            pts.isNull() | (F.size(pts) == 0),
            F.lit("coordinates do not match declared type"),
        )
        .when(bad_arity, F.lit("coordinate position arity != 2"))
    )

    def guard(c: Column) -> Column:
        return F.when(parsed_ok, c)

    return [
        F.col("_fid").alias("feature_id"),
        F.col("_title").alias("title"),
        guard(gtype).alias("geom_type"),
        guard(F.size(pts)).alias("n_points"),
        guard(F.array_min(xs)).alias("min_lon"),
        guard(F.array_min(ys)).alias("min_lat"),
        guard(F.array_max(xs)).alias("max_lon"),
        guard(F.array_max(ys)).alias("max_lat"),
        guard(F.coalesce(_ring_closed(gtype, raw), F.lit(None).cast("boolean")))
        .alias("ring_closed"),
        F.from_json(
            F.get_json_object(F.col("_cats"), "$.osm"), "array<string>"
        ).alias("categories"),
        error.alias("error"),
    ]
