"""Byte-exact golden tests for the canonical GeoJSON serializer: pinned
key order (id, title, geometry, categories, address?, links? — the
reference's jsonj insertion order, OsmPostProcessor.java:128-131,332-343),
shortest-round-trip float formatting, canonical category order."""

from __future__ import annotations

from osm2geojson_spark.operators.osm_join import assemble_ways
from osm2geojson_spark.operators.postprocess import node_features, way_features


def _docs(df):
    return {r["feature_id"]: r["geojson"] for r in df.collect()}


def test_node_doc_bytes(fixtures):
    docs = _docs(node_features(fixtures["nodes"]))
    assert docs["osmnode/13"] == (
        '{"id":"osmnode/13","title":"Tram X",'
        '"geometry":{"type":"Point","coordinates":[5.008,52.008]},'
        '"categories":{"osm":["tram-stop"]}}'
    )
    # address + links present, in pinned position after categories
    assert docs["osmnode/10"] == (
        '{"id":"osmnode/10","title":"Cafe Centraal",'
        '"geometry":{"type":"Point","coordinates":[5.005,52.005]},'
        '"categories":{"osm":["amenity:cafe"]},'
        '"address":{"housenumber":"1","street":"Damrak"},'
        '"links":[{"href":"http://example.org"}]}'
    )


def test_way_doc_bytes_negative_coords(spark, fixtures):
    """Float formatting survives the reference's negative-coordinate
    regression values (-0.1130375 round-trips exactly)."""
    ways = spark.createDataFrame(
        [(900, {"name": "Reg", "highway": "x"}, [25737250, 25737251])],
        fixtures["ways"].schema)
    docs = _docs(way_features(assemble_ways(fixtures["nodes"], ways)))
    assert docs["osmway/900"] == (
        '{"id":"osmway/900","title":"Reg",'
        '"geometry":{"type":"LineString","coordinates":'
        '[[-0.1130375,51.5121071],[-0.1130375,-51.5121071]]},'
        '"categories":{"osm":["street","highway:x"]}}'
    )


def test_polygon_doc_bytes(fixtures):
    docs = _docs(way_features(assemble_ways(fixtures["nodes"], fixtures["ways"])))
    assert docs["osmway/101"] == (
        '{"id":"osmway/101","title":"Closed Block",'
        '"geometry":{"type":"Polygon","coordinates":'
        '[[[5.0,52.01],[5.01,52.01],[5.01,52.02],[5.0,52.02],[5.0,52.01]]]},'
        '"categories":{"osm":["building:yes","building"]}}'
    )


# ---------------------------------------------------------- float parity
def test_java_double_str_vs_real_jvm_grid(spark):
    """VERDICT r1 №8: parity with the ACTUAL JVM's Double.toString across
    the coordinate grid, pinning the exponent boundaries (1e-4/1e-3 and
    1e7) where Python repr and Java notation diverge."""
    from osm2geojson_spark.functions.json_canon import java_double_str

    jdouble = spark._jvm.java.lang.Double
    cases = [
        0.0, -0.0, 1.0, -1.0, 5.0, 180.0, -180.0, 85.0511,
        5.005, -0.1130375, 51.5121071,
        # plain/scientific boundaries
        0.001, 0.0009999999, 0.0005, 0.0001, 9.999e-4, 1e-3, 1e-4, 1e-5,
        -0.0005, -1e-4,
        1e6, 9999999.0, 9999999.5, 1e7, 1.0000001e7, 12345678.9, 1e8,
        -1e7, -9999999.875,
        # OSM precision extremes
        1e-7, 179.9999999, -179.9999999, 1.5e-7,
    ]
    for d in cases:
        want = jdouble.toString(float(d))
        got = java_double_str(d)
        assert got == want, f"{d!r}: python {got!r} != jvm {want!r}"


def test_java_double_str_hypothesis_grid(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from osm2geojson_spark.functions.json_canon import java_double_str

    jdouble = spark._jvm.java.lang.Double

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(
        st.one_of(
            # OSM coordinate grid: 1e-7-quantized lon/lat
            st.integers(min_value=-1_800_000_000, max_value=1_800_000_000)
            .map(lambda i: i / 1e7),
            # decimal magnitudes straddling both notation boundaries
            st.integers(min_value=1, max_value=99_999).flatmap(
                lambda m: st.integers(min_value=-9, max_value=9).map(
                    lambda e: m * (10.0 ** e))),
        )
    )
    def check(d):
        assert java_double_str(d) == jdouble.toString(float(d))

    check()


def test_java_double_str_pre_jdk19_divergence_documented(spark):
    """Known, deliberate divergence: for doubles whose binary value has a
    short EXACT decimal expansion (e.g. 2^-24), pre-JDK-19 FloatingDecimal
    prints the full expansion while JDK 19+ (Ryu) and this serializer
    print the shortest round-trip form. We pin MODERN Java semantics; the
    host JVM here is JDK 17, so it shows the old behavior."""
    from osm2geojson_spark.functions.json_canon import java_double_str

    d = 2.0 ** -24
    assert java_double_str(d) == "5.960464477539063E-8"  # shortest (JDK 19+)
    jvm_s = spark._jvm.java.lang.Double.toString(d)
    assert jvm_s in ("5.9604644775390625E-8", "5.960464477539063E-8")
    assert float(java_double_str(d)) == d  # still round-trips exactly
