"""S4/S5 byte-parity tests: sorted `key;value` gz round trip with the
reference's exact semantics (first-';' split, lexicographic string sort,
pair dedup — SortingWriterTest golden-sort model)."""

from __future__ import annotations

import glob
import gzip

from pyspark.sql import functions as F

from osm2geojson_spark.sources.kv_text import read_kv, write_jsonlines, write_kv


def _read_gz_lines(path: str) -> list[str]:
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.gz")):
        with gzip.open(f, "rt") as fh:
            out.extend(ln.rstrip("\n") for ln in fh)
    return out


def test_kv_roundtrip_first_semicolon_and_sort(spark, tmp_path):
    rows = [
        ("10", "ten"), ("9", "nine"), ("2", '{"a": "x;y"}'),
        ("2", '{"a": "x;y"}'),       # duplicate pair → dropped
        ("2", "second"), ("1", "one"),
    ]
    df = spark.createDataFrame(rows, "key string, value string")
    out = str(tmp_path / "kv")
    write_kv(df, out)
    lines = _read_gz_lines(out)
    # lexicographic: "1" < "10" < "2" < "9" — the reference's string order
    assert lines == [
        "1;one", "10;ten", '2;{"a": "x;y"}', "2;second", "9;nine",
    ] or lines == [
        "1;one", "10;ten", "2;second", '2;{"a": "x;y"}', "9;nine",
    ]
    back = read_kv(spark, out).collect()
    assert {(r["key"], r["value"]) for r in back} == set(rows)


def test_kv_golden_sort_1001_rows(spark, tmp_path):
    """SortingWriterTest.java:37-50 model: output equals sorted input."""
    df = spark.range(1001).select(
        (F.col("id") % 5).cast("string").alias("key"),
        F.col("id").cast("string").alias("value"))
    out = str(tmp_path / "kv2")
    write_kv(df, out, dedup=False)
    lines = _read_gz_lines(out)
    assert len(lines) == 1001
    assert lines == sorted(lines)


def test_min_value_length_fast_path(spark, tmp_path):
    """P7 (OsmPostProcessor.java:373): values with length <= N skipped."""
    df = spark.createDataFrame(
        [("1", "x" * 60), ("2", "short")], "key string, value string")
    out = str(tmp_path / "kv3")
    write_kv(df, out)
    got = read_kv(spark, out, min_value_length=50).collect()
    assert [r["key"] for r in got] == ["1"]


def test_kv_malformed_lines_quarantined(spark, tmp_path):
    """Lines without ';' (reference: job-killing StringIndexOutOfBounds)
    are dropped from read_kv and surfaced by read_kv_malformed."""
    import gzip as _gz

    from osm2geojson_spark.sources.kv_text import read_kv_malformed

    d = tmp_path / "kvm"
    d.mkdir()
    with _gz.open(d / "part-000.gz", "wt") as fh:
        fh.write("1;one\nnosemicolon\n2;two\n")
    good = read_kv(spark, str(d)).collect()
    assert {(r["key"], r["value"]) for r in good} == {("1", "one"), ("2", "two")}
    bad = read_kv_malformed(spark, str(d)).collect()
    assert [r["line"] for r in bad] == ["nosemicolon"]
    assert "';'" in bad[0]["reason"]


def test_jsonlines_sink(spark, tmp_path):
    df = spark.createDataFrame([('{"id":1}',), ('{"id":2}',)], ["geojson"])
    out = str(tmp_path / "docs")
    write_jsonlines(df.coalesce(1), out)
    assert sorted(_read_gz_lines(out)) == ['{"id":1}', '{"id":2}']


def test_salted_tile_join_equals_plain(spark):
    """G4 salting is a pure performance rewrite — result sets identical."""
    from osm2geojson_spark import queries as Q
    from osm2geojson_spark.spatial.tiles import (
        salted_tile_join,
        tile_table,
        tile_vector_join,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = ev.select(
        F.col("event_id").alias("image_id"),
        Q.lon_col(F.col("event_id")).alias("lon"),
        Q.lat_col(F.col("event_id")).alias("lat"))
    tiles = tile_table(spark, zoom=4).select("tile_id", "zoom")
    plain = {tuple(r) for r in
             tile_vector_join(pts, tiles, zoom=4).collect()}
    salted = {tuple(r) for r in
              salted_tile_join(pts, tiles, zoom=4, n_salt=4).collect()}
    assert plain == salted and len(plain) > 0


def test_pip_hole_exclusion(spark):
    """G2 hole path: points inside an inner ring are excluded."""
    from osm2geojson_spark.spatial.pip import point_in_polygon_join

    pts = spark.createDataFrame(
        [(1, 5.0, 5.0),     # inside outer, inside hole → excluded
         (2, 2.0, 2.0),     # inside outer, outside hole → hit
         (3, 20.0, 20.0)],  # outside outer
        "id long, lon double, lat double")
    ring = [{"lon": 0.0, "lat": 0.0}, {"lon": 10.0, "lat": 0.0},
            {"lon": 10.0, "lat": 10.0}, {"lon": 0.0, "lat": 10.0},
            {"lon": 0.0, "lat": 0.0}]
    hole = [{"lon": 4.0, "lat": 4.0}, {"lon": 6.0, "lat": 4.0},
            {"lon": 6.0, "lat": 6.0}, {"lon": 4.0, "lat": 6.0},
            {"lon": 4.0, "lat": 4.0}]
    polys = spark.createDataFrame(
        [(7, ring, [hole])],
        "poly_id int, ring array<struct<lon:double,lat:double>>, "
        "holes array<array<struct<lon:double,lat:double>>>")
    hits = {r["id"] for r in point_in_polygon_join(pts, polys, res=4).collect()}
    assert hits == {2}


def test_minhash_bucket_cap(spark):
    """Skew guard: capping bucket size only removes pairs that came from
    oversized buckets — remaining pairs are a subset with same scores."""
    from osm2geojson_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(docs).collect()}
    capped = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in minhash_lsh_pairs(docs, max_bucket_size=2).collect()}
    assert set(capped) <= set(full)
    for k, v in capped.items():
        assert v == full[k]
