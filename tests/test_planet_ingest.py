"""S3 distributed planet ingest (round 2, VERDICT №2): one big file split
across many tasks must produce byte-identical blobs to the per-file path,
including entities straddling split boundaries, for plain and bz2 input."""

from __future__ import annotations

import bz2

import pytest

from osm2geojson_spark.sources.osm_xml import (
    parse_osm_blobs,
    read_osm_blobs,
    read_osm_blobs_distributed,
)


def _synth_xml(n_nodes: int = 300, n_ways: int = 60, n_rels: int = 12) -> str:
    out = ["<?xml version='1.0' encoding='UTF-8'?>", "<osm version=\"0.6\">"]
    for i in range(n_nodes):
        if i % 3 == 0:
            out.append(
                f'  <node id="{i + 1}" lat="{50 + i * 1e-4:.4f}" lon="{5 + i * 1e-4:.4f}">\n'
                f'    <tag k="name" v="Node &amp; {i}"/>\n'
                f'    <tag k="amenity" v="cafe"/>\n'
                "  </node>")
        else:
            out.append(
                f'  <node id="{i + 1}" lat="{50 + i * 1e-4:.4f}" lon="{5 + i * 1e-4:.4f}"/>')
    for w in range(n_ways):
        refs = "\n".join(
            f'    <nd ref="{(w * 5 + j) % n_nodes + 1}"/>' for j in range(5))
        out.append(
            f'  <way id="{10000 + w}">\n{refs}\n'
            f'    <tag k="name" v="Way {w}"/>\n'
            f'    <tag k="highway" v="residential"/>\n  </way>')
    for r in range(n_rels):
        mems = "\n".join(
            f'    <member type="way" ref="{10000 + (r * 3 + j) % n_ways}" role="outer"/>'
            for j in range(3))
        out.append(
            f'  <relation id="{20000 + r}">\n{mems}\n'
            f'    <tag k="name" v="Area {r}"/>\n'
            f'    <tag k="leisure" v="park"/>\n'
            f'    <tag k="type" v="multipolygon"/>\n  </relation>')
    out.append("</osm>")
    return "\n".join(out) + "\n"


@pytest.fixture(scope="module")
def xml_text():
    return _synth_xml()


def _blob_set(df):
    return sorted(r["blob"] for r in df.collect())


def test_distributed_equals_wholetext_plain(spark, tmp_path_factory, xml_text):
    p = tmp_path_factory.mktemp("planet") / "chunk.osm"
    p.write_text(xml_text)
    ref = _blob_set(read_osm_blobs(spark, str(p)))
    # 1 KB splits → every way/relation straddles boundaries constantly
    got_df = read_osm_blobs_distributed(spark, str(p), split_maxsize=1024)
    assert got_df.rdd.getNumPartitions() > 4, "file did not actually split"
    got = _blob_set(got_df)
    assert got == ref
    assert len(ref) == 300 + 60 + 12


def test_distributed_equals_wholetext_bz2(spark, tmp_path_factory):
    """bz2 is a splittable Hadoop codec: compresslevel=1 gives 100 kB
    blocks, so a ~1 MB compressed file yields multiple real splits."""
    xml = _synth_xml(n_nodes=20000, n_ways=2000, n_rels=200)
    p = tmp_path_factory.mktemp("planetbz") / "chunk.osm.bz2"
    p.write_bytes(bz2.compress(xml.encode(), compresslevel=1))
    ref = _blob_set(read_osm_blobs(spark, str(p)))
    got_df = read_osm_blobs_distributed(spark, str(p), split_maxsize=64 * 1024)
    n_parts = got_df.rdd.getNumPartitions()
    assert n_parts > 2, f"bz2 did not split ({n_parts} partitions)"
    assert _blob_set(got_df) == ref
    assert len(ref) == 20000 + 2000 + 200


def test_distributed_parse_roundtrip(spark, tmp_path_factory, xml_text):
    """Parsed tables from the distributed reader match the per-file path
    row-for-row (ids, tags, refs)."""
    p = tmp_path_factory.mktemp("planet2") / "chunk.osm"
    p.write_text(xml_text)
    ref = parse_osm_blobs(read_osm_blobs(spark, str(p)))
    got = parse_osm_blobs(read_osm_blobs_distributed(spark, str(p), split_maxsize=2048))
    for k in ("nodes", "ways", "relations"):
        a = sorted(map(repr, ref[k].collect()))
        b = sorted(map(repr, got[k].collect()))
        assert a == b, f"table {k} diverged"
    assert got["quarantine"].count() == ref["quarantine"].count() == 0


def test_giant_entity_spanning_many_splits(spark, tmp_path_factory):
    """An entity far bigger than the split size (all-head middle splits)
    is recovered exactly once via fragment chaining."""
    big_way = "<way id=\"777\">\n" + "\n".join(
        f'  <nd ref="{i}"/>' for i in range(2000)) + "\n</way>"
    xml = ("<osm>\n<node id=\"1\" lat=\"1.0\" lon=\"2.0\"/>\n"
           + big_way + "\n<node id=\"2\" lat=\"3.0\" lon=\"4.0\"/>\n</osm>\n")
    p = tmp_path_factory.mktemp("planet3") / "big.osm"
    p.write_text(xml)
    got_df = read_osm_blobs_distributed(spark, str(p), split_maxsize=1024)
    assert got_df.rdd.getNumPartitions() > 10
    blobs = _blob_set(got_df)
    assert len(blobs) == 3
    ways = [b for b in blobs if b.startswith("<way")]
    assert len(ways) == 1 and ways[0].count("<nd") == 2000


def test_osm_to_geojson_distributed_equals_per_file(spark, tmp_path_factory, xml_text):
    """One-call pipeline parity: the distributed-ingest path produces the
    SAME GeoJSON docs as the wholetext path."""
    import json

    from osm2geojson_spark.pipeline import osm_to_geojson

    p = tmp_path_factory.mktemp("planet4") / "world.osm"
    p.write_text(xml_text)
    a = osm_to_geojson(spark, str(p))
    b = osm_to_geojson(spark, str(p), distributed=True)
    for k in ("pois", "ways", "relations"):
        da = sorted(r["geojson"] for r in a[k].collect())
        db = sorted(r["geojson"] for r in b[k].collect())
        assert da == db, k
        if k != "relations":
            # relations stream is legitimately empty here: the synth ways
            # are open 5-node chains, so no relation stitches a closed
            # outer ring — parity still asserted above
            assert da, k
    assert b["quarantine"].count() == a["quarantine"].count()


def test_split_scanner_memory_is_entity_bounded():
    """VERDICT round-2 item 5: the rolling-buffer high-water mark stays
    O(largest entity + chunk) even when the split is vastly larger —
    list-accumulate-then-join would peak at the full split size."""
    import re

    from osm2geojson_spark.sources.osm_xml import _scan_split

    blob_re = re.compile(r"(?s)<(node|way|relation)\b[^>]*?(?:/>|>.*?</\1>)")
    entity = '<node id="%d" lat="1.0" lon="2.0"><tag k="a" v="%s"/></node>'
    lines = []
    for i in range(4000):
        lines.append(entity % (i, "x" * 50))
    total = sum(len(ln) + 1 for ln in lines)
    assert total > 400_000

    stats = {}
    chunk = 4096
    out = list(_scan_split(enumerate(lines), blob_re, stats=stats,
                           chunk=chunk))
    blobs = [b for k, _, b in out if k == "B"]
    assert len(blobs) == 4000
    largest = max(len(ln) for ln in lines)
    # peak rolling buffer ≈ one chunk + one entity, NOT the whole split
    assert stats["peak"] <= largest + 2 * chunk, stats
    assert stats["peak"] < total // 20


def test_split_scanner_chunking_byte_identical():
    """Chunked matching == whole-text matching for every chunk size,
    including chunks far smaller than one entity."""
    import re

    from osm2geojson_spark.sources.osm_xml import _scan_split

    blob_re = re.compile(r"(?s)<(node|way|relation)\b[^>]*?(?:/>|>.*?</\1>)")
    lines = ["garbage header",
             '<way id="1">' + "\n".join(f'<nd ref="{i}"/>' for i in range(200)),
             "</way>",
             '<node id="2" lat="0" lon="0"/>',
             "<relation id='3'>"]  # unterminated tail
    whole = "\n".join(lines)
    want_blobs = [m.group(0) for m in blob_re.finditer(whole)]
    for chunk in (16, 100, 1 << 20):
        out = list(_scan_split(enumerate(lines), blob_re, chunk=chunk))
        blobs = [b for k, _, b in out if k == "B"]
        frags = [(off, t) for k, off, t in out if k == "F"]
        assert blobs == want_blobs, chunk
        # head prefix and tail suffix bracket the original stream
        head = frags[0][1]
        tail = frags[1][1]
        assert whole.startswith(head)
        assert whole.endswith(tail.rstrip("\n"))


def test_boundary_budget_raises_actionable_error(spark, tmp_path):
    """ADVICE round-2: entities larger than the split size must fail
    with a clear message, not crawl toward a driver OOM."""
    import pytest

    from osm2geojson_spark.sources.osm_xml import read_osm_blobs_distributed

    # one giant entity spanning every 256-byte split: all-head fragments
    big = ('<way id="9">' +
           "\n".join(f'<nd ref="{i}"/>' for i in range(500)) + "</way>")
    p = tmp_path / "giant.osm"
    p.write_text(f"<osm>\n{big}\n</osm>\n")
    with pytest.raises(ValueError, match="max_boundary_bytes"):
        read_osm_blobs_distributed(spark, str(p), split_maxsize=256,
                                   max_boundary_bytes=1024).collect()
    # same file with an adequate budget parses fine
    out = read_osm_blobs_distributed(spark, str(p), split_maxsize=256)
    assert out.count() == 1


def test_persist_scan_single_pass_byte_identical(spark, tmp_path_factory,
                                                 xml_text):
    # persist_scan=True must produce the exact same blob multiset as the
    # streaming two-pass default (the only difference is one vs two
    # decompressions), under splits small enough to force straddling
    p = tmp_path_factory.mktemp("planetp") / "chunk.osm"
    p.write_text(xml_text)
    ref = _blob_set(read_osm_blobs_distributed(
        spark, str(p), split_maxsize=1024))
    got_df = read_osm_blobs_distributed(
        spark, str(p), split_maxsize=1024, persist_scan=True)
    assert _blob_set(got_df) == ref
