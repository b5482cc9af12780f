"""End-to-end reference-equivalent pipeline: what `osmjoin.sh` +
`OsmPostProcessor.main` do (OsmJoin.java:463-467 → processAll :423-461;
OsmPostProcessor.java:356-362), as one composable call.

A user of the reference runs:
    java OsmJoin <planet.osm.bz2>   # 7-stage join → 13 gz datasets
    java OsmPostProcessor           # → osm-pois.gz / osm-ways.gz / osm-relations.gz
Here:
    from osm2geojson_spark.pipeline import osm_to_geojson
    osm_to_geojson(spark, "planet.osm.bz2", "/out")

Differences, on purpose (SURVEY §1.4):
- intermediates are DataFrames (optionally materialized via
  ``intermediate_datasets`` + kv_text for byte-diff parity), not 105 GB
  of gz multimap files;
- relations DO produce output (stitched MultiPolygons) — the reference
  returns null for every relation (OsmPostProcessor.java:216-227 FIXME)
  and its main() never even calls processRelations (:356-362); pass
  ``reference_strict=True`` to reproduce that observable behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2geojson_spark.operators.osm_join import (
    assemble_relations,
    assemble_ways,
    rel_member_edges,
    split_nodes,
    way_edges,
)
from osm2geojson_spark.operators.postprocess import (
    node_features,
    relation_features,
    way_features,
)
from osm2geojson_spark.sources.kv_text import write_jsonlines
from osm2geojson_spark.sources.osm_xml import read_osm_xml


def intermediate_datasets(
    nodes: DataFrame, ways: DataFrame, relations: DataFrame,
) -> dict[str, DataFrame]:
    """The reference's 13 named datasets (OsmJoin.java:42-57) as
    DataFrames — same logical content, typed columns instead of
    ``key;json`` lines (serialize via kv_text.write_kv for byte diffs)."""
    good_nodes, problem_nodes = split_nodes(nodes)
    w_edges = way_edges(ways)
    r_edges = rel_member_edges(relations)
    complete_ways = assemble_ways(nodes, ways)
    complete_rels = assemble_relations(nodes, relations, complete_ways)
    node_members = r_edges.filter(r_edges["member_type"] == "node")
    way_members = r_edges.filter(r_edges["member_type"] == "way")
    return {
        "nodeid2rawnodejson": good_nodes,
        "problemNodes": problem_nodes,
        "nodeid2wayid": w_edges.select("node_id", "way_id"),
        "nodeid2relid": node_members.select(
            node_members["member_id"].alias("node_id"), "rel_id"),
        "wayid2rawwayjson": ways,
        "wayid2relid": way_members.select(
            way_members["member_id"].alias("way_id"), "rel_id"),
        "relid2rawreljson": relations,
        # join-stage products (the reference's wayid2nodejson etc. are
        # re-keyings the DataFrame plan subsumes; the two user-visible
        # "complete" datasets are the ones worth naming)
        "wayid2completejson": complete_ways,
        "relid2completejson": complete_rels,
        # S7 parity: ways with unresolvable <nd> refs (problemWays.gz
        # analogue — the reference logs these inline, OsmJoin.java:305-312)
        "problemWays": complete_ways.filter(
            complete_ways["missing_node_refs"].isNotNull()
            & (F.size("missing_node_refs") > 0)),
    }


_KV_NODE_SCHEMA = "id long, lon double, lat double, tags map<string,string>"


def write_kv_nodes(nodes: DataFrame, path: str) -> None:
    """Materialize a node table as a reference-layout ``id;json`` gz kv
    file (sorted, deduped — SortingWriter parity via kv_text.write_kv).
    The json payload is this engine's canonical node struct; pair with
    :func:`kv_nodes_to_pois` for a resume-from-intermediate run."""
    from osm2geojson_spark.sources.kv_text import write_kv

    kv = nodes.select(
        F.col("id").cast("string").alias("key"),
        F.to_json(F.struct("id", "lon", "lat", "tags")).alias("value"),
    )
    write_kv(kv, path)


def kv_nodes_to_pois(
    spark: SparkSession, kv_path: str, out_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Resume the POI stage from a ``id;json`` kv intermediate — what the
    reference's OsmPostProcessor.processNodePois does from
    nodeid2rawnodejson.gz (OsmPostProcessor.java:115-154), as one call.

    Quarantine routing (round-3, VERDICT item 10): the reference CRASHES
    on a ';'-less line (EntryParsingProcessor indexOf(-1) →
    StringIndexOutOfBounds); here every malformed line lands in the
    returned ``quarantine`` table instead — ';'-less lines via
    read_kv_malformed, json-unparseable payloads via the from_json null
    check — and the good rows flow on unchanged (problem* discipline,
    OsmJoin.java:111-113).

    Returns {"pois", "quarantine"}."""
    from osm2geojson_spark.sources.kv_text import read_kv, read_kv_malformed

    kv = read_kv(spark, kv_path)
    parsed = kv.select(
        "value", F.from_json("value", _KV_NODE_SCHEMA).alias("n"))
    bad_json = parsed.filter(F.col("n.id").isNull()).select(
        F.col("value").alias("line"),
        F.lit("kv value is not a node json").alias("reason"),
    )
    nodes = parsed.filter(F.col("n.id").isNotNull()).select("n.*")
    quarantine = read_kv_malformed(spark, kv_path).unionByName(bad_json)
    out = {"pois": node_features(nodes), "quarantine": quarantine}
    if out_dir is not None:
        write_jsonlines(out["pois"], f"{out_dir}/osm-pois.gz")
    return out


def osm_to_geojson(
    spark: SparkSession,
    xml_path: str,
    out_dir: str | None = None,
    reference_strict: bool = False,
    distributed: bool = False,
) -> dict[str, DataFrame]:
    """XML dump → categorized GeoJSON feature streams.

    Returns {"pois", "ways", "relations"(unless strict), "quarantine"};
    when ``out_dir`` is given, each stream is also written as gzip
    JSON-lines under the reference's file names (osm-pois.gz layout,
    OsmPostProcessor.java:39-41).

    ``distributed=True`` routes ingest through
    :func:`~osm2geojson_spark.sources.osm_xml.read_osm_blobs_distributed`
    — the reference's headline planet case ("30 GB .osm.bz2, DONOT
    expand it", README.md:37) as ONE call: the single compressed file is
    split across tasks with exact boundary stitching, instead of the
    per-file wholetext scan."""
    if distributed:
        from osm2geojson_spark.sources.osm_xml import (
            parse_osm_blobs,
            read_osm_blobs_distributed,
        )

        tabs = parse_osm_blobs(read_osm_blobs_distributed(spark, xml_path))
    else:
        tabs = read_osm_xml(spark, xml_path)
    complete_ways = assemble_ways(tabs["nodes"], tabs["ways"])
    out: dict[str, DataFrame] = {
        "pois": node_features(tabs["nodes"]),
        "ways": way_features(complete_ways),
        "quarantine": tabs["quarantine"],
    }
    if not reference_strict:
        assembled = assemble_relations(tabs["nodes"], tabs["relations"], complete_ways)
        out["relations"] = relation_features(assembled)
    if out_dir is not None:
        write_jsonlines(out["pois"], f"{out_dir}/osm-pois.gz")
        write_jsonlines(out["ways"], f"{out_dir}/osm-ways.gz")
        if "relations" in out:
            write_jsonlines(out["relations"], f"{out_dir}/osm-relations.gz")
    return out
