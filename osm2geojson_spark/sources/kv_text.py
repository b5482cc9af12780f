"""S4/S5 — the reference's `key;value` sorted multimap gz files, as a
byte-parity source/sink (EntryParsingProcessor.java:8-19 parse rule,
SortingWriter.java:25-28 sorted-gz layout, ImmutableEntry.java:35-37
serialization).

Semantics reproduced exactly:

- split at the FIRST ';' only — values containing ';' survive
  (EntryParsingProcessor.java:12-14);
- keys sort LEXICOGRAPHICALLY as strings ("10" < "9"), because the
  reference stringifies ids (OsmJoin.java:175,206) — SURVEY §1.2;
- (key, value) pairs are deduplicated (TreeMultimap, SortingWriter.java:
  76-81) when ``dedup=True``;
- P7's length-skip fast path (OsmPostProcessor.java:373) is exposed as
  ``min_value_length`` for byte-parity replays.

In the engine proper these files are parquet/Iceberg tables; this module
exists so reference-produced intermediates can be diffed byte-for-byte
against ours (golden parity mode), and as the migration ramp for users
with existing osm2geojson outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_kv(spark: SparkSession, path: str,
            min_value_length: int | None = None) -> DataFrame:
    """gz `key;value` lines → (key string, value string). Spark handles
    the gzip codec; split at the first ';' only.

    Lines WITHOUT a ';' are dropped here (deliberate divergence,
    documented: the reference crashes the whole job on such a line —
    EntryParsingProcessor's indexOf(-1) → StringIndexOutOfBounds; a
    distributed job must not die on one bad line). Route them to the
    problem* sink via :func:`read_kv_malformed` instead."""
    df = spark.read.text(path).filter(F.col("value").contains(";")).select(
        F.substring_index("value", ";", 1).alias("key"),
        # everything after the first ';' — length-based, so ';' in values
        # survives (substring_index from the right would not)
        F.expr("substring(value, length(substring_index(value, ';', 1)) + 2)")
        .alias("value"),
    )
    if min_value_length is not None:
        df = df.filter(F.length("value") > min_value_length)
    return df


def read_kv_malformed(spark: SparkSession, path: str) -> DataFrame:
    """Quarantine stream for read_kv: the `;`-less lines the reference
    would have crashed on, with a reason column (S7 problem* discipline)."""
    return spark.read.text(path).filter(~F.col("value").contains(";")).select(
        F.col("value").alias("line"),
        F.lit("kv line without ';' separator").alias("reason"),
    )


def write_kv(df: DataFrame, path: str, key: str = "key", value: str = "value",
             dedup: bool = True) -> None:
    """(key, value) → ONE sorted gz text file, byte-layout identical to a
    SortingWriter output: lexicographic string-key order, `key;value`
    lines, (k,v) dedup.

    coalesce(1) mirrors the reference's single output stream; parity mode
    only — the engine's real sinks stay partitioned parquet."""
    out = df.select(
        F.col(key).cast("string").alias("k"), F.col(value).cast("string").alias("v"))
    if dedup:
        out = out.dropDuplicates(["k", "v"])
    (out.select(F.concat_ws(";", "k", "v").alias("line"), "k", "v")
     .coalesce(1)
     .sortWithinPartitions("k", "v")
     .select("line")
     .write.mode("overwrite").option("compression", "gzip").text(path))


def write_jsonlines(df: DataFrame, path: str, doc_col: str = "geojson") -> None:
    """S6 — one JSON doc per line, gzip (createJsonWriter,
    OsmPostProcessor.java:60-113). Partitioned (scale path); pass the
    result of .coalesce(1) for single-file parity."""
    df.select(F.col(doc_col).alias("line")).write.mode("overwrite") \
        .option("compression", "gzip").text(path)
