"""P8-P13 — tag interpretation as pure column expressions (no UDF).

Recreates ``interpretTags`` (reference OsmPostProcessor.java:244-345):
- addr:* tags → ``address`` map with the prefix stripped (:252-253)
- name:* tags → per-language name map (:254-257; NOTE the reference builds
  this but never attaches it to the output — we expose it behind
  ``include_names``, default off, to match observable behavior)
- whitelist of 10 category tags → "k:v" category; ``highway`` also adds the
  bare "street" (:259-293)
- 7 special-case rules via case-insensitive hasPair (:297-330, :347-354)
- empty category set → row dropped (:332-337, P9)
- website tag → links [{href}] (:341-343)

Category ORDER: the reference uses insertion order of a jsonj JsonSet fed
from a hash-map tag iteration — not stable. We pin a canonical order
(whitelist order, then special rules in source order, then dedup) so output
is deterministic under any partitioning (SURVEY.md §7 risk 2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# OsmPostProcessor.java:259-289 switch cases, in source order
CATEGORY_TAGS = [
    "highway", "leisure", "amenity", "natural", "historic",
    "cuisine", "tourism", "shop", "building", "admin-level",
]

def _empty() -> Column:
    # built lazily: module import must not require an active SparkSession
    return F.array().cast("array<string>")


def _has_pair(tags: Column, key: str, value: str) -> Column:
    """hasPair (OsmPostProcessor.java:347-354): equalsIgnoreCase on value."""
    return F.lower(tags[key]) == value.lower()


def categories_expr(tags: Column) -> Column:
    """Canonical-ordered, deduped category array (P12+P13)."""
    parts: list[Column] = []
    for k in CATEGORY_TAGS:
        tag_cat = F.when(
            tags[k].isNotNull(),
            F.array(F.concat(F.lit(k + ":"), tags[k])),
        ).otherwise(_empty())
        if k == "highway":  # bare "street" precedes "highway:<v>" (:260-261)
            parts.append(
                F.when(tags[k].isNotNull(), F.array(F.lit("street"))).otherwise(_empty())
            )
        parts.append(tag_cat)

    # special rules, source order OsmPostProcessor.java:297-330
    building = F.when(
        _has_pair(tags, "building", "yes"),
        F.when(_has_pair(tags, "amenity", "public_building"),
               F.array(F.lit("public-building"))).otherwise(F.array(F.lit("building"))),
    ).otherwise(_empty())
    parts.append(building)
    parts.append(F.when(_has_pair(tags, "railway", "tram_stop"),
                        F.array(F.lit("tram-stop"))).otherwise(_empty()))
    parts.append(F.when(_has_pair(tags, "railway", "station"),
                        F.array(F.lit("train-station"))).otherwise(_empty()))
    parts.append(F.when(_has_pair(tags, "railway", "halt"),
                        F.array(F.lit("train-station"))).otherwise(_empty()))
    parts.append(F.when(_has_pair(tags, "station", "light_rail"),
                        F.array(F.lit("light-rail-station"))).otherwise(_empty()))
    stop_pos = F.when(
        _has_pair(tags, "public_transport", "stop_position"),
        F.when(_has_pair(tags, "light_rail", "yes"), F.array(F.lit("light-rail-station")))
        .when(_has_pair(tags, "bus", "yes"), F.array(F.lit("bus-stop")))
        .when(_has_pair(tags, "railway", "halt"), F.array(F.lit("train-station")))
        .otherwise(_empty()),
    ).otherwise(_empty())
    parts.append(stop_pos)

    return F.array_distinct(F.concat(*parts))


def address_expr(tags: Column) -> Column:
    """addr:* → map with 5-char prefix stripped (OsmPostProcessor.java:252)."""
    return F.transform_keys(
        F.map_filter(tags, lambda k, _: k.startswith("addr:")),
        lambda k, _: F.substring(k, 6, 2_147_483_647),
    )


def names_expr(tags: Column) -> Column:
    """name:* → map<lang, array<name>> (built-but-unattached in reference)."""
    return F.transform_values(
        F.transform_keys(
            F.map_filter(tags, lambda k, _: k.startswith("name:")),
            lambda k, _: F.substring(k, 6, 2_147_483_647),
        ),
        lambda _, v: F.array(v),
    )


def links_expr(tags: Column) -> Column:
    """website → [{href}] (OsmPostProcessor.java:341-343)."""
    return F.when(
        tags["website"].isNotNull(),
        F.array(F.struct(tags["website"].alias("href"))),
    ).otherwise(F.lit(None).cast("array<struct<href:string>>"))


def interpret_tags(df, tags_col: str = "tags", include_names: bool = False):
    """Attach categories/address/links columns and apply the two row-dropping
    filters: name required (P8) and ≥1 category (P9)."""
    tags = F.col(tags_col)
    out = (
        df.filter(tags["name"].isNotNull())
        .withColumn("title", tags["name"])
        .withColumn("categories", categories_expr(tags))
        .filter(F.size("categories") > 0)
        .withColumn("address", address_expr(tags))
        .withColumn("links", links_expr(tags))
    )
    if include_names:
        out = out.withColumn("names", names_expr(tags))
    return out
