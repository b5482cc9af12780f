"""URL canonicalization — the crawl-dedup normalizer, pure codegen.

Web corpora are keyed by URL, and the same page shows up under dozens of
spellings: scheme/host case, default ports, `www.`, tracking params in
random order, trailing slashes, fragments. Canonicalizing BEFORE the
dedup groupBy is the first stage of every crawl pipeline (C4, CCNet,
RefinedWeb all do a variant).

Everything here is built-in `pyspark.sql.functions` string/array ops —
whole-stage-codegen JVM expressions, no Python in the hot path, and
every step has a DuckDB twin (split_part / list_filter / list_sort), so
the catalog oracle re-derives canonical URLs value-exact.

Normalization policy (documented because policies differ):
- scheme and host lowercased; fragment dropped
- default ports stripped (``:80`` for http, ``:443`` for https)
- a single leading ``www.`` label dropped
- ``utm_*`` tracking params dropped; remaining params sorted by full
  ``k=v`` text (byte order); empty query → no ``?``
- trailing ``/`` runs stripped from the path; empty path → ``/``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "url_dedup"]


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL as a single codegen
    expression chain. Malformed inputs (no ``://``) pass through
    lowercased-scheme-only — callers quarantine on `NOT contains('://')`
    if they need strictness."""
    no_frag = F.substring_index(url, "#", 1)
    scheme = F.lower(F.substring_index(no_frag, "://", 1))
    rest = F.substring_index(no_frag, "://", -1)
    hostport = F.substring_index(rest, "/", 1)
    # path+query = rest minus the hostport prefix (may be empty)
    path_q = F.substring(rest, F.length(hostport) + 1,
                         F.length(rest) - F.length(hostport))
    path = F.substring_index(path_q, "?", 1)
    query = F.when(path_q.contains("?"),
                   F.substring_index(path_q, "?", -1)).otherwise(F.lit(""))

    host = F.lower(hostport)
    host = F.regexp_replace(host, r"^www\.", "")
    host = (F.when((scheme == "http"), F.regexp_replace(host, ":80$", ""))
            .when((scheme == "https"), F.regexp_replace(host, ":443$", ""))
            .otherwise(host))

    clean_path = F.regexp_replace(path, "/+$", "")
    clean_path = F.when(clean_path == "", F.lit("/")).otherwise(clean_path)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"))
    params = F.array_join(F.array_sort(params), "&")

    return F.concat(
        scheme, F.lit("://"), host, clean_path,
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"),
                                                           params)))


def url_dedup(df, url_col: str = "url", id_col: str = "doc_id"):
    """Canonicalize → group: one row per canonical URL with the lowest
    id as the keeper and the duplicate count — the crawl-dedup first
    stage. One shuffle on the canonical key."""
    return (df.select(F.col(id_col),
                      canonicalize_url(F.col(url_col)).alias("canon_url"))
            .groupBy("canon_url")
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count(F.lit(1)).alias("n_dups")))
