"""OGC Well-Known Text geometry codec on an integer lattice.

Completes the interop trio: GeoJSON (the reference's own output format,
``OsmPostProcessor.java``), WKB (``functions/wkb.py``), and now WKT —
the human-readable interchange PostGIS/DuckDB-spatial/BigQuery all
accept. Coordinates are INTEGER lattice values (the repo's microdegree
convention): float→text formatting is the classic cross-engine
determinism trap (Spark and DuckDB render doubles differently), while
int64→text is identical everywhere — so WKT built here is value-exact
under the DuckDB oracle AND canonical (byte-stable) for hashing.

Encode is PURE CODEGEN — nested ``transform``/``array_join`` string
builds, zero Python in the hot path (a WKT writer that runs per-row
Python on a 10^12-row table is a non-starter). Decode is one
Arrow-batched kernel (same discipline as the WKB/MVT readers): strict
grammar, ValueError on malformed text.

WKT polygon rings are CLOSED (first vertex repeated); the encoder
appends the closure, the decoder validates and strips it — so decoded
rings round-trip to the repo's open-ring convention (the same
closure rule GeoJSON uses, ``functions/geometry.py``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "wkt_point_expr",
    "wkt_linestring_expr",
    "wkt_polygon_expr",
    "wkt_parse",
    "wkt_parse_udf",
]


def _xy(p: Column) -> Column:
    return F.concat(p["x"].cast("string"), F.lit(" "),
                    p["y"].cast("string"))


def wkt_point_expr(x: Column, y: Column) -> Column:
    return F.concat(F.lit("POINT ("), x.cast("string"), F.lit(" "),
                    y.cast("string"), F.lit(")"))


def wkt_linestring_expr(pts: Column) -> Column:
    """array<struct<x,y>> (≥ 2 points) → 'LINESTRING (x y, x y, …)'."""
    return F.concat(
        F.lit("LINESTRING ("),
        F.array_join(F.transform(pts, _xy), ", "),
        F.lit(")"))


def _ring_text(ring: Column) -> Column:
    closed = F.concat(ring, F.slice(ring, 1, 1))  # append closure vertex
    return F.concat(F.lit("("),
                    F.array_join(F.transform(closed, _xy), ", "),
                    F.lit(")"))


def wkt_polygon_expr(rings: Column) -> Column:
    """array<array<struct<x,y>>> (ring 0 = exterior, open rings) →
    'POLYGON ((…), (…))' with closure vertices appended."""
    return F.concat(
        F.lit("POLYGON ("),
        F.array_join(F.transform(rings, _ring_text), ", "),
        F.lit(")"))


# -------------------------------------------------------------- decoding
_NUM = re.compile(r"-?\d+$")


def _parse_pt(tok: str) -> tuple:
    parts = tok.strip().split()
    if len(parts) != 2 or not _NUM.match(parts[0]) or not _NUM.match(parts[1]):
        raise ValueError(f"bad WKT coordinate {tok!r}")
    return int(parts[0]), int(parts[1])


def _split_groups(body: str) -> list:
    """Split a parenthesized group list '(…), (…)' at depth 0 commas."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError("unbalanced parentheses in WKT")
            if depth == 0:
                groups.append(body[start:i])
        elif depth == 0 and not ch.isspace() and ch != ",":
            raise ValueError(f"unexpected {ch!r} in WKT body")
    if depth != 0:
        raise ValueError("unbalanced parentheses in WKT")
    return groups


def _ring_from(text: str) -> list:
    pts = [_parse_pt(t) for t in text.split(",")]
    if len(pts) < 4 or pts[0] != pts[-1]:
        raise ValueError("WKT ring must be closed with ≥ 4 points")
    return pts[:-1]  # strip closure → repo open-ring convention


def wkt_parse(text: str) -> tuple:
    """Scalar reference parser: WKT → (geom_type, rings) where rings is
    [[(x, y), …], …] (open rings; POINT/LINESTRING use one ring)."""
    s = text.strip()
    m = re.match(r"(POINT|LINESTRING|POLYGON|MULTIPOLYGON)\s*\(", s)
    if not m or not s.endswith(")"):
        raise ValueError(f"unsupported WKT {text[:40]!r}")
    typ = m.group(1)
    body = s[m.end() - 1:]
    if typ == "POINT":
        inner = body[1:-1]
        return typ, [[_parse_pt(inner)]]
    if typ == "LINESTRING":
        pts = [_parse_pt(t) for t in body[1:-1].split(",")]
        if len(pts) < 2:
            raise ValueError("LINESTRING needs ≥ 2 points")
        return typ, [pts]
    if typ == "POLYGON":
        return typ, [_ring_from(g) for g in _split_groups(body[1:-1])]
    # MULTIPOLYGON: one level deeper; flatten to rings with poly breaks
    polys = []
    for g in _split_groups(body[1:-1]):
        polys.append([_ring_from(r) for r in _split_groups(g)])
    return typ, [r for p in polys for r in p]


def wkt_parse_udf():
    """Arrow-batched WKT reader: string → struct<geom_type string,
    rings array<array<struct<x long, y long>>>, error string>. Malformed
    rows carry the error instead of failing the batch (quarantine
    discipline, OsmJoin.java:176-179)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    pt = StructType([StructField("x", LongType()),
                     StructField("y", LongType())])
    out = StructType([
        StructField("geom_type", StringType()),
        StructField("rings", ArrayType(ArrayType(pt))),
        StructField("error", StringType()),
    ])

    @pandas_udf(out)
    def parse(texts: pd.Series) -> pd.DataFrame:
        types, rings, errs = [], [], []
        for t in texts:
            try:
                ty, rr = wkt_parse(t)
                types.append(ty)
                rings.append([[{"x": x, "y": y} for x, y in r]
                              for r in rr])
                errs.append(None)
            except (ValueError, AttributeError, TypeError) as e:
                types.append(None)
                rings.append(None)
                errs.append(str(e))
        return pd.DataFrame(
            {"geom_type": types, "rings": rings, "error": errs})

    return parse
