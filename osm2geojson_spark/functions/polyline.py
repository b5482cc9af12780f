"""Google Encoded Polyline codec, precision-6 (the OSRM/Valhalla
variant) on the repo's integer-microdegree lattice.

Completes the geometry-interchange set (GeoJSON, WKB, WKT, MVT): the
compact path format routing engines and the Maps APIs exchange. The
algorithm is pure integer — per-vertex (lat, lon) deltas, zigzag,
5-bit little-endian chunks with a continuation bit, +63 into printable
ASCII — so the encoded STRING is value-exact across engines.

Encode is PURE CODEGEN: a ``transform`` with index computes the deltas
(previous vertex via ``element_at`` — Spark HOF indices are 0-based,
the SQL twin's are 1-based), and the variable-length chunk loop is
unrolled to 7 fixed conditional chars (zigzagged microdegree deltas
< 2³⁰ need ≤ 6; 7 is the int64-safe margin) — zero Python per row.
Decode is one Arrow-batched kernel (the WKB/WKT reader discipline):
strict grammar, ValueError on truncated chunk sequences.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "polyline6_encode_expr",
    "polyline6_decode",
    "polyline6_decode_udf",
]


def _zigzag(d: Column) -> Column:
    return F.when(d < 0, (-d) * 2 - 1).otherwise(d * 2)


def _enc5(v: Column) -> Column:
    """Zigzagged non-negative int → chunk chars (unrolled ×7)."""
    parts = []
    for k in range(7):
        cur = F.shiftright(v, 5 * k)
        code = cur.bitwiseAND(F.lit(31)) + F.when(
            F.shiftright(v, 5 * (k + 1)) > 0, F.lit(95)).otherwise(F.lit(63))
        emit = (cur > 0) | F.lit(k == 0)
        parts.append(F.when(emit, F.char(code)).otherwise(F.lit("")))
    return F.concat(*parts)


def polyline6_encode_expr(pts: Column) -> Column:
    """``array<struct<x,y>>`` (x=lon, y=lat, integer microdegrees) →
    encoded polyline string (lat first per vertex, per the spec)."""

    def enc_pair(p: Column, i: Column) -> Column:
        prev = F.element_at(pts, i)     # 0-based i == previous vertex
        dlat = F.when(i == 0, p["y"]).otherwise(p["y"] - prev["y"])
        dlon = F.when(i == 0, p["x"]).otherwise(p["x"] - prev["x"])
        return F.concat(_enc5(_zigzag(dlat)), _enc5(_zigzag(dlon)))

    return F.array_join(F.transform(pts, enc_pair), "")


def polyline6_decode(s: str) -> list[tuple[int, int]]:
    """Encoded polyline → [(x, y), …] integer microdegrees."""
    vals = []
    acc = shift = 0
    for ch in s:
        c = ord(ch) - 63
        if c < 0 or c > 63:
            raise ValueError(f"polyline char out of range: {ch!r}")
        acc |= (c & 31) << shift
        if c & 32:
            shift += 5
            if shift > 60:
                raise ValueError("polyline chunk overflow")
        else:
            vals.append((acc >> 1) ^ -(acc & 1))
            acc = shift = 0
    if shift or acc:
        raise ValueError("truncated polyline chunk sequence")
    if len(vals) % 2:
        raise ValueError("odd value count (lat without lon)")
    out = []
    lat = lon = 0
    for i in range(0, len(vals), 2):
        lat += vals[i]
        lon += vals[i + 1]
        out.append((lon, lat))
    return out


def polyline6_decode_udf():
    """Arrow-batched decoder: string → array<struct<x,y>> (NULL on
    malformed input — quarantine upstream)."""
    from pyspark.sql.pandas.functions import pandas_udf

    def run(col: pd.Series) -> pd.Series:
        out = []
        for s in col:
            try:
                out.append([{"x": x, "y": y}
                            for x, y in polyline6_decode(s)])
            except (ValueError, TypeError):
                out.append(None)
        return pd.Series(out)

    return pandas_udf(run, "array<struct<x: long, y: long>>")
