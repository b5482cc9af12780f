"""Independent-reference exactness for the seeded-hash dedup family.

DuckDB cannot reproduce Spark's xxhash64, so minhash/simhash stay
rows-only in the driver's oracle gate — THIS file is their value-exact
check instead: a pure-Python XXH64 (public algorithm, Collet '12)
re-derives Spark's hashes bit-for-bit, then the whole minhash-signature
and simhash pipelines are recomputed independently and compared 1:1.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64(data: bytes, seed: int) -> int:
    """Reference XXH64 over bytes (unsigned result)."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, struct.unpack_from("<Q", data, i)[0])
            v2 = _round(v2, struct.unpack_from("<Q", data, i + 8)[0])
            v3 = _round(v3, struct.unpack_from("<Q", data, i + 16)[0])
            v4 = _round(v4, struct.unpack_from("<Q", data, i + 24)[0])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, struct.unpack_from("<Q", data, i)[0])
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (struct.unpack_from("<I", data, i)[0] * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark F.xxhash64(string_col) == XXH64(utf8 bytes, seed=42), signed."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def spark_xxhash64_str_long(s: str, i: int) -> int:
    """Spark F.xxhash64(string_col, long_col): columns chain — each value
    hashed with the running hash as seed, starting at 42. A LongType
    value contributes 8 little-endian bytes."""
    h1 = xxh64(s.encode("utf-8"), 42)
    return _signed(xxh64(struct.pack("<q", i), h1))


def spark_xxhash64_str_lit(s: str, i: int) -> int:
    """Spark F.xxhash64(string_col, F.lit(i)): F.lit of a small Python
    int is IntegerType → 4 little-endian bytes in the chain (unlike a
    DataFrame int column, which is LongType)."""
    h1 = xxh64(s.encode("utf-8"), 42)
    return _signed(xxh64(struct.pack("<i", i), h1))


def test_xxh64_known_vectors():
    """Public xxHash test vectors (seed 0 / prime seed)."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999


def test_spark_xxhash64_single_string_matches(spark):
    vals = ["", "a", "abc", "hello world", "x" * 31, "y" * 32, "z" * 100,
            "käse; dröge", "tab\tnewline\n"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r["s"]: r["h"] for r in
           df.select("s", F.xxhash64("s").alias("h")).collect()}
    for v in vals:
        assert got[v] == spark_xxhash64_str(v), v


def test_spark_xxhash64_string_int_chain_matches(spark):
    cases = [("abc", 7), ("", 0), ("shingle text here", 11), ("x" * 40, 7)]
    df = spark.createDataFrame(cases, ["s", "i"])
    got = [(r["s"], r["i"], r["h"], r["hl"]) for r in
           df.select("s", "i", F.xxhash64("s", F.col("i")).alias("h"),
                     F.xxhash64("s", F.lit(7)).alias("hl")).collect()]
    for s, i, h, hl in got:
        assert h == spark_xxhash64_str_long(s, i), (s, i)
        assert hl == spark_xxhash64_str_lit(s, 7), s


_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "completely different content with other words entirely"),
    (3, "short doc"),
]


def test_minhash_signatures_match_pure_python(spark):
    """End-to-end: Spark minhash signatures == an independent Python
    recomputation (shingles → XXH64 chain → affine family → min)."""
    from osm2geojson_spark.operators.dedup import (
        _P,
        minhash_signatures,
        shingle_postings,
    )

    num_hashes, seed, n = 8, 7, 3
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    postings = shingle_postings(docs, "doc_id", "text", n)
    got = {r["id"]: list(r["sig"]) for r in
           minhash_signatures(postings, num_hashes, seed).collect()}

    for doc_id, text in _DOCS:
        toks = text.split()
        if len(toks) >= n:
            shingles = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        else:
            shingles = {" ".join(toks)}
        base = [abs(spark_xxhash64_str_lit(g, seed)) % _P for g in shingles]
        want = [min((h * (2 * i + 1) + 7919 * (i + 1)) % _P for h in base)
                for i in range(num_hashes)]
        assert got[doc_id] == want, doc_id


def test_simhash_matches_pure_python(spark):
    """Spark simhash_expr == independent Python recomputation (per-token
    XXH64 chain, sign-summed bits)."""
    from osm2geojson_spark.operators.dedup import simhash_expr

    seed = 11
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["h"] for r in docs.select(
        "doc_id", simhash_expr(F.col("text"), seed=seed).alias("h")).collect()}

    for doc_id, text in _DOCS:
        counts = [0] * 64
        for t in text.split():
            h = spark_xxhash64_str_lit(t, seed) & _M
            for b in range(64):
                counts[b] += 1 if (h >> b) & 1 else -1
        v = 0
        for b in range(64):
            if counts[b] > 0:
                v |= 1 << b
        assert got[doc_id] == _signed(v), doc_id
