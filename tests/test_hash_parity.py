"""Independent-reference exactness for the seeded-hash dedup family.

DuckDB cannot reproduce Spark's xxhash64 natively, so the pure-Python
XXH64 reference in ``pyref`` (public algorithm, Collet '12) re-derives
Spark's hashes bit-for-bit; this file pins the Spark operators against
it 1:1, and ``queries.py`` reuses the same reference to generate the
literal-table (VALUES) DuckDB oracles for minhash/simhash in the
driver's gate.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.pyref import (
    _M,
    signed64 as _signed,
    spark_xxhash64_str,
    spark_xxhash64_str_lit,
    spark_xxhash64_str_long,
    xxh64,
)


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
