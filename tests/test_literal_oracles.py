"""The literal-table (VALUES) oracle generators: shape, determinism, and
exact IEEE-double round-trip through DuckDB.

The full Spark-vs-oracle value comparison runs in tools/check_oracle.py
(and the driver's gate); these tests pin the generator machinery itself
so a regression is caught without a Spark session.
"""

from __future__ import annotations

import duckdb

from osm2geojson_spark import pyref
from osm2geojson_spark.queries import (
    _sql_embedding_ivf,
    _sql_image_phash_dedup,
    _sql_minhash_pairs,
    _sql_simhash_pairs,
)


def test_values_sql_double_roundtrip_bit_exact():
    """The DECIMAL-literal trap: a bare 0.9868421052631579 literal is
    typed DECIMAL by DuckDB and its decimal→double cast is lossy once
    the scaled mantissa exceeds 2^53. The generator must ship doubles
    through a VARCHAR cast (strtod, correctly rounded)."""
    vals = [75.0 / 76.0, 0.9999999796724734 / 0.9999999796724736,
            1.0, 0.1, 2.0 ** -1074]
    sql = pyref.values_sql([(v,) for v in vals], [("x", "DOUBLE")])
    got = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert [repr(g) for g in got] == [repr(v) for v in vals]


def test_values_sql_empty_is_typed_zero_rows():
    sql = pyref.values_sql([], [("a", "BIGINT"), ("b", "DOUBLE")])
    rel = duckdb.sql(sql)
    assert rel.fetchall() == []
    assert [c.lower() for c in rel.columns] == ["a", "b"]


def test_values_sql_varchar_escaping():
    sql = pyref.values_sql([("it's",), ("a''b",)], [("s", "VARCHAR")])
    got = sorted(r[0] for r in duckdb.sql(sql).fetchall())
    assert got == ["a''b", "it's"]


def test_generated_oracles_parse_and_are_nonempty():
    for gen, cols in [
        (_sql_minhash_pairs, ["id_a", "id_b", "jaccard"]),
        (_sql_simhash_pairs, ["id_a", "id_b", "hamming"]),
        (_sql_embedding_ivf, ["query_id", "corpus_id", "cosine", "rank"]),
        (_sql_image_phash_dedup, ["id_a", "id_b", "hamming"]),
    ]:
        rel = duckdb.sql(gen())
        assert [c.lower() for c in rel.columns] == cols
        assert len(rel.fetchall()) > 0, gen.__name__


def test_generated_oracles_deterministic():
    assert _sql_minhash_pairs() == _sql_minhash_pairs()
    assert _sql_embedding_ivf() == _sql_embedding_ivf()


def test_ref_minhash_jaccard_is_plain_division():
    rows = pyref.ref_minhash_pairs([(1, "a b c d e"), (2, "a b c d f")])
    # shingles: {abc,bcd,cde} vs {abc,bcd,cdf} → 2/4 if banded together
    for _, _, j in rows:
        assert j == 0.5
    # identical docs share every band — the pair is guaranteed, jaccard 1
    rows = pyref.ref_minhash_pairs([(1, "x y z w"), (5, "x y z w")])
    assert rows == [(1, 5, 1.0)]
