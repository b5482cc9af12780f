"""Distributed BPE trainer (operators/bpe.py) vs the pure-Python
reference (pyref.ref_bpe_merges): textbook merges, greedy-overlap
semantics, tie-breaks, and full-corpus parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.bpe import (
    _initial_symbols,
    _merge_expr,
    apply_bpe,
    train_bpe,
)
from osm2geojson_spark.pyref import _bpe_merge_word, ref_bpe_merges

TOY = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "low new lower newer"),
]


def _train_rows(spark, docs, k):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return [
        (r["rank"], r["left"], r["right"], r["pair_freq"])
        for r in train_bpe(df, num_merges=k).collect()
    ]


class TestTrain:
    def test_textbook_sequence(self, spark):
        got = _train_rows(spark, TOY, 8)
        assert got == [
            (0, "l", "o", 7), (1, "n", "e", 6), (2, "w", "e", 6),
            (3, "lo", "w</w>", 4), (4, "we", "r</w>", 4),
            (5, "ne", "w</w>", 3), (6, "lo", "wer</w>", 2),
            (7, "ne", "wer</w>", 2),
        ]

    def test_parity_vs_python_on_corpus(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
            .where(F.col("doc_id") < 120).select("doc_id", "text")
        pydocs = [(r["doc_id"], r["text"]) for r in docs.collect()]
        assert _train_rows(spark, pydocs, 12) == ref_bpe_merges(pydocs, 12)

    def test_tie_break_lexicographic(self, spark):
        # "ab" and "cd" both appear twice: (a,b) and (c,d) tie at 2 —
        # lexicographically smaller left wins first
        docs = [(0, "ab ab cd cd")]
        got = _train_rows(spark, docs, 2)
        assert got[0][1:3] == ("a", "b</w>")
        assert got[1][1:3] == ("c", "d</w>")

    def test_exhaustion_stops_early(self, spark):
        # one word, 2 symbols -> only 1 merge possible, then no pairs
        got = _train_rows(spark, [(0, "ab ab")], 10)
        assert [g[1:3] for g in got] == [("a", "b</w>")]


class TestMergeSemantics:
    def test_greedy_non_overlapping(self, spark):
        # pure-column carry-scan == pure-Python scan on pathological runs
        words = ["aaaa", "aaa", "aa", "abab", "aab"]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        out = df.select(
            F.col("word"),
            _merge_expr(_initial_symbols(F.col("word")), "a", "a").alias("m"),
        ).collect()
        for r in out:
            syms = list(r["word"][:-1]) + [r["word"][-1] + "</w>"]
            assert r["m"] == _bpe_merge_word(syms, "a", "a"), r["word"]

    def test_merged_token_does_not_cascade(self, spark):
        # merging (a,a) in "aaa" must give [aa, a</w>], not [aaa</w>]
        df = spark.createDataFrame([("aaa",)], "word string")
        r = df.select(
            _merge_expr(_initial_symbols(F.col("word")), "a", "a").alias("m")
        ).first()
        assert r["m"] == ["aa", "a</w>"]


class TestApply:
    def test_token_counts_match_reference(self, spark):
        df = spark.createDataFrame(TOY, "doc_id long, text string")
        merges = [(m[1], m[2]) for m in ref_bpe_merges(TOY, 8)]
        got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
               for r in apply_bpe(df, merges).collect()}
        # python replay
        import re
        for did, text in TOY:
            words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
            total = 0
            for w in words:
                syms = list(w[:-1]) + [w[-1] + "</w>"]
                for a, b in merges:
                    syms = _bpe_merge_word(syms, a, b)
                total += len(syms)
            assert got[did] == (len(words), total), did

    def test_compression_monotone(self, spark):
        # more merges never increases the encoded length
        df = spark.createDataFrame(TOY, "doc_id long, text string")
        merges = [(m[1], m[2]) for m in ref_bpe_merges(TOY, 8)]
        n0 = apply_bpe(df, []).agg(F.sum("n_bpe_tokens")).first()[0]
        n8 = apply_bpe(df, merges).agg(F.sum("n_bpe_tokens")).first()[0]
        assert n8 < n0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_ref_bpe_encode_matches_engine(spark):
    from osm2geojson_spark.operators.bpe import train_bpe
    from osm2geojson_spark.pyref import ref_bpe_encode

    docs = [(1, "the cat sat on the mat"),
            (2, "the cats sat"),
            (3, "mats and cats and hats"),
            (4, "   "),  # whitespace-only: dropped on both sides
            (5, "on on on the the")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges_df = train_bpe(df, num_merges=6)
    merges = [(r["left"], r["right"])
              for r in merges_df.orderBy("rank").collect()]
    from osm2geojson_spark.operators.bpe import apply_bpe
    got = {(r.doc_id, r.n_words, r.n_bpe_tokens)
           for r in apply_bpe(df, merges).collect()}
    want = set(ref_bpe_encode(docs, num_merges=6))
    assert got == want
    assert not any(d == 4 for d, _, _ in got)
