"""BM25 ranked retrieval + PMI collocations vs pure-Python references.

The references recompute scores with Python floats in the SAME IEEE
operation order the Spark expressions use, so equality is exact (==),
not approximate — the determinism contract the oracle gate relies on.
"""

from __future__ import annotations

from collections import Counter

import pytest

from osm2geojson_spark.functions.text import collocations
from osm2geojson_spark.operators.search import bm25_topk

DOCS = [
    (0, "spark join shuffle join spark table"),
    (1, "table scan filter scan scan"),
    (2, "join the big table join"),
    (3, "spark spark spark"),
    (4, "filter merge sort merge"),
    (5, "  "),                       # empty after trim — excluded from N
    (6, "the the the join"),
    (7, "sort sort merge table spark join"),
]


def _toks(t):
    return [w for w in t.strip().split() if w]


def _ref_bm25(query, p1=6, q1=5, p2=3, q2=4):
    docs = {i: _toks(t) for i, t in DOCS if _toks(t)}
    n = len(docs)
    l_tot = sum(len(v) for v in docs.values())
    out = {}
    dfc = Counter()
    for ws in docs.values():
        for term in set(ws):
            if term in query:
                dfc[term] += 1
    for i, ws in docs.items():
        score, hits = 0.0, 0
        for term in sorted(set(query)):
            tf = ws.count(term)
            if tf == 0:
                continue
            hits += 1
            df = dfc[term]
            idf = float(2 * n - 2 * df + 1) / float(2 * df + 1)
            num = float((p1 + q1) * q2 * tf * l_tot)
            den = float(q1 * q2 * l_tot * tf + p1 * (q2 - p2) * l_tot
                        + p1 * p2 * len(ws) * n)
            score = score + idf * (num / den)
        if hits:
            out[i] = (hits, score)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_reference(docs_df):
    got = {r.doc_id: (r.n_hit_terms, r.score)
           for r in bm25_topk(docs_df, ["spark", "join", "merge"]).collect()}
    assert got == _ref_bm25({"spark", "join", "merge"})


def test_bm25_ordering_and_limit(docs_df):
    rows = bm25_topk(docs_df, ["spark", "join"], limit=3).collect()
    assert len(rows) == 3
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # doc 0 hits BOTH terms (spark, join) — two idf·tf contributions
    # outrank any single-term doc
    assert rows[0].doc_id == 0


def test_bm25_rejects_bad_args(docs_df):
    with pytest.raises(ValueError):
        bm25_topk(docs_df, [])
    with pytest.raises(ValueError):
        bm25_topk(docs_df, ["x"], b=(5, 4))


def test_collocations_matches_reference(docs_df):
    uni, pairs = Counter(), Counter()
    for _, t in DOCS:
        ws = _toks(t)
        uni.update(ws)
        pairs.update(zip(ws, ws[1:]))
    u_tot, t_tot = sum(uni.values()), sum(pairs.values())
    want = {}
    for (a, b), c in pairs.items():
        if c >= 2:
            want[(a, b)] = (c, uni[a], uni[b],
                            float(c * u_tot * u_tot)
                            / float(t_tot * uni[a] * uni[b]))
    got = {(r.term_a, r.term_b): (r.c_pair, r.c_a, r.c_b, r.pmi_ratio)
           for r in collocations(docs_df, min_count=2).collect()}
    assert got == want


def test_collocations_min_count_and_order(docs_df):
    rows = collocations(docs_df, min_count=2).collect()
    assert all(r.c_pair >= 2 for r in rows)
    ratios = [r.pmi_ratio for r in rows]
    assert ratios == sorted(ratios, reverse=True)


def test_rake_word_stats_hand_corpus(spark):
    from osm2geojson_spark.operators.search import rake_word_stats

    docs = spark.createDataFrame(
        [(1, "The quick brown fox and the lazy dog!"),
         (2, "quick quick, and the DOG."),
         (3, "a lazy lazy dog in fog")],
        "doc_id long, text string")
    got = {r["w"]: (r["freq"], r["degree"])
           for r in rake_word_stats(docs, min_freq=1).collect()}
    # doc1 phrases: [quick brown fox] [lazy dog]
    # doc2 phrases: [quick quick] [dog]
    # doc3 phrases: [lazy lazy dog] [fog]
    assert got["quick"] == (3, 3 + 2 + 2)   # len3 once, len2 twice
    assert got["dog"] == (3, 2 + 1 + 3)
    assert got["lazy"] == (3, 2 + 3 + 3)    # doc3 counts it twice
    assert got["fox"] == (1, 3)
    assert got["fog"] == (1, 1)
    assert "the" not in got and "and" not in got and "a" not in got
    # min_freq filter
    got3 = {r["w"] for r in rake_word_stats(docs, min_freq=3).collect()}
    assert got3 == {"quick", "dog", "lazy"}
