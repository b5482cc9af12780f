"""Corpus-hygiene operators (operators/corpus.py) vs independent
pure-Python references: decontamination gram counting, PII redaction,
hash-order sampling, boilerplate chunk stripping."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators import corpus as CP


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta"),
    (1, "alpha beta gamma delta other words here now"),      # shares 4-grams w/ 0
    (2, "completely different text with no overlap at all"),
    (3, "alpha beta gamma delta epsilon zeta eta theta"),    # == doc 0
    (4, "tiny doc"),                                         # < n tokens
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _ref_ngrams(text: str, n: int) -> list[str]:
    t = text.split()
    return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]


class TestDecontaminate:
    def test_vs_python_reference(self, spark):
        df = _docs_df(spark)
        bench = df.where(F.col("doc_id") == 0)
        train = df.where(F.col("doc_id") != 0)
        got = {
            r["doc_id"]: (r["n_ngrams"], r["n_hits"], r["contaminated"])
            for r in CP.decontaminate(train, bench, n=4).collect()
        }
        bench_set = set(_ref_ngrams(DOCS[0][1], 4))
        for did, text in DOCS[1:]:
            grams = _ref_ngrams(text, 4)
            hits = sum(g in bench_set for g in grams)
            assert got[did] == (len(grams), hits, hits > 0), did
        # the exact copy is fully contaminated; the prefix-sharing doc
        # hits exactly one 4-gram; short doc has zero grams
        assert got[3][0] == got[3][1] == 5
        assert got[1][1] == 1
        assert got[4] == (0, 0, False)


class TestPiiRedact:
    CASES = [
        (0, "mail a.b+c@sub.ex.com and x@y.io end"),
        (1, "call 555-123-4567 or 555-000-1111"),
        (2, "host 10.0.200.13 then 192.168.1.1"),
        (3, "mixed u@ex.com 555-123-4567 10.1.2.3"),
        (4, "clean text with no pii at all"),
    ]

    def test_counts_and_redaction(self, spark):
        df = spark.createDataFrame(self.CASES, "doc_id long, text string")
        rows = {r["doc_id"]: r for r in CP.pii_redact(df).collect()}
        assert (rows[0]["n_emails"], rows[0]["n_phones"], rows[0]["n_ips"]) \
            == (2, 0, 0)
        assert rows[1]["n_phones"] == 2
        assert rows[2]["n_ips"] == 2
        assert (rows[3]["n_emails"], rows[3]["n_phones"], rows[3]["n_ips"]) \
            == (1, 1, 1)
        assert rows[4]["redacted"] == self.CASES[4][1]
        assert rows[3]["redacted"] == "mixed <PII> <PII> <PII>"
        for r in rows.values():
            assert "@" not in r["redacted"]

    def test_idempotent(self, spark):
        df = spark.createDataFrame(self.CASES, "doc_id long, text string")
        once = CP.pii_redact(df).select(
            F.col("doc_id"), F.col("redacted").alias("text"))
        twice = CP.pii_redact(once).collect()
        for r in twice:
            assert r["n_emails"] == r["n_phones"] == r["n_ips"] == 0


class TestSampling:
    def test_threshold_matches_hashlib(self, spark):
        df = spark.range(0, 500).withColumnRenamed("id", "k")
        kept = {r["k"] for r in
                CP.sample_by_hash(df, "k", "80").collect()}
        ref = {i for i in range(500) if _md5(str(i)) < "80"}
        assert kept == ref
        assert 0 < len(kept) < 500

    def test_threshold_monotone_subset(self, spark):
        df = spark.range(0, 300).withColumnRenamed("id", "k")
        small = {r["k"] for r in CP.sample_by_hash(df, "k", "20").collect()}
        big = {r["k"] for r in CP.sample_by_hash(df, "k", "a0").collect()}
        assert small < big

    def test_stratified_exact_k(self, spark):
        rows = [(i, f"s{i % 3}") for i in range(100)] + [(1000, "rare")]
        df = spark.createDataFrame(rows, "k long, g string")
        out = CP.stratified_sample(df, "g", "k", k=7).collect()
        by_g: dict[str, list] = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(r)
        assert {g: len(v) for g, v in by_g.items()} == \
            {"s0": 7, "s1": 7, "s2": 7, "rare": 1}
        # hash-order reference per stratum
        for g, members in (("s0", [i for i in range(100) if i % 3 == 0]),):
            ref = sorted(members, key=lambda i: (_md5(str(i)), i))[:7]
            got = sorted(by_g[g], key=lambda r: r["rk"])
            assert [r["k"] for r in got] == ref


class TestBoilerplate:
    def test_known_shared_chunk(self, spark):
        boiler = "one two three four"
        rows = [
            (0, f"{boiler} aaa bbb"),
            (1, f"{boiler} ccc ddd"),
            (2, "totally unique text here"),
            (3, boiler),                       # entirely boilerplate
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               CP.boilerplate_strip(df, chunk_tokens=4, min_df=2).collect()}
        assert (out[0]["n_chunks"], out[0]["n_removed"]) == (2, 1)
        assert out[0]["clean_md5"] == _md5("aaa bbb")
        assert out[0]["clean_ntok"] == 2
        assert out[2]["n_removed"] == 0
        assert out[2]["clean_md5"] == _md5(rows[2][1])
        assert (out[3]["n_removed"], out[3]["clean_ntok"]) == (1, 0)
        assert out[3]["clean_md5"] == _md5("")

    def test_order_preserved_across_kept_chunks(self, spark):
        boiler = "x x x x"
        text = f"a1 a2 a3 a4 {boiler} b1 b2 b3 b4"
        rows = [(0, text), (1, f"{boiler} solo"), (2, f"pad pad pad pad {boiler}")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               CP.boilerplate_strip(df, chunk_tokens=4, min_df=2).collect()}
        assert out[0]["clean_md5"] == _md5("a1 a2 a3 a4 b1 b2 b3 b4")
        assert out[0]["n_removed"] == 1


class TestPlanShape:
    def test_sampling_is_shuffle_free(self, spark):
        df = spark.range(0, 100).withColumnRenamed("id", "k")
        plan = CP.sample_by_hash(df, "k", "80")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan

    def test_decontaminate_broadcasts_bench(self, spark):
        df = _docs_df(spark)
        bench = df.where(F.col("doc_id") == 0)
        train = df.where(F.col("doc_id") != 0)
        plan = CP.decontaminate(train, bench)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestCanonicalPick:
    def test_keeps_best_quality_per_cluster(self, spark):
        from osm2geojson_spark.operators.dedup import canonical_pick

        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
            "id long, cluster_id long")
        docs = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.9), (7, 0.1), (8, 0.1)],
            "doc_id long, q double")
        out = {r["id"]: r["keep"] for r in
               canonical_pick(clusters, docs, F.col("q")).collect()}
        # cluster 1: ids 2 and 3 tie on quality -> lowest id wins
        assert out == {1: False, 2: True, 3: False, 7: True, 8: False}

    def test_exactly_one_keeper_per_cluster(self, spark):
        from osm2geojson_spark.operators import dedup as DD
        from osm2geojson_spark.functions.text import quality_score_expr

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pairs = DD.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.2)
        clusters = DD.dup_clusters(pairs.select("id_a", "id_b"))
        out = DD.canonical_pick(
            clusters, docs, quality_score_expr(F.col("text"), F.col("n_chars")))
        per = out.groupBy("cluster_id").agg(
            F.sum(F.col("keep").cast("int")).alias("n_keep"))
        assert per.where(F.col("n_keep") != 1).count() == 0


class TestHtmlExtract:
    CASES = [
        ("basic", "<p>hello <b>world</b></p>", "hello world"),
        ("script-trap",
         '<script>var s = "</div>";</script><div>kept</div>', "kept"),
        ("style", "<style>p {color: red}</style><p>txt</p>", "txt"),
        ("comment", "a<!-- <p>gone</p> -->b", "a b"),
        ("decode-after-strip",
         "real &lt;div&gt; literal<div>tag</div>", "real <div> literal tag"),
        ("entities", "a&nbsp;&amp;&nbsp;b &quot;q&apos;", "a & b \"q'"),
        ("case", "<SCRIPT>x</SCRIPT><P>ok</P>", "ok"),
        ("multiline script", "<script>\nline1\nline2\n</script>yes", "yes"),
    ]

    def test_pins(self, spark):
        from osm2geojson_spark.functions.text import html_to_text_expr

        df = spark.createDataFrame(
            [(n, h) for n, h, _ in self.CASES], "name string, html string")
        got = {r["name"]: r["t"] for r in df.select(
            "name", html_to_text_expr(F.col("html")).alias("t")).collect()}
        for name, _, want in self.CASES:
            assert got[name] == want, name

    def test_title(self, spark):
        from osm2geojson_spark.functions.text import html_title_expr

        df = spark.createDataFrame(
            [("<html><head><title>A &amp; B</title></head></html>",),
             ("<p>no title</p>",)], "html string")
        got = [r["t"] for r in
               df.select(html_title_expr(F.col("html")).alias("t")).collect()]
        assert got == ["A & B", ""]


# ------------------------------------------------------- repeated spans
class TestDupSpans:
    def _run(self, spark, docs, **kw):
        from osm2geojson_spark.operators.corpus import dup_spans

        df = spark.createDataFrame(docs, "doc_id long, text string")
        return sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
            for r in dup_spans(df, **kw).collect())

    def test_cross_doc_boilerplate_flags_and_merges(self, spark):
        docs = [
            (1, "alpha beta gamma delta one1 one2 tail"),
            (2, "start words alpha beta gamma delta two1 two2"),
        ]
        # the shared 4-gram 'alpha beta gamma delta' occurs twice; each
        # doc flags exactly one window at its own offset
        got = self._run(spark, docs, n=4, min_df=2)
        assert got == [(1, 0, 3, 1), (2, 2, 5, 1)]

    def test_overlapping_windows_merge_into_one_span(self, spark):
        # 5 shared tokens -> two overlapping shared 4-grams per doc
        docs = [
            (1, "a b c d e xx"),
            (2, "yy a b c d e"),
        ]
        got = self._run(spark, docs, n=4, min_df=2)
        assert got == [(1, 0, 4, 2), (2, 1, 5, 2)]

    def test_within_doc_repetition_counts(self, spark):
        docs = [(1, "p q r s junk1 junk2 p q r s")]
        got = self._run(spark, docs, n=4, min_df=2)
        # two islands: gap 6 > n
        assert got == [(1, 0, 3, 1), (1, 6, 9, 1)]

    def test_adjacent_islands_merge_at_gap_n(self, spark):
        # flagged positions 0 and 4 with n=4: gap == n -> single span
        docs = [
            (1, "a b c d a b c d x"),
            (2, "a b c d zz"),
            (3, "qq a b c d"),
        ]
        got = self._run(spark, docs, n=4, min_df=2)
        assert (1, 0, 7, 2) in got

    def test_max_df_drops_stop_phrases(self, spark):
        docs = [(i, "the same stop phrase here") for i in range(10)]
        got = self._run(spark, docs, n=4, min_df=2, max_df=5)
        assert got == []


# ------------------------------------------------------ LM quality score
class TestLmScore:
    @staticmethod
    def _ref(docs, alpha=0.4):
        toks = {d: t.split() for d, t in docs}
        uni, big, n = {}, {}, 0
        for ts in toks.values():
            for i, w in enumerate(ts):
                uni[w] = uni.get(w, 0) + 1
                n += 1
                if i:
                    big[(ts[i - 1], w)] = big.get((ts[i - 1], w), 0) + 1
        out = {}
        for d, ts in toks.items():
            if not ts:
                continue
            acc = 0.0
            for i, w in enumerate(ts):
                if i == 0:
                    s = float(uni[w]) / float(n)
                elif (ts[i - 1], w) in big:
                    s = float(big[(ts[i - 1], w)]) / float(uni[ts[i - 1]])
                else:
                    s = alpha * (float(uni[w]) / float(n))
                acc += s
            out[d] = (len(ts), acc / float(len(ts)))
        return out

    def test_matches_python_replay_exactly(self, spark):
        from osm2geojson_spark.operators.corpus import lm_score

        docs = [(1, "a b a b"), (2, "a c"), (3, "c b x y x b"),
                (4, "the quick brown fox the quick red fox")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_tokens"], r["lm_score"])
               for r in lm_score(df).collect()}
        assert got == self._ref(docs)  # exact doubles: same fold order

    def test_repetitive_scores_higher_than_random(self, spark):
        from osm2geojson_spark.operators.corpus import lm_score

        docs = [(i, "spam ham spam ham spam ham") for i in range(5)]
        docs += [(100 + i, f"uniq{i}a uniq{i}b uniq{i}c uniq{i}d")
                 for i in range(5)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: r["lm_score"] for r in lm_score(df).collect()}
        assert min(got[i] for i in range(5)) > \
            max(got[100 + i] for i in range(5))


def test_chunk_windows_shapes(spark):
    from osm2geojson_spark.operators.corpus import chunk_windows

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "one two"), (3, ""), (4, "   ")],
        "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_tok"], r["n_tokens"],
         r["chunk_text"])
        for r in chunk_windows(df, window=8, stride=4).collect())
    # doc1: starts 1,5,9 -> lens 8,6,2; doc2: one chunk; 3/4: nothing
    assert got == [
        (1, 0, 1, 8, " ".join(f"t{i}" for i in range(8))),
        (1, 1, 5, 6, " ".join(f"t{i}" for i in range(4, 10))),
        (1, 2, 9, 2, "t8 t9"),
        (2, 0, 1, 2, "one two"),
    ]


def test_chunk_windows_overlap_reconstructs(spark):
    # stride == window/2: every token of every doc appears in >=1 chunk
    # and consecutive chunks share exactly window-stride tokens
    from osm2geojson_spark.operators.corpus import chunk_windows

    text = " ".join(f"w{i:03d}" for i in range(100))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = sorted((r["chunk_idx"], r["chunk_text"].split(" "))
                  for r in chunk_windows(df, window=32, stride=16).collect())
    for (i1, c1), (_i2, c2) in zip(rows, rows[1:]):
        assert c1[16:] == c2[:len(c1) - 16]
    seen = {t for _i, c in rows for t in c}
    assert len(seen) == 100


def test_chunk_windows_validates_args(spark):
    import pytest as _pt
    from osm2geojson_spark.operators.corpus import chunk_windows

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pt.raises(ValueError, match="window and stride"):
        chunk_windows(df, window=0, stride=4)


def test_compression_ratio_signal(spark):
    from osm2geojson_spark.operators.corpus import compression_ratio

    docs = spark.createDataFrame(
        [(1, "spam " * 200),                      # highly repetitive
         (2, "the quick brown fox jumps over the lazy dog " * 5),
         (3, ""),                                 # empty -> ratio 1.0
         (4, "".join(__import__("hashlib").md5(str(i).encode())
                     .hexdigest() for i in range(64)))],  # aperiodic junk
        "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    import zlib
    assert got[1].zlib_len == len(zlib.compress(b"spam " * 200, 6))
    assert got[1].compress_ratio < 0.05          # repetition collapses
    assert got[3].raw_len == 0 and got[3].compress_ratio == 1.0
    assert got[4].compress_ratio > got[2].compress_ratio  # junk > prose


def test_copurchase_pairs_match_bruteforce(spark):
    from itertools import combinations

    from osm2geojson_spark import queries as Q

    got = {(r.part_a, r.part_b): r.n_orders
           for r in Q.q_copurchase(spark, "/root/testdata/sf0.001")
           .collect()}
    li = (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct().collect())
    baskets = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter
    want = Counter()
    for parts in baskets.values():
        want.update(combinations(sorted(parts), 2))
    top = dict(sorted(want.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:500])
    assert got == top


def test_line_dedup_keeps_first_occurrence(spark):
    from osm2geojson_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(
        [(1, "common\nunique one\nfooter"),
         (2, "common\nunique two\nfooter"),
         (3, "common\nfooter")],                 # nothing unique
        "doc_id long, text string")
    got = {r.id: (r.n_lines, r.n_kept, r.text)
           for r in line_dedup(docs).collect()}
    assert got[1] == (3, 3, "common\nunique one\nfooter")
    assert got[2] == (3, 1, "unique two")
    assert got[3] == (2, 0, "")


def test_line_dedup_normalizes_whitespace(spark):
    from osm2geojson_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(
        [(1, "  promo  \nalpha"), (2, "promo\nbeta")],
        "doc_id long, text string")
    got = {r.id: r.n_kept for r in line_dedup(docs).collect()}
    # trimmed hash: '  promo  ' and 'promo' collide; doc 1 wins
    assert got == {1: 2, 2: 1}
