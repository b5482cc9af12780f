"""Ranked retrieval over the corpus: BM25 scoring on the same postings
the inverted-index builder produces.

GRAFT extension (no reference analog — the reference's query surface is
key/value lookup only, `SortingMapFilesTest.java`-style); this is the
search-side consumer of the ``inverted_index`` catalog op.

Determinism discipline (queries.py module rules): the classic BM25 uses
``ln`` for idf — libm transcendentals are not correctly rounded and
drift across engines, so this is **ratio-BM25**: the log is replaced by
its (rational) argument, exactly the move ``lm_score`` makes for the
Stupid-Backoff LM. Every factor is a single IEEE division of exact
int64 products, the per-document sum over query terms is an ORDERED
fold (term-sorted), so scores are bit-identical across Spark / DuckDB /
any IEEE-754 engine.

With ``k1 = p1/q1`` and ``b = p2/q2`` the tf-normalization term

    tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/L))

is scaled by ``q1·q2·L`` into a ratio of exact integers:

    num = (p1+q1)·q2 · tf · L
    den = q1·q2·L·tf + p1·(q2−p2)·L + p1·p2·dl·N

and the (+0.5-smoothed Robertson) idf argument becomes
``(2N − 2df + 1) / (2df + 1)``.

int64 headroom note: ``tf·L`` caps the products; at ~1e13 corpus tokens
and tf ~1e4 the 44·tf·L product nears int64 range — at that scale factor
L out of num/den first (one extra rounding, same ranking).

Scale shape: the only corpus-sized work is the token scan; postings for
|Q| query terms are tiny and every subsequent join is doc-keyed (one
shuffle, reused) with corpus stats and per-term df broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.functions.text import tokens_expr

__all__ = ["bm25_topk"]


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: tuple[int, int] = (6, 5),
    b: tuple[int, int] = (3, 4),
    limit: int = 50,
) -> DataFrame:
    """Top-``limit`` documents for a bag-of-terms query under ratio-BM25.

    Returns ``(doc_id, n_hit_terms, score)`` ordered by score descending
    (ties broken by ``doc_id``). ``k1``/``b`` are exact rationals
    ``(num, den)`` — defaults are the textbook 1.2 / 0.75.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    p1, q1 = (int(k1[0]), int(k1[1]))
    p2, q2 = (int(b[0]), int(b[1]))
    if q1 <= 0 or q2 <= 0 or p1 < 0 or p2 < 0 or p2 > q2:
        raise ValueError("k1 must be >= 0 and b in [0, 1], exact rationals")

    toks = (df.select(F.col(id_col),
                      tokens_expr(F.col(text_col)).alias("_t"))
            .where(F.size("_t") >= 1))
    dl = toks.select(F.col(id_col), F.size("_t").cast("long").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                   F.sum("dl").alias("l_total"))

    hits = (toks.select(F.col(id_col), F.explode("_t").alias("w"))
            .where(F.col("w").isin(list(terms))))
    tfs = (hits.groupBy(id_col, "w")
           .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    dfs = tfs.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))

    n = F.col("n_docs")
    l_tot = F.col("l_total")
    idf = ((F.lit(2) * n - F.lit(2) * F.col("df") + F.lit(1)).cast("double")
           / (F.lit(2) * F.col("df") + F.lit(1)).cast("double"))
    num = (F.lit((p1 + q1) * q2) * F.col("tf") * l_tot).cast("double")
    den = (F.lit(q1 * q2) * l_tot * F.col("tf")
           + F.lit(p1 * (q2 - p2)) * l_tot
           + F.lit(p1 * p2) * F.col("dl") * n).cast("double")

    scored = (tfs
              .join(F.broadcast(dfs), "w")
              .join(dl, id_col)
              .crossJoin(F.broadcast(stats))
              .withColumn("s", idf * (num / den)))

    return (scored
            .select(F.col(id_col), F.struct("w", "s").alias("ws"))
            .groupBy(id_col)
            .agg(F.sort_array(F.collect_list("ws")).alias("wss"))
            .select(
                F.col(id_col),
                F.size("wss").cast("long").alias("n_hit_terms"),
                F.aggregate(
                    F.transform("wss", lambda x: x["s"]),
                    F.lit(0.0), lambda a, v: a + v).alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(int(limit)))
