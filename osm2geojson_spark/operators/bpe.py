"""Distributed BPE tokenizer training (Sennrich-style byte-pair
encoding over word frequencies).

The scale trick that makes BPE feasible at 100 TB: the corpus collapses
to a WORD-FREQUENCY table first (one shuffle over the corpus — the only
corpus-sized operation), and every merge iteration then runs on that
vocabulary-sized table (10^5..10^7 rows, not 10^11 documents). Per
round:

  explode adjacent symbol pairs (weighted by word freq)
  → groupBy pair, sum freq (map-side partial combine)
  → TakeOrdered(1) — the driver sees ONE (left, right, freq) row

so driver traffic is O(merges), never O(rows) — the same discipline as
``dup_clusters``/``knn_join``. The in-word merge itself is a pure
column expression (``F.aggregate`` carry-scan, JVM-side — no Python in
the loop), and the evolving words table is ``localCheckpoint``-ed every
few rounds to truncate lineage (the dup_clusters pattern).

Greedy left-to-right non-overlapping merge semantics ("aaaa" + merge
(a,a) → "aa","aa") match the reference BPE implementation in
``pyref.ref_bpe_merges`` (pure Python, value-exact oracle twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_freq_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus → (word, freq): lowercase alnum tokens, one shuffle.
    This is the ONLY corpus-sized stage of BPE training."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """chars, with the end-of-word marker fused onto the last char —
    the classic Sennrich initialization."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    n = F.size(chars)

    def mark(c: Column, i: Column) -> Column:
        return F.when(i == n - 1, F.concat(c, F.lit(END_OF_WORD))).otherwise(c)

    return F.zip_with(chars, F.sequence(F.lit(0), n - 1), mark)


def _merge_expr(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) via a
    carry-scan: the accumulator holds (out, carry); carry==left followed
    by right emits the fused token and clears the carry."""
    a, b, ab = F.lit(left), F.lit(right), F.lit(left + right)

    def step(acc: Column, s: Column) -> Column:
        fused = F.struct(
            F.concat(acc["out"], F.array(ab)).alias("out"),
            F.lit(None).cast("string").alias("carry"),
        )
        shifted = F.struct(
            F.when(acc["carry"].isNull(), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["carry"])))
            .alias("out"),
            s.alias("carry"),
        )
        return F.when((acc["carry"] == a) & (s == b), fused).otherwise(shifted)

    def fin(acc: Column) -> Column:
        return F.when(acc["carry"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["carry"]))
        )

    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )
    return F.aggregate(symbols, zero, step, fin)


def train_bpe(
    df: DataFrame,
    num_merges: int = 30,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns a
    DataFrame (rank, left, right, pair_freq) in merge order. Ties on
    pair frequency break lexicographically on (left, right) so the
    result is deterministic and engine-independent."""
    spark = df.sparkSession
    words = (
        word_freq_table(df, text_col)
        .select(_initial_symbols(F.col("word")).alias("syms"), "freq")
        .localCheckpoint()
    )

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pair = F.struct(
            F.col("s").alias("left"),
            F.element_at("syms", F.col("i") + 2).alias("right"),
        )
        pairs = (
            words.where(F.size("syms") >= 2)
            .select(
                F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias(
                    "i", "s"
                ),
                "syms",
                "freq",
            )
            .select(pair.alias("p"), "freq")
            .groupBy("p")
            .agg(F.sum("freq").alias("pf"))
            .orderBy(F.desc("pf"), F.col("p.left"), F.col("p.right"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        row = pairs[0]
        left, right, pf = row["p"]["left"], row["p"]["right"], int(row["pf"])
        merges.append((rank, left, right, pf))
        words = words.select(
            _merge_expr(F.col("syms"), left, right).alias("syms"), "freq"
        )
        if (rank + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()

    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_freq long"
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge list: per word, replay
    the merges in rank order (each one a pure column carry-scan — the
    whole encode is JVM codegen, no Python). Returns (id, n_words,
    n_bpe_tokens)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    out = df.select(F.col(id_col), F.explode(toks).alias("word"))
    syms = _initial_symbols(F.col("word"))
    for left, right in merges:
        syms = _merge_expr(syms, left, right)
    return (
        out.select(F.col(id_col), F.size(syms).alias("n"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n").cast("long").alias("n_bpe_tokens"),
        )
    )
