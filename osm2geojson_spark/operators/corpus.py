"""Corpus-hygiene operators for the training-data pipeline: benchmark
decontamination, PII redaction, consistent (hash-order) sampling, and
boilerplate-chunk stripping.

These are the standard pre-training curation passes (C4/Gopher/Dolma
lineage) the brief asks for beyond the reference's own operator set
(the reference — osm2geojson — has no text layer at all; semantic anchor
is only its quarantine discipline, OsmJoin.java:176-179: suspect rows
are routed aside, never silently dropped).

Scale design (100 TB):

- ``decontaminate``: the benchmark side is an eval suite — thousands of
  documents, not billions — so its distinct n-gram set is aggregated
  once and **broadcast**; the corpus side never shuffles (scan → explode
  → broadcast-hash-join → partial agg). One shuffle total (the per-doc
  rollup), no skew surface (gram keys only travel map-side).
- ``pii_redact``: pure column expressions (regexp_count/regexp_replace,
  JVM codegen) — zero shuffles, zero Python.
- ``sample_by_hash``: consistent sampling by md5(key) *string order* —
  a shuffle-free filter; every executor decides membership locally, and
  re-runs/late-arriving partitions make identical decisions (the
  property that matters for resumable 100 TB jobs; row-count-based
  sampling is not re-run-stable).
- ``stratified_sample``: exact-k-per-stratum via hash-order row_number —
  ONE shuffle on the stratum key; deterministic, so retries are stable.
- ``boilerplate_strip``: document-frequency over aligned token chunks —
  the CCNet/C4 repeated-line filter re-expressed for space-joined text.
  Two shuffles (chunk-df rollup + per-doc regroup); hot chunks (the
  boilerplate itself) are exactly the rows the df-aggregate combines
  map-side, so the skewed key collapses before it travels.

Every operator has a value-exact ANSI-SQL twin in
``osm2geojson_spark.queries`` (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.functions.text import token_count_expr, tokens_expr

# --------------------------------------------------------------- n-grams


def word_ngrams_expr(toks: Column, n: int) -> Column:
    """Space-joined word n-grams over an ALREADY-MATERIALIZED token
    array (order preserved). Callers must project ``tokens_expr(text)``
    into its own column first: referencing the split inside the per-gram
    lambda would re-run the regex split once per gram — O(L²) character
    work per document (measured 3× the whole operator's cost before the
    fix). Documents shorter than ``n`` tokens yield an empty array
    (guard: ``F.sequence`` auto-reverses when stop < start, which would
    emit phantom negative offsets)."""

    def gram(i: Column) -> Column:
        return F.array_join(F.slice(toks, i + 1, n), " ")

    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n), gram),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per corpus document, how many of its
    word ``n``-grams (counted with multiplicity) appear anywhere in the
    benchmark/eval set ``bench`` (same text schema). Returns one row per
    corpus doc: (id, n_ngrams, n_hits, contaminated).

    The bench n-gram set is deduplicated then broadcast — the corpus
    side joins map-side and never shuffles on the gram key."""
    bench_grams = (
        bench.select(tokens_expr(F.col(text_col)).alias("_toks"))
        .select(F.explode(word_ngrams_expr(F.col("_toks"), n)).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    grams = df.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode_outer(word_ngrams_expr(F.col("_toks"), n)).alias("g"),
    )
    joined = grams.join(F.broadcast(bench_grams), "g", "left")
    return joined.groupBy(id_col).agg(
        F.sum(F.when(F.col("g").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_ngrams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.sum("_hit"), F.lit(0)) > 0).alias("contaminated"),
    )


# ------------------------------------------------------------- PII scrub

# deliberately simple, RE2-compatible patterns (no lookaround) so the
# DuckDB twin uses the byte-identical regex; both engines scan
# left-to-right non-overlapping
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
PII_TOKEN = "<PII>"


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Count and redact emails / NANP phone numbers / IPv4 addresses.
    Counts are taken on the ORIGINAL text (so they are independent of
    redaction order); redaction replaces email → phone → IP in sequence
    with ``<PII>`` (which matches none of the patterns, so the chain is
    idempotent). Pure codegen expressions — no shuffle, no Python."""
    t = F.col(text_col)
    red = t
    for pat in (PII_EMAIL_RE, PII_PHONE_RE, PII_IP_RE):
        red = F.regexp_replace(red, pat, PII_TOKEN)
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_count(t, F.lit(PII_IP_RE)).cast("int").alias("n_ips"),
        red.alias("redacted"),
    )


# ------------------------------------------------------------- sampling


def hash_bucket_expr(key: Column) -> Column:
    """The consistent-sampling sort key: lowercase-hex md5 of the key
    rendered as a string. Identical in Spark and DuckDB (and any other
    engine with md5), so sampling decisions survive engine swaps,
    re-runs, and partition retries — unlike ``rand()`` or row-position
    sampling."""
    return F.md5(key.cast("string"))


def sample_by_hash(
    df: DataFrame, key_col: str, threshold_hex: str
) -> DataFrame:
    """Keep rows whose md5(key) sorts below ``threshold_hex`` (a hex
    prefix: '40' ≈ 25 %, '80' ≈ 50 %). Shuffle-free — a pure filter each
    executor evaluates locally."""
    return df.where(hash_bucket_expr(F.col(key_col)) < threshold_hex)


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, k: int
) -> DataFrame:
    """Exactly ``k`` rows per stratum (fewer if the stratum is smaller),
    chosen by hash order — a deterministic uniform-without-replacement
    sample. One shuffle (on the stratum key); ties broken by the key
    itself so the result is total-ordered."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(hash_bucket_expr(F.col(key_col)), F.col(key_col))
    )
    return (
        df.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
    )


# ----------------------------------------------------- boilerplate strip


def chunk_texts_expr(toks: Column, chunk_tokens: int) -> Column:
    """Non-overlapping aligned chunks of ``chunk_tokens`` whitespace
    tokens (last chunk may be shorter), space-joined. Takes a
    materialized token array (same O(L²) re-split hazard as
    ``word_ngrams_expr``). The unit of the repeated-boilerplate
    filter."""

    def chunk(i: Column) -> Column:
        return F.array_join(F.slice(toks, i, chunk_tokens), " ")

    return F.when(
        F.size(toks) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.size(toks), F.lit(chunk_tokens)), chunk
        ),
    ).otherwise(F.array().cast("array<string>"))


def chunk_windows(
    df: DataFrame,
    window: int = 32,
    stride: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token windows — the packing step before embedding /
    LM training (stride < window keeps context across chunk borders).
    Window starts are ``1, 1+stride, 1+2·stride, …`` while ≤ the token
    count; each chunk is the next ``window`` tokens (trailing chunks
    run shorter — kept, documented policy). Empty documents emit
    nothing.

    Plan shape: tokens materialized ONCE per doc (the O(L²) HOF
    re-split hazard), one generator (posexplode over an int sequence —
    no data duplication until the final slice), everything codegen.
    Scale: output is ``n/stride`` rows per doc — a pure map-side
    explode, no shuffle at all; downstream groupBys see well-spread
    (doc, chunk) keys.

    Returns ``(id_col, chunk_idx, start_tok, n_tokens, chunk_text)``."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    toks = (df.select(F.col(id_col),
                      tokens_expr(F.col(text_col)).alias("toks"))
            .where(F.size("toks") > 0))
    starts = toks.select(
        id_col, "toks",
        F.posexplode(
            F.sequence(F.lit(1), F.size("toks"), F.lit(stride))
        ).alias("chunk_idx", "start_tok"))
    piece = F.slice(F.col("toks"), F.col("start_tok"), window)
    return starts.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))


def boilerplate_strip(
    df: DataFrame,
    chunk_tokens: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove aligned token chunks that occur in ≥ ``min_df`` distinct
    documents (the C4 repeated-boilerplate rule over space-joined text).
    Returns (id, n_chunks, n_removed, clean_ntok, clean_md5).

    Plan: explode chunks once → df-aggregate on chunk text (map-side
    partial combine absorbs the hot boilerplate keys) → join the flag
    back → per-doc regroup reassembling kept chunks in order via
    sort_array(collect_list(struct(idx, ...))) — the same order-carrying
    idiom as way assembly (SURVEY J2)."""
    chunks = df.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.posexplode(chunk_texts_expr(F.col("_toks"), chunk_tokens)).alias(
            "idx", "ch"
        ),
    )
    cdf = chunks.groupBy("ch").agg(
        F.countDistinct(id_col).alias("_df")
    )
    flagged = chunks.join(cdf, "ch").withColumn(
        "keep", F.col("_df") < min_df
    )
    clean = F.array_join(
        F.transform(
            F.filter(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx"), F.col("keep"),
                                            F.col("ch")))
                ),
                lambda x: x["keep"],
            ),
            lambda x: x["ch"],
        ),
        " ",
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0))
        .cast("long").alias("n_removed"),
        token_count_expr(clean).cast("long").alias("clean_ntok"),
        F.md5(clean).alias("clean_md5"),
    )


# ------------------------------------------------------- repeated spans
def dup_spans(
    df: DataFrame,
    n: int = 4,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Exact repeated-n-gram span detection (the substring-dedup shape
    of Lee et al. 2022): flag every token position whose word n-gram
    occurs ≥ ``min_df`` times in the corpus (multiplicity counted, so
    within-document repetition qualifies too), then merge overlapping
    and adjacent flagged windows into MAXIMAL spans per document.
    Returns ``(doc_id, span_start, span_end, n_windows)`` with
    inclusive 0-based token indices — the pieces a dedup pass would cut
    out, or a quality filter would score.

    Scale shape: gram-count aggregate (one shuffle; hot grams — the
    boilerplate being hunted — combine map-side), positions⋈flagged-
    grams equi-join, one per-doc window pass (third shuffle). The gram
    JOIN key is the gram string for oracle exactness; at 100 TB the
    join key should be ``xxhash64(gram)`` (8 bytes instead of the
    string — same plan, collision odds ~n²/2^64). ``max_df`` optionally
    drops stop-phrase grams (df caps are the standard skew guard, as in
    ``ngram_jaccard``)."""
    grams = (
        df.select(F.col(id_col), tokens_expr(F.col(text_col)).alias("_t"))
        .select(
            F.col(id_col),
            F.posexplode(word_ngrams_expr(F.col("_t"), n))
            .alias("pos", "g"))
        .select(F.col(id_col), F.col("pos").cast("long").alias("pos"), "g")
    )
    flagged_grams = grams.groupBy("g").agg(
        F.count(F.lit(1)).alias("_df"))
    cond = F.col("_df") >= min_df
    if max_df is not None:
        cond = cond & (F.col("_df") <= max_df)
    flagged = grams.join(
        flagged_grams.where(cond).select("g"), "g").select(id_col, "pos")

    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) <= F.lit(int(n)), F.lit(0)
    ).otherwise(F.lit(1))
    islands = (
        flagged.withColumn("_brk", brk)
        .withColumn("_island", F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(int(n) - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"))
        .drop("_island")
    )


# ------------------------------------------------------ LM quality score
def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Corpus-LM quality scoring: mean per-token bigram Stupid Backoff
    probability (Brants et al. 2007) under the corpus's OWN counts —
    the model-based quality filter of the CCNet/Gopher pipelines, with
    the LM trained and applied in the same two aggregates. Scores are
    RATIO-BASED, not log-prob (ln is not correctly-rounded libm, the
    same cross-engine trap as trig — see queries.py rules): each token
    contributes ``c(w_{i-1} w_i) / c(w_{i-1})``, backing off to
    ``alpha * c(w_i) / N``; position 0 scores ``c(w_0) / N``. All
    divisions are IEEE ops on exact integer counts and the per-doc mean
    is an ORDERED left fold, so the doubles are bit-deterministic.

    Returns ``(doc_id, n_tokens, lm_score)``.

    Scale shape: two count aggregates (map-side combinable — the hot
    Zipfian keys collapse before they travel), two equi-joins of the
    position stream against the count tables (AQE skew-join handles
    the stopword keys), one per-doc regroup for the ordered fold. The
    count tables are vocabulary-sized, not corpus-sized — broadcastable
    for real-world vocabularies."""
    toks = df.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("_t"))
    pos = (
        toks.where(F.size("_t") >= 1)
        .select(F.col(id_col),
                F.posexplode("_t").alias("pos", "w"))
        .withColumn("pos", F.col("pos").cast("long"))
    )
    prevd = pos.select(
        F.col(id_col), (F.col("pos") + 1).alias("pos"),
        F.col("w").alias("wprev"))
    bigrams = pos.join(prevd, [id_col, "pos"], "left")

    uni = pos.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    big = (bigrams.where(F.col("wprev").isNotNull())
           .groupBy("wprev", "w").agg(F.count(F.lit(1)).alias("c2")))
    n_total = pos.select(
        F.count(F.lit(1)).alias("n_corpus"))

    scored = (
        bigrams
        .join(uni, "w")  # c1(w) — every corpus token has a count
        .join(uni.select(F.col("w").alias("wprev"),
                         F.col("c1").alias("c1prev")), "wprev", "left")
        .join(big, ["wprev", "w"], "left")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "s",
            F.when(F.col("wprev").isNull(),
                   F.col("c1").cast("double")
                   / F.col("n_corpus").cast("double"))
            .when(F.col("c2").isNotNull(),
                  F.col("c2").cast("double")
                  / F.col("c1prev").cast("double"))
            .otherwise(F.lit(float(alpha))
                       * (F.col("c1").cast("double")
                          / F.col("n_corpus").cast("double"))))
    )
    return (
        scored.select(F.col(id_col), F.struct("pos", "s").alias("ps"))
        .repartition(id_col)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("ps")).alias("pss"))
        .select(
            F.col(id_col),
            F.size("pss").cast("long").alias("n_tokens"),
            (F.aggregate(
                F.transform("pss", lambda p: p["s"]),
                F.lit(0.0), lambda a, v: a + v)
             / F.size("pss").cast("double")).alias("lm_score"))
    )


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """zlib compression-ratio quality signal (the Gopher/RedPajama
    "compressibility" filter): highly repetitive or boilerplate text
    compresses far below natural prose, random/encrypted junk barely
    compresses at all — both tails get filtered before training.

    Returns ``(id, raw_len, zlib_len, compress_ratio)`` with the ratio
    one IEEE division of exact byte counts (module determinism rules).
    zlib with a FIXED level is bit-deterministic for a given input on
    any zlib build (the oracle twin recomputes the byte counts with the
    same stdlib — a plumbing-identity oracle, like html_extract).

    Scale shape: one Arrow-batched map pass, no shuffle; utf-8 encode +
    deflate are the whole cost and both stream per batch."""
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    lvl = int(level)
    out_schema = (f"{id_col} long, raw_len long, zlib_len long, "
                  "compress_ratio double")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                raw = (getattr(t, text_col) or "").encode("utf-8")
                comp = zlib.compress(raw, lvl)
                rows.append((getattr(t, id_col), len(raw), len(comp),
                             float(len(comp)) / float(len(raw))
                             if raw else 1.0))
            yield pd.DataFrame(rows, columns=[
                id_col, "raw_len", "zlib_len", "compress_ratio"])

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style cross-document LINE dedup: a (normalized) line
    survives only in the FIRST document that contains it (order =
    (doc, position) — deterministic), every later copy is dropped and
    the documents are rebuilt from their surviving lines. The standard
    pre-training pass that strips boilerplate headers/footers/cookie
    banners replicated across a crawl.

    Returns ``(id, n_lines, n_kept, text)`` with ``text`` the kept
    lines re-joined in original order.

    Scale shape: one shuffle on the line-hash key (the dedup window —
    md5 keys are uniform, no skew), one doc-key regroup for the ordered
    rebuild; both map-side-combinable none, but the hash window beats
    the groupBy-collect alternative by carrying only (hash → winner)
    decisions, never line text, through the second stage."""
    from pyspark.sql import Window

    lines = (df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"))
        .withColumn("h", F.md5(F.trim(F.col("line")))))
    w = Window.partitionBy("h").orderBy("id", "pos")
    kept = (lines.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn", "h"))
    rebuilt = (kept.groupBy("id")
               .agg(F.sort_array(F.collect_list(F.struct("pos", "line")))
                    .alias("pl"),
                    F.count(F.lit(1)).cast("long").alias("n_kept")))
    totals = (df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), sep)).cast("long")
        .alias("n_lines")))
    return (totals.join(rebuilt, "id", "left")
            .select(
                "id", "n_lines",
                F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
                F.coalesce(
                    F.array_join(F.transform(
                        "pl", lambda s: s["line"]), sep),
                    F.lit("")).alias("text")))
