"""Text-analysis operators for the training-data pipeline (driver brief):
language-ID, quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM-side, codegen'd — no Python in the hot
path), each with an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "les", "des", "est"],
}

_WORD_RE = r"[^a-z0-9]+"


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization; empty strings filtered (split artifacts)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def bpe_ish_token_count_expr(text: Column) -> Column:
    """BPE-ish proxy: count alnum runs + non-space punctuation marks."""
    runs = F.size(F.filter(F.split(F.lower(text), _WORD_RE), lambda t: t != ""))
    punct = F.length(F.regexp_replace(text, r"[\sA-Za-z0-9]", ""))
    return runs + punct


def quality_score_expr(text: Column, n_chars: Column) -> Column:
    """Composite quality score in [0,1]: length band + punctuation ratio +
    mean word length band (three equally-weighted signals)."""
    ntok = token_count_expr(text)
    mean_wl = F.when(ntok > 0, n_chars.cast("double") / ntok).otherwise(F.lit(0.0))
    punct_ratio = F.length(F.regexp_replace(text, r"[\sA-Za-z0-9]", "")) / \
        F.greatest(n_chars.cast("double"), F.lit(1.0))
    len_ok = F.when((n_chars >= 100) & (n_chars <= 10_000), 1.0).otherwise(0.0)
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    return (len_ok + wl_ok + punct_ok) / F.lit(3.0)


def lang_id_expr(text: Column) -> Column:
    """Stopword-marker heuristic: language with the highest marker-hit
    count wins; ties and zero-hits → 'und'. Deterministic tie-break by
    language code order."""
    toks = F.filter(F.split(F.lower(text), _WORD_RE), lambda t: t != "")

    def hit(markers):
        # factory, NOT a default-arg lambda (PySpark counts defaults as params)
        return lambda t: t.isin(markers)

    scores = [
        (lang, F.size(F.filter(toks, hit(markers))))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties → apply last
        out = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(out)
    return out


STOPWORDS = sorted({w for ms in LANG_MARKERS.values() for w in ms} |
                   {"a", "an", "in", "on", "for", "with", "by", "at"})


def stopword_ratio_expr(text: Column) -> Column:
    """Fraction of tokens that are stopwords (quality signal from the
    training-data brief); 0.0 for empty docs."""
    toks = F.filter(F.split(F.lower(text), _WORD_RE), lambda t: t != "")
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def fingerprint_expr(text: Column) -> Column:
    """Normalized document fingerprint: lowercase, collapse whitespace,
    md5 → first 16 hex chars as the dedup key (md5 exists in both Spark
    and DuckDB, so the oracle is value-exact)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.substring(F.md5(norm), 1, 16)


# ---------------------------------------------------------- corpus analytics
def token_table(df, id_col: str = "doc_id", text_col: str = "text"):
    """(id, tok) posting rows — the substrate for repetition stats, vocab
    building, and salience. One explode, whole-stage codegen'd; every
    downstream agg gets map-side partial aggregation."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_expr(F.col(text_col))).alias("tok"),
    )


def repetition_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style per-document repetition metrics: token count, distinct
    count, type-token ratio, and the dominant token with its mass share
    (top_ratio near 1 ⇒ degenerate/repetitive doc — a standard
    training-data quality filter). Ratios are int/int double divisions —
    bit-exact against the SQL twin. Ties on the top token break
    lexicographically."""
    from pyspark.sql import Window

    toks = token_table(df, id_col, text_col)
    counts = toks.groupBy("id", "tok").agg(F.count("*").alias("n"))
    tot = counts.groupBy("id").agg(
        F.sum("n").alias("n_tokens"), F.count("*").alias("n_distinct"))
    w = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("tok"))
    top = (counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
           .select("id", F.col("tok").alias("top_tok"), F.col("n").alias("top_n")))
    return (
        tot.join(top, "id")
        .select(
            F.col("id").alias("doc_id"), "n_tokens", "n_distinct",
            (F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double"))
            .alias("distinct_ratio"),
            "top_tok", "top_n",
            (F.col("top_n").cast("double") / F.col("n_tokens").cast("double"))
            .alias("top_ratio"),
        )
    )


def vocab_topk(df, k: int = 50, id_col: str = "doc_id", text_col: str = "text"):
    """Corpus vocabulary build: top-k tokens by term frequency (ties
    lexicographic) with document frequency. The orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-k then driver merge, no
    full sort at 100 TB."""
    toks = token_table(df, id_col, text_col)
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("tf"), F.countDistinct("id").alias("doc_freq"))
        .orderBy(F.desc("tf"), F.asc("tok"))
        .limit(k)
    )


def doc_term_salience(df, top_n: int = 3, id_col: str = "doc_id",
                      text_col: str = "text"):
    """Per-document most-salient terms: rank tokens by tf/df (the TF-IDF
    shape with an exact rational score instead of a log — transcendental
    functions are banned from oracle-compared values). The corpus df table
    is tiny (vocab-sized) → broadcast to the per-doc counts."""
    from pyspark.sql import Window

    toks = token_table(df, id_col, text_col)
    counts = toks.groupBy("id", "tok").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("tok").agg(F.countDistinct("id").alias("doc_freq"))
    scored = counts.join(F.broadcast(dfreq), "tok").select(
        "id", "tok", "tf", "doc_freq",
        (F.col("tf").cast("double") / F.col("doc_freq").cast("double"))
        .alias("salience"),
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("salience"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select(F.col("id").alias("doc_id"), "tok", "tf", "doc_freq",
                "salience", F.col("rn").alias("rank"))
    )


# ----------------------------------------------------- HTML extraction

_HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                  ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def html_title_expr(html: Column) -> Column:
    """<title> text (first match), entity-decoded. Codegen regex."""
    t = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, ch in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return t


def html_to_text_expr(html: Column) -> Column:
    """HTML → visible text: drop <script>/<style> BLOCKS (non-greedy,
    case-insensitive, dotall — a script string containing '</div>' must
    not eat the document), strip remaining tags to spaces, THEN decode
    entities (the order matters: decoding first would turn a literal
    ``&lt;ok&gt;`` into a strippable tag — the classic extractor bug,
    pinned in tests), collapse whitespace. Pure codegen regex chain —
    zero Python, zero shuffle; the DuckDB twin runs the byte-identical
    patterns. Real corpus extraction (trafilatura-class readability) is
    a quality upgrade on top; this is the C4-grade baseline."""
    s = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, r"(?is)<style[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, r"(?is)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def collocations(df, min_count: int = 5, limit: int = 100,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Adjacent-bigram collocation mining ranked by a PMI ratio.

    GRAFT extension (corpus analytics; no reference analog). Classic
    PMI is ``ln(p(ab) / (p(a)·p(b)))`` — per the module determinism
    rules the log is dropped and the RATIO itself ranks (monotone in
    per-pair PMI):

        pmi_ratio = (c_pair · U²) / (T · c_a · c_b)

    with U = total unigram tokens, T = total adjacent bigrams, all
    exact int64 counts and ONE IEEE division — bit-identical across
    engines. (int64 headroom: c_pair·U² caps the numerator; past ~3e9
    corpus tokens compute the two U factors as separate divisions.)

    Scale shape: bigrams come from two shifted ``slice``s zipped
    map-side (no self-join, no posexplode pairing); both count
    aggregates are map-side combinable on Zipf-collapsing keys; the two
    vocabulary-sized unigram tables broadcast onto the pair counts.
    Returns ``(term_a, term_b, c_pair, c_a, c_b, pmi_ratio)`` ordered
    by ratio descending (ties by pair).
    """
    toks = df.select(tokens_expr(F.col(text_col)).alias("_t"))
    uni = (toks.select(F.explode("_t").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c")))
    u_total = uni.agg(F.sum("c").alias("u_tot"))

    n = F.size("_t")
    pairs = (toks.where(n >= 2)
             .select(F.explode(F.zip_with(
                 F.slice("_t", F.lit(1), n - 1),
                 F.slice("_t", F.lit(2), n - 1),
                 lambda a, b: F.struct(a.alias("term_a"),
                                       b.alias("term_b")))).alias("p"))
             .select("p.term_a", "p.term_b"))
    pc = (pairs.groupBy("term_a", "term_b")
          .agg(F.count(F.lit(1)).cast("long").alias("c_pair")))
    t_total = pc.agg(F.sum("c_pair").alias("t_tot"))

    ratio = ((F.col("c_pair") * F.col("u_tot") * F.col("u_tot"))
             .cast("double")
             / (F.col("t_tot") * F.col("c_a") * F.col("c_b"))
             .cast("double"))
    return (pc.where(F.col("c_pair") >= int(min_count))
            .join(F.broadcast(uni.select(F.col("w").alias("term_a"),
                                         F.col("c").alias("c_a"))),
                  "term_a")
            .join(F.broadcast(uni.select(F.col("w").alias("term_b"),
                                         F.col("c").alias("c_b"))),
                  "term_b")
            .crossJoin(F.broadcast(u_total))
            .crossJoin(F.broadcast(t_total))
            .select("term_a", "term_b", "c_pair", "c_a", "c_b",
                    ratio.alias("pmi_ratio"))
            .orderBy(F.col("pmi_ratio").desc(), "term_a", "term_b")
            .limit(int(limit)))
