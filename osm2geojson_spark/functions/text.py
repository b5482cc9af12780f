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
