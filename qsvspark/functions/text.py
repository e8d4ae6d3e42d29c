"""Text analysis over document tables: token counting, quality scoring,
language ID, fingerprinting. Everything is a native Column expression —
per-document Python here would be the classic 100-TB mistake; these all
run inside whole-stage codegen and scale with executors."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish segmentation: letter runs, digit runs, single non-space symbols.
# (portable subset — same semantics in Java regex and DuckDB's RE2)
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _ws_tokens(col: Column) -> Column:
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def add_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_ws_tokens": F.size(_ws_tokens(c)),
            "n_bpe_tokens": F.size(F.regexp_extract_all(c, F.lit(BPE_RE), F.lit(0))),
        }
    )


# tiny per-language stopword lists for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "no", "es", "por", "con", "para"],
}


def add_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: count stopword hits per language over the
    lowercased word set; argmax wins (ties break in en>de>fr>es order).
    array_intersect on a ~10-word literal array is a codegen'd set probe."""
    words = F.array_distinct(_ws_tokens(F.lower(F.col(text_col))))
    scores = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in _LANG_STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    for lang in reversed(list(_LANG_STOPWORDS)):  # earlier langs win ties
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return df.withColumn(out_col, expr)


def add_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio,
    mean word length, and a composite score in [0,1]."""
    c = F.col(text_col)
    n_chars = F.length(c)
    words = _ws_tokens(c)
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0)))
    sw = F.array(*[F.lit(w) for w in _LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(_ws_tokens(F.lower(c))), sw))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_words > 0, (n_chars - (n_words - 1)) / n_words).otherwise(F.lit(0.0))
    # composite: long enough, not punctuation soup, some stopwords
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.3
        + F.least(n_stop / F.lit(5.0), F.lit(1.0)) * 0.3
    )
    return df.withColumns(
        {
            "q_n_words": n_words,
            "q_punct_ratio": F.round(punct_ratio, 6),
            "q_stopword_hits": n_stop,
            "q_mean_word_len": F.round(mean_wlen, 6),
            "q_score": F.round(score, 6),
        }
    )


def add_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercased text (md5 renders identically in Spark and DuckDB, so the
    oracle can verify it byte-for-byte)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.md5(norm))
