"""Text-analysis functions for the webtext payload — JVM-side column
expressions wherever possible (whole-stage codegen; UDFs only where hashing
must be numpy-vectorized).

These are first-class graft operators (training-data pipeline needs):
language-ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (normalized token hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal stopword profiles for the fixture languages (top function words).
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "que", "por"],
    "ru": ["i", "v", "ne", "na", "chto", "eto", "s", "po", "kak", "iz"],
    "zh": ["de", "le", "shi", "zai", "you", "he", "wo", "ta", "zhe", "bu"],
}

# A BPE-ish word/number/punctuation splitter (GPT-2-style classes, simplified).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens (empty strings filtered)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_token_count_col(text: Column) -> Column:
    """Count of BPE-ish regex tokens — pure regexp, JVM-side."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio_col(text: Column) -> Column:
    """punctuation chars / total non-space chars (0 for empty)."""
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(nonspace > 0, punct / nonspace).otherwise(F.lit(0.0))


def stopword_ratio_col(text: Column, lang: str = "en") -> Column:
    toks = tokens_col(F.lower(text))
    hits = F.size(F.array_intersect(F.array_distinct(toks),
                                    F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
    return F.when(F.size(toks) > 0, hits / F.lit(float(len(STOPWORDS[lang])))).otherwise(F.lit(0.0))


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + punctuation sanity +
    mean-word-length band. Deterministic closed-form (oracle-friendly)."""
    toks = tokens_col(text)
    n = F.size(toks)
    mean_len = F.when(n > 0, F.length(F.concat_ws("", toks)) / n).otherwise(F.lit(0.0))
    len_term = F.least(n / F.lit(64.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio_col(text) * 4, F.lit(1.0))
    word_term = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_term + punct_term + word_term) / 3


def langid_col(text: Column) -> Column:
    """Heuristic language-ID: distinct-token hit count against each stopword
    profile, highest wins (ties -> lexicographically first lang). Pure column
    algebra: array of (hits, lang) structs -> array_max."""
    toks = F.array_distinct(tokens_col(F.lower(text)))
    entries = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
            # negate lexical order so max prefers 'de' over 'en' only on more hits:
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(STOPWORDS.items(), reverse=True)
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint_col(text: Column) -> Column:
    """Canonical document fingerprint: xxhash64 of the sorted distinct
    lowercase token set — n-gram-order-insensitive dedup key (the
    'fingerprinting' step of near-dup pipelines)."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_col(F.lower(text)))))
    return F.xxhash64(canon)
