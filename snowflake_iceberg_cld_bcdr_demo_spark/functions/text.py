"""Text-analysis column builders for the documents pipeline.

Everything here is a composition of built-in ``pyspark.sql.functions`` —
JVM-side, whole-stage-codegen friendly, zero Python-worker round trips.
At 100 TB these run as narrow map stages fused into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"
#: GPT-2-style pre-tokenizer shape: contraction suffixes, space-prefixed
#: letter runs, digit runs, punctuation runs, residual whitespace.  Uses
#: only constructs with identical semantics in Java regex (Spark) and RE2
#: (DuckDB oracle): ordered alternation, basic classes.
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
PUNCT_CLASS = "[.,!?;:]"
DIGIT_CLASS = "[0-9]"

#: Tiny per-language stopword vocabularies for the n-gram/lexicon
#: language-ID heuristic (deterministic, no model dependency).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "fr": ["le", "les", "des", "et", "est", "une"],
    "es": ["el", "los", "las", "y", "es", "una"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens as an array column (shared regex with the oracle)."""
    return F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_piece_count(col: Column) -> Column:
    """Sub-word piece count under the BPE-ish pre-tokenizer — the cheap
    JVM-side proxy for LLM token budgeting over a corpus."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def normalized_text(col: Column) -> Column:
    """Lowercase, whitespace-collapsed, trimmed — dedup canonical form."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic 128-bit document fingerprint (md5 of canonical text)."""
    return F.md5(normalized_text(col))


def char_class_count(col: Column, char_class: str) -> Column:
    """Occurrences of a regex character class, via length delta (cheaper
    than regexp_count and portable to the DuckDB oracle)."""
    return F.length(col) - F.length(F.regexp_replace(col, char_class, ""))


def stopword_hits(col: Column, words: list[str]) -> Column:
    """Count of stopword occurrences (case-insensitive, word-bounded)."""
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(col, F.lit(pat), 0))


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: stopword_hits(col, ws) for lang, ws in LANG_STOPWORDS.items()}


def predicted_lang(col: Column) -> Column:
    """Deterministic arg-max over the language scores (ties resolve in
    en→de→fr→es order; all-zero → 'und')."""
    s = lang_scores(col)
    return (
        F.when(s["en"] + s["de"] + s["fr"] + s["es"] == 0, "und")
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )
