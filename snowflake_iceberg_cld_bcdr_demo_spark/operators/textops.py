"""Document-level text-analysis operators (token counting, quality
scoring, language ID, fingerprinting) — built-in functions only, so the
whole pipeline is one narrow codegen stage over the corpus scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    DIGIT_CLASS,
    PUNCT_CLASS,
    char_class_count,
    fingerprint,
    predicted_lang,
    token_count,
)


def token_counts(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality score from length / punctuation / digit ratios
    (clamped linear model; deterministic, portable to the SQL oracle)."""
    n_tokens = token_count(F.col("text"))
    n_chars = F.length("text")
    # No double rounding anywhere: ratios are int/int → one IEEE division,
    # and the score is the same left-associated double expression the SQL
    # oracle evaluates, so results are bit-identical across engines
    # (functions.numeric module docstring).
    punct_ratio = char_class_count(F.col("text"), PUNCT_CLASS) / F.expr("nullif(length(text), 0)")
    digit_ratio = char_class_count(F.col("text"), DIGIT_CLASS) / F.expr("nullif(length(text), 0)")
    score = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            F.lit(0.5)
            + F.least(n_tokens, F.lit(100)) * 0.005
            - punct_ratio * 2
            - digit_ratio * 2,
        ),
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_calc"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality_score"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Lexicon-based language ID + agreement flag vs the labeled column."""
    pred = predicted_lang(F.col("text"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        F.when(pred == F.col("lang"), 1).otherwise(0).cast("int").alias("agrees"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))
