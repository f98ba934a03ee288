"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in Spark SQL functions (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Each operator has a DuckDB-dual
formulation used by the oracle queries in relational/pipeline_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(text: Column) -> Column:
    """Whitespace token count (split on runs of whitespace after trim)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def char_class_count(text: Column, char_class: str) -> Column:
    """Number of characters matching a regex class, via global removal of
    the complement — dialect-portable (no regexp_count in DuckDB 1.0)."""
    return F.length(F.regexp_replace(text, f"[^{char_class}]", ""))


def substring_occurrences(text: Column, needle: str) -> Column:
    """Non-regex substring occurrence count via length arithmetic."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


# stopword markers per language for the n-gram/stopword lang-id heuristic.
# Deliberately tiny and deterministic; quality is data-dependent, the
# operator contract is the scoring rule itself.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " una "],
    "fr": [" le ", " les ", " des "],
    "zh": ["的", "是", "了"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-occurrence scores over a padded lowercase text."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(
            (substring_occurrences(padded, m) for m in markers), F.lit(0)
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """Argmax language by marker score; ties break in LANG_MARKERS order;
    all-zero scores -> 'unknown'."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / alpha-ratio / token quality features —
    the heuristic-quality-score family for corpus filtering."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_alpha = char_class_count(t, "a-zA-Z")
    n_punct = char_class_count(t, "!?.,;:")
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        F.round(n_alpha / n_chars, 4).alias("q_alpha_ratio"),
        n_punct.alias("q_n_punct"),
        F.round(n_chars / n_tokens, 4).alias("q_avg_token_len"),
    )


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 of lowercased, trimmed text."""
    return F.md5(F.lower(F.trim(text)))
