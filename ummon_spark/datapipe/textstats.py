"""Text analysis: language ID, quality scoring, token counting,
document fingerprinting — the per-document filters of a training-data
pipeline. All built-in column expressions (whole-stage codegen; no
Python in the hot path); ratios exposed as integer (num, den) pairs so
oracle comparison is float-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "un", "une", "est", "des"),
    "es": ("el", "la", "los", "y", "un", "una", "es", "de"),
}
LANGS = tuple(sorted(STOPWORDS))  # deterministic tie-break order


def _tokens():
    return F.split(F.col("text"), " ")


def language_id(documents: DataFrame) -> DataFrame:
    """(doc_id, predicted_lang, best_hits, n_tokens): argmax of
    stopword hits per language; ties break to the alphabetically first
    language. One narrow projection — no shuffle."""
    toks = _tokens()
    hit_cols = []
    for lang in LANGS:
        words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.array_intersect(toks, words))
        hit_cols.append(hits.alias(f"hits_{lang}"))
    d = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        *hit_cols,
    )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANGS])
    pred = F.lit(None).cast("string")
    for lang in reversed(LANGS):  # first lang wins ties
        pred = F.when(F.col(f"hits_{lang}") == best, F.lit(lang)).otherwise(pred)
    return d.select(
        "doc_id",
        pred.alias("predicted_lang"),
        best.cast("bigint").alias("best_hits"),
        "n_tokens",
    )


def quality_stats(documents: DataFrame) -> DataFrame:
    """Per-doc quality features: token/char counts, distinct tokens,
    longest token, stopword hits (all langs) — the inputs of a
    length/stopword-ratio quality filter."""
    toks = _tokens()
    all_stop = F.array(
        *[F.lit(w) for lang in LANGS for w in STOPWORDS[lang]]
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.array_max(F.transform(toks, lambda t: F.length(t)))
        .cast("bigint")
        .alias("max_token_len"),
        F.size(F.array_intersect(F.array_distinct(toks), all_stop))
        .cast("bigint")
        .alias("distinct_stopword_hits"),
    )


def token_counts_by_lang(documents: DataFrame) -> DataFrame:
    """Corpus-level token accounting per declared language."""
    toks = _tokens()
    return (
        documents.select(F.col("lang"), F.size(toks).cast("bigint").alias("n"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.max("n").alias("max_tokens"),
        )
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): md5 over the sorted distinct token set —
    an order-insensitive content fingerprint (bag-of-words identity),
    robust to token reordering unlike the exact hash."""
    toks = _tokens()
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(canon).alias("fingerprint"),
    )
