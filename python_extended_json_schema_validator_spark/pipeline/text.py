"""Text-analysis operators for a large-scale training-data pipeline:
language ID, quality scoring, token counting, document fingerprinting.

All pure Column algebra (regexp/length/hash built-ins) — zero UDFs, so
every operator stays in WholeStageCodegen and runs at scan speed; each
is deliberately expressible in ANSI SQL so the DuckDB oracle can
replicate it bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword
# language heuristic (the classic fastText-free fallback)
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "und", "die"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/NULL-safe trim)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punct boundaries (a cheap BPE-granularity proxy —
    counts runs of letters, runs of digits, and punctuation marks)."""
    return F.size(
        F.filter(
            F.split(text, r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
            lambda x: F.trim(x) != "",
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features per document: length, token count,
    mean token length, alpha ratio, punctuation ratio, stopword hits,
    uppercase ratio — the usual pretraining quality filters."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    stop_hits = sum(
        (F.regexp_count(F.lower(t), F.lit(rf"\b{w}\b")) for w in LANG_MARKERS["en"]),
        F.lit(0),
    )
    return df.withColumns(
        {
            "n_chars_m": n_chars,
            "n_tokens": n_tokens,
            "mean_token_len": F.when(n_tokens > 0, n_chars / n_tokens).otherwise(
                F.lit(None)
            ),
            "alpha_ratio": F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(None)),
            "punct_ratio": F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(None)),
            "upper_ratio": F.when(n_chars > 0, upper / n_chars).otherwise(F.lit(None)),
            "en_stop_hits": stop_hits,
        }
    )


def lang_scores(text: Column) -> dict:
    """Per-language stopword-hit counts."""
    lt = F.lower(text)
    return {
        lang: sum(
            (F.regexp_count(lt, F.lit(rf"\b{w}\b")) for w in words), F.lit(0)
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Argmax language over the marker sets; ties break by language
    code order (deterministic); no hits at all → 'und'."""
    scores = lang_scores(F.col(text_col))
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate in reverse-sorted order so earlier codes win ties via >
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        # >= lets the later (alphabetically earlier) candidate take ties
        best_lang = F.when(s >= best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(s >= best_score, s).otherwise(best_score)
    return df.withColumn(out_col, F.when(best_score > 0, best_lang).otherwise(F.lit("und")))


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, whitespace collapsed, trimmed) — the exact-dedup key."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.md5(norm.cast("binary")))
