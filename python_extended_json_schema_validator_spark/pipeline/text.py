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


def _words(text_col: str) -> Column:
    return F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )


def ngram_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document word-n-gram repetition profile — the Gopher-style
    repetition quality signals (Rae et al. 2021, "Scaling Language
    Models", §A1.1: duplicate/top n-gram fractions used to filter
    repetitious web text before pretraining).

    Returns one row per document that has ≥n words:
    ``(id, n_grams, distinct_grams, top_ngram_frac, dup_ngram_frac)``
    where ``top_ngram_frac`` = occurrences of the single most frequent
    n-gram / total n-gram occurrences, and ``dup_ngram_frac`` = total
    occurrences of n-grams appearing more than once / total.

    Scale shape: explode → groupBy(id, gram) → groupBy(id).  Both
    aggregations get map-side combine, the shuffle carries only
    (id, gram, count) rows, and cost is LINEAR in corpus tokens —
    deliberately NOT the O(len²) ``filter``-inside-``transform`` array
    lambda, which dies on 100k-word documents."""
    w = _words(text_col)
    if n == 1:
        gram_arr = w
    else:
        # CaseWhen branches evaluate lazily, so the descending-sequence
        # trap (sequence(1, 0) = [1, 0]) never fires for short docs
        gram_arr = F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    grams = df.select(F.col(id_col).alias("_id"), F.explode(gram_arr).alias("g"))
    counts = grams.groupBy("_id", "g").agg(F.count("*").alias("c"))
    per = (
        counts.groupBy("_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.count("*").alias("distinct_grams"),
            F.max("c").alias("_top"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias(
                "_rep"
            ),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            "distinct_grams",
            (F.col("_top") / F.col("n_grams")).alias("top_ngram_frac"),
            (F.col("_rep") / F.col("n_grams")).alias("dup_ngram_frac"),
        )
    )
    return per


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Word (n=1) and bigram (n=2) repetition signals joined onto the
    input: ``n_words, top_word_frac, dup_word_frac, top_bigram_frac,
    dup_bigram_frac`` (NULL where the doc has too few words)."""
    w1 = ngram_repetition(df, id_col, text_col, n=1).select(
        id_col,
        F.col("n_grams").alias("n_words"),
        F.col("top_ngram_frac").alias("top_word_frac"),
        F.col("dup_ngram_frac").alias("dup_word_frac"),
    )
    w2 = ngram_repetition(df, id_col, text_col, n=2).select(
        id_col,
        F.col("top_ngram_frac").alias("top_bigram_frac"),
        F.col("dup_ngram_frac").alias("dup_bigram_frac"),
    )
    return df.join(w1, id_col, "left").join(w2, id_col, "left")


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, whitespace collapsed, trimmed) — the exact-dedup key."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.md5(norm.cast("binary")))
