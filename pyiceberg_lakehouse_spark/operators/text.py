"""Text analysis for training-data pipelines: token stats, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built-in string/regex/array functions — JVM-side, no UDFs.
Token arrays are materialized into their own projection before use: Catalyst
substitutes column references textually into lambda bodies, so an inline
split(regexp(...)) would re-tokenize the document once per referencing
expression (CollapseProject keeps the boundary because the reference is
non-cheap and multiply-used).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.operators.dedup import normalize_text

# tiny per-language stopword markers for the heuristic language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
}


def _with_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics (whitespace tokenizer)."""
    toks = _with_tokens(df, text_col, id_col)
    t = F.col("_toks")
    return toks.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        (F.length(F.array_join(t, "")) + F.size(t) - 1).alias("n_chars_norm"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: type-token ratio, mean token length,
    stopword ratio. Ratios are int/int double divisions — exact parity."""
    toks = _with_tokens(df, text_col, id_col)
    t = F.col("_toks")
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    staged = toks.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("_n_distinct"),
        F.length(F.array_join(t, "")).alias("_n_chars"),
        F.size(F.filter(t, lambda x: F.array_contains(stop, x))).alias("_n_stop"),
    )
    n = F.col("n_tokens").cast("double")
    return staged.select(
        F.col(id_col),
        "n_tokens",
        (F.col("_n_distinct").cast("double") / n).alias("type_token_ratio"),
        (F.col("_n_chars").cast("double") / n).alias("mean_token_len"),
        (F.col("_n_stop").cast("double") / n).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: argmax of per-language stopword hit counts.

    Hit counts are materialized once per language, then the argmax CASE
    chain references only those columns — earlier languages win ties.
    """
    toks = _with_tokens(df, text_col, id_col)
    t = F.col("_toks")
    hits = toks.select(
        F.col(id_col),
        *[
            F.size(
                F.filter(t, lambda x: F.array_contains(F.array(*[F.lit(w) for w in ws]), x))
            ).alias(f"_h_{lang}")
            for lang, ws in LANG_MARKERS.items()
        ],
    )
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in LANG_MARKERS:  # later langs win only on strictly greater count
        cond = F.col(f"_h_{lang}") > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, F.col(f"_h_{lang}")).otherwise(best_n)
    return hits.select(F.col(id_col), best.alias("pred_lang"), best_n.alias("marker_hits"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """128-bit content fingerprint of the normalized text (md5)."""
    return df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    )
