"""Text analysis for training-data pipelines: token stats, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built-in string/regex/array functions — JVM-side, no UDFs.
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


def _tokens(col: F.Column) -> F.Column:
    return F.split(normalize_text(col), " ")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics (whitespace tokenizer)."""
    toks = _tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(normalize_text(F.col(text_col))).alias("n_chars_norm"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: type-token ratio, mean token length,
    stopword ratio. Ratios are int/int double divisions — exact parity."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_chars = F.length(F.array_join(toks, ""))
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / n.cast("double")).alias("type_token_ratio"),
        (n_chars.cast("double") / n.cast("double")).alias("mean_token_len"),
        (n_stop.cast("double") / n.cast("double")).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram-free heuristic language ID: argmax of marker-word hit counts.

    Deterministic tie-break by language order; 'und' when no marker hits.
    """
    toks = _tokens(F.col(text_col))
    counts = {
        lang: F.size(
            F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(w) for w in ws]), t))
        )
        for lang, ws in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in LANG_MARKERS:  # later langs win only on strictly greater count
        cond = counts[lang] > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, counts[lang]).otherwise(best_n)
    return df.select(F.col(id_col), best.alias("pred_lang"), best_n.alias("marker_hits"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """128-bit content fingerprint of the normalized text (md5)."""
    return df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    )
