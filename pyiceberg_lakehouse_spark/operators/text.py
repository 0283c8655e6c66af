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


# GPT-2-style pre-tokenizer pieces over normalized (lowercased) text:
# contraction suffixes, space-prefixed letter runs, digit runs, punctuation
# runs. Deliberately restricted to constructs Java regex and RE2 interpret
# identically (no backrefs, no lookaround), so the DuckDB oracle matches.
SUBWORD_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+"


def subword_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Subword ("BPE-ish") token estimate per document: counts GPT-2-style
    pre-tokenizer pieces via one regexp pass — the budgeting number a
    training pipeline needs (sequence packing, mixture weights, cost
    estimates) without shipping a real tokenizer to executors. Whitespace
    words underestimate tokens on punctuation/digit-heavy text; this
    tracks the real pre-tokenizer's piece boundaries.

    Shuffle-free per-row expression work; chars_per_token is exact-int /
    exact-int so the double is engine-stable.
    """
    norm = normalize_text(F.col(text_col))
    pieces = F.regexp_extract_all(norm, F.lit(SUBWORD_PATTERN), F.lit(0))
    return df.select(
        F.col(id_col),
        F.size(pieces).alias("n_subword_tokens"),
        F.length(norm).alias("n_chars_norm"),
        (
            F.length(norm).cast("double")
            / F.greatest(F.size(pieces), F.lit(1)).cast("double")
        ).alias("chars_per_token"),
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


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Intra-document repetition signal (Gopher-style quality rule): the
    fraction of a document's k-word n-grams that are duplicates of an
    earlier occurrence. Heavily templated / looping text scores high and
    is filtered before training.

    Pure per-row expression work — no shuffle at all: tokenize once,
    enumerate ALL k-grams (not distinct), compare against the distinct
    count. The double division is exact-int over exact-int, so the oracle
    comparison is bitwise stable.
    """
    toks = _with_tokens(df, text_col, id_col)
    # materialize the gram array once — transform lambdas substitute
    # textually, so inlining it into 3 size() expressions would enumerate
    # the grams three times per row (same pitfall as word_shingles)
    grams = toks.select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size("_toks") - k, F.lit(0))),
            lambda i: F.concat_ws(
                # try_element_at: short docs read NULL past the end (skipped
                # by concat_ws) instead of an ANSI out-of-bounds failure
                " ", *[F.try_element_at(F.col("_toks"), i + j + 1) for j in range(k)]
            ),
        ).alias("_grams"),
    )
    return grams.select(
        F.col(id_col),
        F.size("_grams").alias("n_grams"),
        F.size(F.array_distinct("_grams")).alias("n_distinct"),
        (
            (F.size("_grams") - F.size(F.array_distinct("_grams"))).cast("double")
            / F.size("_grams").cast("double")
        ).alias("dup_fraction"),
    )


def tf_idf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
) -> DataFrame:
    """Top-``top_n`` distinctive terms per document by TF-IDF.

    One explode to (doc, term) pairs, one groupBy for term frequencies, one
    corpus-level aggregate for document frequencies, then a per-document
    top-k window. The tf/df join stays UNHINTED: both sides are already
    term-keyed aggregates, so at 100 TB (where a vocabulary can be GBs) it
    hash-joins on term without any replan, while AQE broadcasts it at
    runtime whenever the vocabulary is actually small — forcing broadcast
    here would be the scale bug. Only the 1-row corpus count is hinted.
    Score = tf * ln(N / df), ROUNDED to 6 decimals before ranking so both
    engines order identically (ln is correctly-rounded to ~1 ulp per
    engine; the rounding collapses that divergence), with the term as the
    deterministic tiebreak.
    """
    from pyspark.sql import Window as W

    toks = _with_tokens(df, text_col, id_col)
    pairs = toks.select(
        F.col(id_col), F.explode("_toks").alias("term")
    ).filter(F.col("term") != "")
    tf = pairs.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = (
        pairs.groupBy("term")
        .agg(F.count_distinct(F.col(id_col)).alias("df_count"))
    )
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df_count")),
                6,
            ),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "rank", "term", "tf", "df_count", "tfidf")
    )


# portable across Java regex (Spark) and RE2 (DuckDB): character classes,
# +/{m,} quantifiers only — no lookaround, no backrefs, no \b
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
URL_RE = "https?://[^ ]+"


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing for training corpora: redact URLs then emails to
    typed placeholder tokens, reporting per-document redaction counts.

    Pure regexp expressions (codegen, no UDF); URL redaction runs first so
    an address inside a URL counts once as a URL. The patterns are
    deliberately lookaround-free so every engine orders matches the same
    way, and matching is case-insensitive via the ``(?i)`` inline flag
    (supported by both Java regex and RE2) — the document text itself is
    NOT case-folded: redaction must not mutate the surviving corpus.
    """
    t = F.col(text_col)
    url_ci, email_ci = "(?i)" + URL_RE, "(?i)" + EMAIL_RE
    n_urls = F.size(F.regexp_extract_all(t, F.lit(url_ci), F.lit(0)))
    after_urls = F.regexp_replace(t, url_ci, "<URL>")
    n_emails = F.size(F.regexp_extract_all(after_urls, F.lit(email_ci), F.lit(0)))
    clean = F.regexp_replace(after_urls, email_ci, "<EMAIL>")
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_urls.cast("int").alias("n_urls"),
        n_emails.cast("int").alias("n_emails"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """128-bit content fingerprint of the normalized text (md5)."""
    return df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing (MOSS-style) rolling-hash fingerprints, summarized per doc.

    Pipeline, entirely in array higher-order functions (no UDF):
    tokens -> per-token hash (first 8 hex digits of md5 as a long — engine-
    portable, unlike murmur/xxhash) -> k-gram polynomial hashes -> minimum
    per sliding window of w -> distinct fingerprint set. The returned
    summary (count/min/max) is scalar so the differential oracle compares
    values, not array stringification.

    Each stage lives in its own projection: Catalyst substitutes column
    references textually into lambda bodies, so inlining would re-hash every
    token once per reference.
    """
    M = 1_000_000_007
    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
        ).alias("_toks"),
    )
    th = toks.select(
        F.col(id_col),
        F.transform(
            F.col("_toks"),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
        ).alias("_th"),
    )
    n = F.size(F.col("_th"))

    def _kgram(i):
        acc = F.lit(0).cast("long")
        for j in range(k):
            acc = acc + F.element_at(F.col("_th"), i + j) * (31 ** (k - 1 - j))
        return acc % M

    kg = th.select(
        F.col(id_col),
        F.when(
            n >= k,
            F.transform(F.sequence(F.lit(1), n - (k - 1)), _kgram),
        )
        .otherwise(F.array().cast("array<long>"))
        .alias("_kg"),
        n.cast("long").alias("n_tokens"),
    )
    m = F.size(F.col("_kg"))
    mins = kg.select(
        F.col(id_col),
        "n_tokens",
        F.when(
            m >= w,
            F.transform(
                F.sequence(F.lit(1), m - (w - 1)),
                lambda i: F.array_min(F.slice(F.col("_kg"), i, w)),
            ),
        )
        .when(m > 0, F.array(F.array_min(F.col("_kg"))))
        .otherwise(F.array().cast("array<long>"))
        .alias("_mins"),
    )
    fps = F.array_distinct(F.col("_mins"))
    return mins.select(
        F.col(id_col),
        "n_tokens",
        F.size(fps).cast("long").alias("n_fingerprints"),
        F.array_min(fps).alias("min_fp"),
        F.array_max(fps).alias("max_fp"),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 16,
    overlap: int = 4,
) -> DataFrame:
    """Token-window document chunking with overlap — the context-window
    prep step of a training/RAG pipeline: each document becomes
    ``ceil((n - size) / (size - overlap)) + 1`` chunks (one chunk when
    ``n <= size``); chunk ``i`` covers tokens ``[i*step, i*step + size)``
    with ``step = size - overlap``, so consecutive chunks share ``overlap``
    tokens and the (possibly short) tail is never dropped.

    Map-only at any scale: tokenize, derive the chunk-start sequence from
    the token count with INTEGER arithmetic, posexplode, slice — no
    shuffle, no UDF; output partitioning follows the input files. Returns
    (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    step = size - overlap
    toks = _with_tokens(df, text_col, id_col)
    n = F.size("_toks")
    # last chunk index, integer-exact on both engines: 0 when n <= size,
    # else ceil((n - size) / step) via (n - size + step - 1) div step
    last = F.when(n <= size, F.lit(0)).otherwise(
        F.expr(f"(size(_toks) - {size} + {step - 1}) div {step}")
    )
    chunks = toks.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode(F.sequence(F.lit(0), last)).alias("chunk_id", "_i"),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_id") * step + 1, size)
    return chunks.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def _bigram_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) adjacent-token pairs: one zip of the token array with
    itself shifted, one explode — never a positional self-join."""
    toks = _with_tokens(df, text_col, id_col)
    t = F.col("_toks")
    pair = F.explode(
        F.zip_with(
            F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
    ).alias("_bg")
    return toks.select(F.col(id_col), pair).select(
        id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
    )


def lm_familiarity(
    docs: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """CCNet-style n-gram language-model quality scoring, integer-exact.

    A bigram LM is "trained" on ``reference`` (conditional frequency
    C(w1,w2) / C(w1·)), and each document in ``docs`` is scored by how
    familiar its bigrams are to that model — the standard
    reference-corpus perplexity filter for training-data curation,
    reformulated so every output is EXACT integer arithmetic (no
    transcendental log whose last ulp differs across engines):

    - ``n_bigrams``: the document's adjacent-token pair count;
    - ``n_oov``: pairs the reference never saw (the perplexity spikes);
    - ``fam_sum``: sum over seen pairs of
      ``(scale * C(w1,w2)) div C(w1·)`` — integer floor division of
      bigints, so the per-pair scaled conditional probability is the
      same number in any engine. ``fam_sum / (scale * n_bigrams)`` is
      the mean conditional probability; rank ascending to surface
      gibberish/boilerplate, or threshold as a corpus filter.

    Shape at 100 TB: the model is two partial-aggregated counts over the
    reference (one shuffle each), scoring is two equi-joins on the token
    keys — both AQE-skew-splittable (stopword heads are the classic hot
    keys) — and one per-document partial-aggregated sum. Documents with
    fewer than two tokens have no bigrams and produce no row, matching
    an LM that has nothing to condition on.
    """
    ref_bg = _bigram_pairs(reference, text_col, id_col)
    c12 = ref_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c12"))
    c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    doc_bg = _bigram_pairs(docs, text_col, id_col)
    scored = (
        doc_bg.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select(
            id_col,
            F.col("_c12"),
            F.when(
                F.col("_c12").isNotNull(),
                F.expr(f"({scale} * _c12) div _c1"),
            ).alias("_fam"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.when(F.col("_c12").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.coalesce(F.sum("_fam"), F.lit(0)).cast("long").alias("fam_sum"),
    )
