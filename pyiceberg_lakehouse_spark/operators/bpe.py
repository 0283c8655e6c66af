"""Distributed byte-pair-encoding (BPE) vocabulary learning + tokenization.

The training-data toolkit estimates token budgets with a regex
pre-tokenizer (text.py::subword_token_stats) but until now could not LEARN
a subword vocabulary. This module implements classic BPE (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units") Spark-first:

- the corpus collapses to a WORD-FREQUENCY table once (the standard BPE
  reduction: merges depend only on word shapes × counts, so a 100 TB
  corpus becomes a vocabulary-sized frame — millions of rows, not
  billions);
- each merge iteration is one JVM-side job over that table: explode
  adjacent symbol pairs weighted by word count, partial-agg sum, take the
  argmax (a 1-row collect — metadata-bounded, like every other cursor in
  this repo). The winning pair is folded into every word's symbol array
  with a higher-order ``aggregate`` expression (whole-stage codegen, no
  Python), left-to-right non-overlapping exactly like the reference
  algorithm. ``localCheckpoint`` truncates lineage per iteration, the same
  device the connected-components kernel uses;
- tokenization applies the learned ranked merges with an Arrow-batched
  pandas UDF (per-batch word cache — real corpora repeat words heavily);
  the apply loop always merges the lowest-ranked pair present, which
  reproduces the learning-time sequence exactly (applying an absent pair
  is a no-op, so rank order == learning order).

Determinism: ties on pair frequency break lexicographically (left, right),
so learned merge tables are reproducible across engines and runs — the
pytest gate (tests/test_bpe.py) checks the distributed learner merge-for-
merge against an independent driver-side reference implementation.

100 TB posture: the per-iteration shuffle carries only (pair, partial
count) rows — bounded by the distinct-pair vocabulary, not the corpus.
``vocab_words`` caps the working table at the most frequent words
(SentencePiece-style corpus subsampling) so iteration cost is independent
of corpus size after the first pass.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pyiceberg_lakehouse_spark.localdf import local_rows_df
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, col: str = "text") -> DataFrame:
    """(word, cnt) — the only pass that ever touches the full corpus."""
    return (
        docs.select(F.explode(F.split(F.col(col), r"\s+")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def pair_stats(docs: DataFrame, col: str = "text") -> DataFrame:
    """Frequency of every adjacent symbol pair at the character stage —
    iteration 0 of the learner, exposed as a standalone (and SQL-twin-
    checkable) statistic: (left_sym, right_sym, pair_freq)."""
    wf = word_freqs(docs, col)
    return (
        wf.filter(F.length("word") >= 2)
        .select(
            F.expr("explode(sequence(1, length(word) - 1))").alias("i"),
            "word",
            "cnt",
        )
        .select(
            F.expr("substr(word, i, 1)").alias("left_sym"),
            F.expr("substr(word, i + 1, 1)").alias("right_sym"),
            "cnt",
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("cnt").alias("pair_freq"))
    )


def _merge_pair_expr(a: str, b: str) -> F.Column:
    """Fold ``sym`` replacing adjacent (a, b) with the merged symbol,
    left-to-right non-overlapping ("aaa" + (a,a) -> ["aa","a"]), entirely
    inside codegen. try_element_at(acc, -1) is NULL on the empty
    accumulator (ANSI-safe), so the first symbol always appends."""
    merged = a + b
    return F.aggregate(
        "sym",
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    docs: DataFrame,
    col: str = "text",
    num_merges: int = 32,
    min_freq: int = 2,
    vocab_words: int = 65536,
) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` BPE merges; returns [(left, right,
    pair_freq)] in rank order. Stops early when the best remaining pair
    falls below ``min_freq``."""
    spark = docs.sparkSession
    wf = (
        word_freqs(docs, col)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(vocab_words)
    )
    words = wf.select(F.split("word", "").alias("sym"), "cnt").localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = (
            words.filter(F.size("sym") >= 2)
            .select(
                F.expr("explode(sequence(1, size(sym) - 1))").alias("i"),
                "sym",
                "cnt",
            )
            .select(
                F.expr("element_at(sym, i)").alias("a"),
                F.expr("element_at(sym, i + 1)").alias("b"),
                "cnt",
            )
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["freq"] < min_freq:
            break
        a, b, freq = best[0]["a"], best[0]["b"], int(best[0]["freq"])
        merges.append((a, b, freq))
        words = words.withColumn(
            "sym", _merge_pair_expr(a, b)
        ).localCheckpoint()
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merge table as a DataFrame: (rank, left, right, merged,
    pair_freq) — what a vocabulary artifact sink would persist."""
    rows = [
        (rank, a, b, a + b, freq) for rank, (a, b, freq) in enumerate(merges)
    ]
    return local_rows_df(spark,
        rows, "rank int, left string, right string, merged string, pair_freq bigint"
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    col: str = "text",
    out: str = "tokens",
) -> DataFrame:
    """Tokenize ``col`` with the learned merges (Arrow-batched pandas UDF,
    per-batch word cache). Adds ``out`` as array<string>."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def tok(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            sym = list(w)
            while len(sym) >= 2:
                present = [
                    (r, p)
                    for p in {(sym[i], sym[i + 1]) for i in range(len(sym) - 1)}
                    if (r := ranks.get(p)) is not None
                ]
                if not present:
                    break
                _, (a, b) = min(present)
                nxt, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                        nxt.append(a + b)
                        i += 2
                    else:
                        nxt.append(sym[i])
                        i += 1
                sym = nxt
            cache[w] = sym
            return sym

        return texts.map(
            lambda t: [s for w in t.split() for s in word_tokens(w)]
            if t
            else []
        )

    return docs.withColumn(out, tok(F.col(col)))
