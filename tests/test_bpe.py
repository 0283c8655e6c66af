"""Distributed BPE learner vs an independent driver-side reference.

The learner's claim is EXACT reproduction of classic BPE (Sennrich et al.)
with a deterministic tie-break — so the gate is merge-for-merge equality
against a from-scratch Python implementation, and token-for-token equality
of the distributed tokenizer against rank-order reference application.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.operators import bpe


# --- reference implementation (pure Python, independent of the Spark path)


def ref_word_freqs(texts: list[str]) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in texts:
        for w in re.split(r"\s+", t):
            if w:
                out[w] = out.get(w, 0) + 1
    return out


def ref_learn(
    freqs: dict[str, int], num_merges: int, min_freq: int = 2
) -> list[tuple[str, str, int]]:
    seqs = [(list(w), c) for w, c in freqs.items()]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, c in seqs:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_freq:
            break
        merges.append((a, b, freq))
        seqs = [(_ref_merge(sym, a, b), c) for sym, c in seqs]
    return merges


def _ref_merge(sym: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def ref_tokenize(
    text: str, merges: list[tuple[str, str, int]]
) -> list[str]:
    toks: list[str] = []
    for w in text.split():
        sym = list(w)
        for a, b, _ in merges:  # rank order
            sym = _ref_merge(sym, a, b)
        toks.extend(sym)
    return toks


# --- gates


def test_learn_matches_reference_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r[0] for r in docs.select("text").collect()]
    expect = ref_learn(ref_word_freqs(texts), num_merges=12)
    got = bpe.learn_bpe(docs, num_merges=12)
    assert got == expect


def test_tokenize_matches_reference(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(40)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    merges = bpe.learn_bpe(docs, num_merges=10)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe.apply_bpe(docs, merges).select("doc_id", "tokens").collect()
    }
    for doc_id, text in texts.items():
        assert got[doc_id] == ref_tokenize(text, merges), doc_id


def test_overlapping_pair_merges_left_to_right(spark):
    docs = spark.createDataFrame([("aaa aaa",), ("aaa",)], "text string")
    merges = bpe.learn_bpe(docs, num_merges=1)
    # "aaa" x3: pairs (a,a) weighted 2 per word occurrence-shape; the word
    # table has ONE row (aaa, 3) -> freq 6
    assert merges == [("a", "a", 6)]
    toks = bpe.apply_bpe(docs, merges).select("tokens").collect()
    assert list(toks[0]["tokens"]) == ["aa", "a", "aa", "a"]


def test_tokens_roundtrip_to_text(spark):
    """Concatenating a word's tokens must reproduce the word — BPE never
    drops or invents characters."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(20)
    merges = bpe.learn_bpe(docs, num_merges=8)
    joined = bpe.apply_bpe(docs, merges).select(
        F.concat_ws("", "tokens").alias("glued"),
        F.regexp_replace("text", r"\s+", "").alias("squashed"),
    )
    assert joined.filter(F.col("glued") != F.col("squashed")).count() == 0


def test_min_freq_stops_learning(spark):
    docs = spark.createDataFrame([("xy zz zz",)], "text string")
    # (z,z) freq 2 passes min_freq=2; (x,y) freq 1 never merges
    merges = bpe.learn_bpe(docs, num_merges=5)
    assert ("x", "y", 1) not in merges
    assert merges[0] == ("z", "z", 2)


def test_empty_and_single_char_texts(spark):
    docs = spark.createDataFrame([("",), ("a",), ("a b c",)], "text string")
    merges = bpe.learn_bpe(docs, num_merges=3)
    assert merges == []  # no pair reaches min_freq=2
    out = bpe.apply_bpe(docs, merges).select("tokens").collect()
    assert list(out[0]["tokens"]) == []
    assert list(out[1]["tokens"]) == ["a"]
