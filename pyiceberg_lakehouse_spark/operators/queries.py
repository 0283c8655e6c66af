"""Driver-facing query registrations for the LLM-data operators.

Oracle-checked where the semantics are SQL-expressible in DuckDB (exact
dedup, n-gram Jaccard, cosine top-k, text stats, multimodal features);
rows-only for the sketch/bucketing paths (MinHash-LSH, SimHash, hyperplane
LSH) whose hash families are engine-specific — those get recall tests in
pytest against the exact operators instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.operators import dedup, similarity, text
from pyiceberg_lakehouse_spark.registry import register
from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir
from pyiceberg_lakehouse_spark.sources.testdata import load_table, load_table_spread

# DuckDB twin of dedup.normalize_text
NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
# DuckDB twin of functions.exact.dot_product_exact for 64-dim embeddings
# float -> double -> decimal: casting float DIRECTLY to decimal rounds the
# float's 7-digit shortest repr in Spark but the full binary value in DuckDB;
# via double, both engines round the same 17-digit value.
DOT = (
    "(select cast(sum(cast(cast({a}[i] as double) as decimal(10,7))"
    " * cast(cast({b}[i] as double) as decimal(10,7)))"
    " as double) from range(1, 65) r(i))"
)


@register(
    "dedup_exact",
    f"""
    select md5({NORM}) as fingerprint,
           min(doc_id) as keeper_id,
           count(*) as n_dups
    from documents group by 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash (hash-groupBy)."""
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


NGRAM_JACCARD_SQL = f"""
    with toks as (
      select doc_id, lang, string_split({NORM}, ' ') as t from documents
    ),
    sh as (
      select distinct doc_id, lang,
             unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) as shingle
      from toks
    ),
    sizes as (select doc_id, count(*) as n_sh from sh group by 1),
    common as (
      select a.doc_id as id_a, b.doc_id as id_b, count(*) as n_common
      from sh a join sh b on a.shingle = b.shingle and a.lang = b.lang
                         and a.doc_id < b.doc_id
      group by 1, 2
    )
    select id_a, id_b,
           cast(n_common as double) / cast(sa.n_sh + sb.n_sh - n_common as double) as jaccard
    from common
    join sizes sa on sa.doc_id = id_a
    join sizes sb on sb.doc_id = id_b
    where cast(n_common as double) / cast(sa.n_sh + sb.n_sh - n_common as double) >= 0.1
"""


@register("dedup_ngram_jaccard", NGRAM_JACCARD_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs within language (inverted index)."""
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), k=3, threshold=0.1, within="lang"
    )


@register(
    "dedup_substring_spans",
    f"""
    with toks as (
      select doc_id, string_split({NORM}, ' ') as t from documents
    ),
    base as (select doc_id, len(t) as n_tokens from toks),
    kg as (
      select doc_id, i as p, md5(array_to_string(t[i:i+4], ' ')) as h
      from toks, unnest(generate_series(1, len(t) - 4)) u(i)
    ),
    dup as (select h from kg group by h having count(*) >= 2),
    starts as (select kg.doc_id, kg.p from kg join dup using (h)),
    cov as (
      select doc_id, sum(add_) as dup_tokens from (
        select doc_id,
               least(5, coalesce(p - lag(p) over (partition by doc_id
                                                  order by p), 5)) as add_
        from starts
      ) group by doc_id
    )
    select b.doc_id, b.n_tokens,
           cast(coalesce(c.dup_tokens, 0) as bigint) as dup_tokens,
           cast(coalesce(c.dup_tokens, 0) as double)
             / cast(b.n_tokens as double) as dup_frac
    from base b left join cov c using (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring coverage (Lee et al. ExactSubstr class):
    per-document fraction of tokens inside a 5-token span occurring >= 2
    times corpus-wide. The oracle rebuilds the identical interval-union
    arithmetic in SQL (duplicate k-gram starts -> least(k, gap) window
    sum), so the hash match proves the relational reformulation of the
    suffix-array algorithm end-to-end."""
    return dedup.duplicated_span_coverage(
        load_table_spread(spark, sf_dir, "documents"), k=5, min_count=2
    )


@register("dedup_minhash_lsh")  # rows-only: hash family is engine-specific
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidates, exact-Jaccard verified (scale path)."""
    return dedup.minhash_lsh_pairs(
        load_table_spread(spark, sf_dir, "documents"),
        num_hashes=32, bands=8, verify_threshold=0.1,
    )


@register("dedup_simhash")  # rows-only: engine-specific fingerprint
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints per document."""
    return dedup.simhash(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_selfcheck",
    """
    select doc_id as id_a, doc_id + 1000000 as id_b, true as exact_dup
    from documents
    where doc_id % 7 = 2
    """,
)
def dedup_simhash_selfcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable twin for the SimHash near-dup path (the raw
    fingerprints stay rows-only: engine-specific bit layout). Planted
    construction: every doc_id % 7 == 2 gets a copy with raw bytes
    perturbed (uppercased, double-spaced) but identical NORMALIZED text —
    identical tokens vote identically, so the 64-bit fingerprint is
    equal deterministically, every 16-bit band collides, and the
    banded candidate join must surface exactly the planted pairs once
    exact-verified (normalized-text equality). A wrong bit-vote, pack,
    or band split loses pairs and flips the row count/hash."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.unionByName(
        dedup.plant_exact_duplicates(docs, modulus=7, residue=2)
    )
    return dedup.verify_exact_pairs(
        dedup.simhash_near_dup_pairs(corpus), corpus
    )


COSINE_TOPK_SQL = f"""
    with q as (select vec_id as qid, embedding as q_vec from embeddings where vec_id < 10),
    c as (select vec_id as vid, embedding as c_vec from embeddings),
    scored as (
      select qid, vid,
             {DOT.format(a="q_vec", b="c_vec")}
               / (sqrt({DOT.format(a="q_vec", b="q_vec")})
                  * sqrt({DOT.format(a="c_vec", b="c_vec")})) as score
      from q, c where qid != vid
    )
    select qid, vid, rank, score from (
      select qid, vid, score,
             cast(row_number() over (partition by qid order by score desc, vid) as integer) as rank
      from scored
    ) where rank <= 3
"""


@register("sim_cosine_topk", COSINE_TOPK_SQL)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 for query vectors (exact baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=3)


EMB_NEARDUP_SQL = f"""
    with v as (select vec_id, label, embedding from embeddings),
    pairs as (
      select a.vec_id as id_a, b.vec_id as id_b,
             a.embedding as va, b.embedding as vb
      from v a join v b on a.label = b.label and a.vec_id < b.vec_id
    )
    select id_a, id_b,
           {DOT.format(a="va", b="vb")}
             / (sqrt({DOT.format(a="va", b="va")})
                * sqrt({DOT.format(a="vb", b="vb")})) as score
    from pairs
    where {DOT.format(a="va", b="vb")}
             / (sqrt({DOT.format(a="va", b="va")})
                * sqrt({DOT.format(a="vb", b="vb")})) >= 0.4
"""


@register("dedup_embedding_cosine", EMB_NEARDUP_SQL)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (no all-pairs)."""
    return similarity.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4, within="label"
    )


@register("sim_ann_lsh")  # rows-only: bucketing is engine-specific
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-3 (the 100 TB scale path)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, emb.filter(F.col("vec_id") < 10), dim=64, k=3)


@register("sim_ann_ivf")  # rows-only: index layout is engine-specific
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-3: coarse-quantize the corpus into cells, probe
    only each query's nearest cells (recall grows with n_probe).

    Centroids are Lloyd-refined (2 iterations) from the deterministic seed
    on a BOUNDED sample — a deterministic xxhash64 slice capped at 2048
    vectors, collected ONCE and refined in numpy (kmeans_refine_local):
    index construction costs one bounded collect + zero extra Spark jobs,
    no matter the table size; k-means on a sample converges the same
    centroids for recall purposes. The full corpus is only touched by the
    probe itself (and by the persisted-index maintenance path,
    lakehouse/maintenance.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_refine_local(
        emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(4)) == 0),
        similarity.sample_centroids(emb, k=16),
        iters=2,
    )
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), cents, k=3, n_probe=4
    )


@register("sim_ann_pq")  # rows-only: codebooks are engine-specific sketch state
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-3 (FAISS-style ADC): 8x16 codebooks
    trained on a bounded sample, corpus encoded to 8 small ints per vector
    (32x smaller than the float embeddings), queries score via per-query
    lookup tables — 8 LUT adds per candidate instead of a 64-dim dot.
    Composable with the IVF cell pruning (IVF narrows candidates, PQ makes
    scoring them cheap + shrinks what the scan reads)."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = similarity.pq_train_local(
        emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(4)) == 0),
        n_subspaces=8,
        n_codes=16,
    )
    corpus = similarity.pq_encode(emb, books).select("vec_id", "pq_codes")
    return similarity.pq_adc_topk(
        corpus, emb.filter(F.col("vec_id") < 10), books, k=3
    )


@register("lh_ann_ivfpq")  # rows-only: persisted index layout is engine-specific
def lh_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete persisted ANN index (FAISS IVF-PQ on lakehouse
    metadata): build_ivf_index clusters files by cell, build_pq_index adds
    8-int codes + codebooks; the probe prunes files by cell and ADC-scores
    candidates from the code column — embeddings never read at query
    time."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import (
        build_ivf_index,
        build_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    lh = Lakehouse(spark, session_tmpdir(prefix="ann_ivfpq_"))
    t = lh.create_table("ns.embeddings_ivfpq", emb.schema)
    t.append(emb)
    build_ivf_index(t, k=16, iters=2)
    build_pq_index(t)
    return similarity.ivf_pq_topk(
        t, emb.filter(F.col("vec_id") < 10), k=3, n_probe=4
    )


@register("lh_ann_indexed")  # rows-only: persisted index layout is engine-specific
def lh_ann_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-3 over a PERSISTED IVF index: ``build_ivf_index`` stores an
    ``ivf_cell`` column + centroid metadata in a lakehouse table (one
    maintenance rewrite), then the probe reads centroids from table
    properties and scans ONLY files whose cell bounds intersect the probed
    cells — index construction never runs in the read path. This is the
    100 TB ANN design; ``sim_ann_ivf`` is the same math without the
    persisted index."""

    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import build_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    lh = Lakehouse(spark, session_tmpdir(prefix="ann_idx_"))
    t = lh.create_table("ns.embeddings_ivf", emb.schema)
    t.append(emb)
    build_ivf_index(t, k=16, iters=2)
    return similarity.ivf_index_topk(
        t, emb.filter(F.col("vec_id") < 10), k=3, n_probe=4
    )


@register(
    "lh_ann_indexed_selfcheck",
    """
    select vec_id as qid, cast(3 as integer) as n_results,
           true as matches_unindexed
    from embeddings where vec_id < 10
    """,
)
def lh_ann_indexed_selfcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential proof of the PERSISTED IVF index the driver can hash:
    for every query vector, the index probe (stored ivf_cell + file
    pruning, similarity.ivf_index_topk) must return exactly the top-3 the
    unindexed ivf_topk computes from the same centroids. Any bug in the
    clustered rewrite, stats IN-list pruning, or stored-cell assignment
    breaks per-qid equality and flips the hash."""
    import json

    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import build_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    lh = Lakehouse(spark, session_tmpdir(prefix="ann_chk_"))
    t = lh.create_table("ns.embeddings_chk", emb.schema)
    t.append(emb)
    build_ivf_index(t, k=16, iters=2)
    cents = json.loads(t.log.properties["ivf.centroids"])
    got = similarity.ivf_index_topk(t, q, k=3, n_probe=4)
    twin = similarity.ivf_topk(emb, q, cents, k=3, n_probe=4)
    a = got.groupBy("qid").agg(
        F.sort_array(F.collect_list(F.struct("rank", "vid"))).alias("res"),
        F.count("*").cast("int").alias("n_results"),
    )
    b = twin.groupBy("qid").agg(
        F.sort_array(F.collect_list(F.struct("rank", "vid"))).alias("res_twin")
    )
    return a.join(b, "qid").select(
        "qid",
        "n_results",
        (F.col("res") == F.col("res_twin")).alias("matches_unindexed"),
    )


@register(
    "lh_ann_refresh_selfcheck",
    """
    select vec_id as qid, cast(3 as integer) as n_results,
           true as matches_unindexed, true as indexed_files_untouched
    from embeddings where vec_id < 10
    """,
)
def lh_ann_refresh_selfcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential proof of INCREMENTAL index maintenance the driver can
    hash: build the IVF index on 80% of the corpus, append the other 20%,
    refresh_ann_indexes — then (a) the probe over the refreshed table must
    equal the unindexed ivf_topk over the FULL corpus with the same
    centroids (appended vectors findable, nothing lost), and (b) every
    file from the original build must survive byte-untouched (refresh cost
    tracks the append, not the corpus — maintenance.py:refresh_ann_indexes,
    the register-without-rewrite philosophy of main-ray.py:109-121)."""
    import json
    import os as _os

    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import (
        build_ivf_index,
        refresh_ann_indexes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    extra = emb.filter(F.col("vec_id") % 5 == 0)
    q = emb.filter(F.col("vec_id") < 10)
    lh = Lakehouse(spark, session_tmpdir(prefix="ann_rfr_"))
    t = lh.create_table("ns.embeddings_rfr", emb.schema)
    t.append(base)
    build_ivf_index(t, k=16, iters=2)
    indexed = {
        f["path"]: _os.path.getmtime(f["path"]) for f in t.log.live_files()
    }
    t.append(extra)
    refresh_ann_indexes(t)
    untouched = all(
        _os.path.exists(p) and _os.path.getmtime(p) == m for p, m in indexed.items()
    )
    cents = json.loads(t.log.properties["ivf.centroids"])
    got = similarity.ivf_index_topk(t, q, k=3, n_probe=4)
    twin = similarity.ivf_topk(emb, q, cents, k=3, n_probe=4)
    a = got.groupBy("qid").agg(
        F.sort_array(F.collect_list(F.struct("rank", "vid"))).alias("res"),
        F.count("*").cast("int").alias("n_results"),
    )
    b = twin.groupBy("qid").agg(
        F.sort_array(F.collect_list(F.struct("rank", "vid"))).alias("res_twin")
    )
    return a.join(b, "qid").select(
        "qid",
        "n_results",
        (F.col("res") == F.col("res_twin")).alias("matches_unindexed"),
        F.lit(untouched).alias("indexed_files_untouched"),
    )


@register(
    "text_token_stats",
    f"""
    select doc_id,
           cast(len(string_split({NORM}, ' ')) as integer) as n_tokens,
           cast(len(list_distinct(string_split({NORM}, ' '))) as integer) as n_distinct_tokens,
           cast(length({NORM}) as integer) as n_chars_norm
    from documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting per document."""
    return text.token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "text_subword_tokens",
    f"""
    select doc_id,
           cast(len(regexp_extract_all({NORM},
             '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+')) as integer)
             as n_subword_tokens,
           cast(length({NORM}) as integer) as n_chars_norm,
           cast(length({NORM}) as double)
             / cast(greatest(len(regexp_extract_all({NORM},
                 '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+')), 1) as double)
             as chars_per_token
    from documents
    """,
)
def text_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style subword token estimate (regexp pre-tokenizer pieces)."""
    return text.subword_token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "text_repetition_stats",
    f"""
    with toks as (select doc_id, string_split({NORM}, ' ') as t from documents),
    g as (
      select doc_id,
             list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                            i -> concat_ws(' ', t[i], t[i+1], t[i+2])) as l
      from toks
    )
    select doc_id,
           cast(len(l) as integer) as n_grams,
           cast(len(list_distinct(l)) as integer) as n_distinct,
           cast(len(l) - len(list_distinct(l)) as double)
             / cast(len(l) as double) as dup_fraction
    from g
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition: fraction of duplicated
    3-grams per document (shuffle-free per-row expressions)."""
    return text.repetition_stats(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality",
    f"""
    with t as (select doc_id, string_split({NORM}, ' ') as toks from documents)
    select doc_id,
           cast(len(toks) as integer) as n_tokens,
           cast(len(list_distinct(toks)) as double) / cast(len(toks) as double) as type_token_ratio,
           cast(length(list_aggregate(toks, 'string_agg', '')) as double)
             / cast(len(toks) as double) as mean_token_len,
           cast(len(list_filter(toks, x -> x in ('the', 'and', 'of'))) as double)
             / cast(len(toks) as double) as stopword_ratio
    from t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features: type-token ratio, mean token length, stopword ratio."""
    return text.quality_score(load_table(spark, sf_dir, "documents"))


LANGID_SQL = f"""
    with t as (select doc_id, string_split({NORM}, ' ') as toks from documents),
    hits as (
      select doc_id,
        cast(len(list_filter(toks, x -> x in ('the','and','of'))) as integer) as h_en,
        cast(len(list_filter(toks, x -> x in ('der','und','die'))) as integer) as h_de,
        cast(len(list_filter(toks, x -> x in ('le','la','et'))) as integer) as h_fr,
        cast(len(list_filter(toks, x -> x in ('el','los','que'))) as integer) as h_es
      from t
    )
    select doc_id,
      case when h_es > greatest(h_en, h_de, h_fr) then 'es'
           when h_fr > greatest(h_en, h_de) then 'fr'
           when h_de > h_en then 'de'
           when h_en > 0 then 'en'
           else 'und' end as pred_lang,
      greatest(h_en, h_de, h_fr, h_es) as marker_hits
    from hits
"""


@register("text_lang_id", LANGID_SQL)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (later language wins strict ties)."""
    return text.lang_id(load_table(spark, sf_dir, "documents"))


# every decoded media feature is a closed form in doc_id (the synthesizer's
# parameters), so DuckDB predicts what the REAL header decoder must emit —
# a wrong BMP stride, WAV chunk walk, or byte count flips the hash


# PNG decode differential gate: pixel (y, x, c) = (doc_id*31 + y*7 + x*3 +
# c*11) % 256 and dims/channels/filter are all closed forms in doc_id, so
# the oracle predicts the ENCODE -> zlib -> DECODE round-trip sum without
# running either codec. filter_type = doc_id % 5 exercises every PNG
# filter (None/Sub/Up/Average/Paeth) across the corpus — a wrong predictor
# or un-filter on ANY scanline path flips the hash.


WINNOW_SQL = """
    with toks as (
      select doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t != '') as tk
      from documents
    ), th as (
      select doc_id,
             list_transform(tk, t -> ('0x' || substring(md5(t),1,8))::bigint) as h
      from toks
    ), kg as (
      select doc_id, cast(len(h) as bigint) as n_tokens,
             case when len(h) >= 3 then
               list_transform(generate_series(1, len(h)-2),
                 i -> (h[i]*961 + h[i+1]*31 + h[i+2]) % 1000000007)
             else [] end as g
      from th
    ), mn as (
      select doc_id, n_tokens,
             case when len(g) >= 4 then
               list_transform(generate_series(1, len(g)-3),
                 i -> list_min(g[i:i+3]))
             when len(g) > 0 then [list_min(g)]
             else [] end as mins
      from kg
    )
    select doc_id, n_tokens,
           cast(len(list_distinct(mins)) as bigint) as n_fingerprints,
           list_min(list_distinct(mins)) as min_fp,
           list_max(list_distinct(mins)) as max_fp
    from mn
"""


@register("text_winnow_fingerprint", WINNOW_SQL)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) rolling-hash fingerprints over documents — the
    document-fingerprinting member of the training-data toolkit. Token
    hashes ride md5 hex (engine-portable), so the DuckDB oracle reproduces
    every fingerprint bit-for-bit."""
    docs = load_table_spread(spark, sf_dir, "documents")
    return text.winnow_fingerprints(docs, k=3, w=4)


def dedup_group_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dedup pipeline: MinHash-LSH pairs -> connected components
    (transitive closure) -> keep each group's canonical document.

    Deliberately NOT a registered query: its MinHash edges are
    engine-specific, so a driver row could only ever be ``no_oracle``.
    The component ALGORITHM is hash-checked end-to-end by the registered
    twin ``dedup_components_exact`` (deterministic Jaccard edges, DuckDB
    recursive-CTE oracle), and the label propagation is property-tested
    against a driver-side union-find (tests/test_operators.py). This
    composition remains the production near-dedup entry point."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=8, verify_threshold=0.1)
    return dedup.dedup_groups_keep_canonical(docs, pairs).select("doc_id", "lang")


# portable deterministic hash bucket: Spark conv(substr(md5,1,15),16,10) ==
# DuckDB ('0x'||substr(md5,1,15))::bigint (same trick the winnow oracle uses)
HB = "(('0x' || substr(md5(cast({col} as varchar)), 1, 15))::bigint % {n})"


@register(
    "train_split_hash",
    f"""
    select doc_id, lang,
           case when {HB.format(col="doc_id", n=100)} < 10 then 'test'
                else 'train' end as split
    from documents
    """,
)
def train_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash train/test split: membership is stable under
    reruns, repartitioning, and corpus growth — no RNG state anywhere."""
    from pyiceberg_lakehouse_spark.operators import traindata

    docs = load_table(spark, sf_dir, "documents")
    return traindata.split_train_test(docs, test_pct=10).select(
        "doc_id", "lang", "split"
    )


@register(
    "train_balance_labels",
    f"""
    with ranked as (
      select doc_id, lang,
             row_number() over (
               partition by lang
               order by {HB.format(col="doc_id", n=1000000)}, doc_id
             ) as rk
      from documents
    ),
    m as (select min(n) as m from (select count(*) as n from documents group by lang))
    select doc_id, lang from ranked, m where rk <= m.m
    """,
)
def train_balance_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every language to the minority class size, selecting by
    deterministic hash order (unbiased and rerun-stable)."""
    from pyiceberg_lakehouse_spark.operators import traindata

    docs = load_table(spark, sf_dir, "documents")
    return traindata.balance_labels(docs, label_col="lang").select("doc_id", "lang")


@register(
    "train_mix_weighted",
    f"""
    select doc_id, cast(0 as int) as source_id from documents
    where doc_id % 2 = 0 and {HB.format(col="doc_id", n=1000000)} < 500000
    union all
    select doc_id, cast(1 as int) as source_id from documents
    where doc_id % 2 = 1
    """,
)
def train_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: half of source 0 (even ids), all of source 1
    (odd ids) — per-source deterministic sampling rates."""
    from pyiceberg_lakehouse_spark.operators import traindata

    docs = load_table(spark, sf_dir, "documents")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    return traindata.mix_weighted([(even, 0.5), (odd, 1.0)]).select(
        "doc_id", "source_id"
    )


@register(
    "train_decontaminate",
    f"""
    with toks as (
      select doc_id, string_split({NORM}, ' ') as t from documents
    ),
    sh as (
      select distinct doc_id,
             unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) as shingle
      from toks
    ),
    ev as (select distinct shingle from sh where doc_id % 41 = 0)
    select s.doc_id, count(*) as n_contaminated
    from sh s join ev using (shingle)
    where s.doc_id % 41 != 0
    group by 1
    """,
)
def train_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (GPT-3-style n-gram overlap): flag training
    documents sharing any 3-word shingle with the held-out eval slice
    (doc_id % 41 == 0). Eval shingles broadcast; the training corpus is
    scanned once — no self-join. k=3 fits the synthetic short documents;
    production text uses the published k=8-13 range."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 41 != 0)
    ev = docs.filter(F.col("doc_id") % 41 == 0)
    return dedup.decontaminate(train, ev, k=3)


@register(
    "train_pack_sequences",
    f"""
    with recursive toks as (
      select doc_id,
             cast(len(string_split({NORM}, ' ')) as bigint) as n_tokens,
             {HB.format(col="doc_id", n=64)} as pack_group
      from documents
    ),
    seq as (
      select doc_id, n_tokens, pack_group,
             row_number() over (partition by pack_group order by doc_id) as rn
      from toks
    ),
    -- the first-fit fold, one recursion step per in-group position:
    -- bin = this doc's assignment; (nxt_bin, nxt_used) = carried state
    -- for the NEXT doc after the close-if-full rule
    rec as (
      select pack_group, rn, doc_id, n_tokens,
             0 as bin,
             case when n_tokens >= 512 then 1 else 0 end as nxt_bin,
             case when n_tokens >= 512 then 0 else n_tokens end as nxt_used
      from seq where rn = 1
      union all
      select pack_group, rn, doc_id, n_tokens,
             bin,
             case when u >= 512 then bin + 1 else bin end as nxt_bin,
             case when u >= 512 then 0 else u end as nxt_used
      from (
        select s.pack_group, s.rn, s.doc_id, s.n_tokens,
               r.nxt_bin + case when r.nxt_used > 0
                                 and r.nxt_used + s.n_tokens > 512
                           then 1 else 0 end as bin,
               case when r.nxt_used > 0 and r.nxt_used + s.n_tokens > 512
                    then 0 else r.nxt_used end + s.n_tokens as u
        from rec r
        join seq s on s.pack_group = r.pack_group and s.rn = r.rn + 1
      )
    )
    select doc_id, n_tokens,
           cast(pack_group as integer) as pack_group,
           cast(bin * 64 + pack_group as bigint) as bin_id
    from rec
    """,
)
def train_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing of documents into <=512-token bins, packed
    independently per hash group (parallel across the cluster). The
    packing is deterministic first-fit over the explicit in-group
    doc_id order, so the bin assignments are CLOSED-FORM: the oracle
    replays the same fold as a recursive CTE (one step per in-group
    position, carrying the (next_bin, running_fill) state through the
    close-when-full rule) over the same portable md5 hash groups —
    any drift in group assignment, ordering, capacity arithmetic, or
    the bin-id encoding (local_bin * n_groups + group) flips the hash."""
    from pyiceberg_lakehouse_spark.operators import text, traindata

    docs = load_table(spark, sf_dir, "documents")
    toks = text.token_stats(docs).select("doc_id", "n_tokens")
    return traindata.pack_sequences(toks, max_tokens=512)


@register(
    "pipeline_clean_corpus",
    f"""
    with scored as (
      select doc_id, lang, text,
             len(string_split({NORM}, ' ')) as n_tokens,
             md5({NORM}) as fp
      from documents
    ),
    filtered as (
      select * from scored where n_tokens >= 20 and lang in ('en', 'de')
    ),
    deduped as (
      select doc_id, lang, n_tokens,
             row_number() over (partition by fp order by doc_id) as rn
      from filtered
    )
    select doc_id, lang, cast(n_tokens as integer) as n_tokens,
           case when {HB.format(col="doc_id", n=100)} < 10 then 'test'
                else 'train' end as split
    from deduped where rn = 1
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation, the composition a real training-data
    pipeline runs: token-count quality floor -> language allowlist -> exact
    dedup (keep smallest id per content fingerprint) -> deterministic
    train/test split. Every stage is a Catalyst expression; the whole
    pipeline is ONE job with a single shuffle for the dedup window."""
    return clean_corpus(load_table(spark, sf_dir, "documents"))


@register(
    "pipeline_train_prep",
    f"""
    with toks as (
      select doc_id, string_split({NORM}, ' ') as t from documents
    ),
    sh as (
      select distinct doc_id,
             unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) as shingle
      from toks
    ),
    ev as (select distinct shingle from sh where doc_id % 41 = 0),
    flagged as (
      select distinct s.doc_id from sh s join ev using (shingle)
      where s.doc_id % 41 != 0
    ),
    scored as (
      select doc_id, lang,
             len(string_split({NORM}, ' ')) as n_tokens,
             md5({NORM}) as fp
      from documents
      where doc_id % 41 != 0
        and doc_id not in (select doc_id from flagged)
    ),
    filtered as (select * from scored where n_tokens >= 20),
    deduped as (
      select doc_id, lang, n_tokens,
             row_number() over (partition by fp order by doc_id) as rn
      from filtered
    )
    select doc_id, lang, cast(n_tokens as integer) as n_tokens,
           case when {HB.format(col="doc_id", n=100)} < 10 then 'test'
                else 'train' end as split
    from deduped where rn = 1
    """,
)
def pipeline_train_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontaminating variant of the corpus-prep pipeline: drop any
    training doc sharing a 3-gram with the eval slice (doc_id % 41 == 0),
    then quality floor -> exact dedup keep-first -> deterministic split.
    Composition cost at scale: decontamination adds ONE exploded pass +
    broadcast shingle join in front of the clean-corpus plan's single
    dedup-window shuffle."""
    from pyiceberg_lakehouse_spark.operators import traindata
    from pyiceberg_lakehouse_spark.operators.dedup import normalize_text
    from pyspark.sql import Window as W_

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 41 == 0)
    train = docs.filter(F.col("doc_id") % 41 != 0)
    flagged = dedup.decontaminate(train, ev, k=3).select("doc_id")
    kept = train.join(flagged, "doc_id", "left_anti")
    norm = normalize_text(F.col("text"))
    scored = kept.select(
        "doc_id",
        "lang",
        F.size(F.split(norm, " ")).alias("n_tokens"),
        F.md5(norm).alias("fp"),
    ).filter(F.col("n_tokens") >= 20)
    w = W_.partitionBy("fp").orderBy("doc_id")
    deduped = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "fp")
    )
    return traindata.split_train_test(deduped).select(
        "doc_id", "lang", "n_tokens", "split"
    )


def clean_corpus(docs: DataFrame) -> DataFrame:
    """The pipeline_clean_corpus composition over ANY (doc_id, text, lang)
    frame — factored out so the scale harness (tools/bench_scale.py) runs the
    identical plan on a 10x synthetic corpus."""
    from pyspark.sql import Window as W_

    from pyiceberg_lakehouse_spark.operators import traindata
    from pyiceberg_lakehouse_spark.operators.dedup import normalize_text

    norm = normalize_text(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(norm, " ")).alias("n_tokens"),
        F.md5(norm).alias("fp"),
    )
    filtered = scored.filter(
        (F.col("n_tokens") >= 20) & F.col("lang").isin("en", "de")
    )
    w = W_.partitionBy("fp").orderBy("doc_id")
    deduped = (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "fp")
    )
    return traindata.split_train_test(deduped).select(
        "doc_id", "lang", "n_tokens", "split"
    )


TFIDF_SQL = f"""
    with toks as (
      select doc_id, string_split({NORM}, ' ') as tk from documents
    ),
    pairs as (
      select doc_id, t.term from toks, unnest(tk) as t(term) where t.term != ''
    ),
    tf as (select doc_id, term, count(*) as tf from pairs group by 1, 2),
    dfreq as (select term, count(distinct doc_id) as df_count from pairs group by 1),
    n as (select count(distinct doc_id) as n_docs from documents),
    scored as (
      select tf.doc_id, tf.term, tf.tf, dfreq.df_count,
             round(tf.tf * ln(cast(n.n_docs as double) / dfreq.df_count), 6) as tfidf
      from tf join dfreq using (term), n
    )
    select doc_id, cast(rank as integer) as rank, term,
           cast(tf as bigint) as tf, cast(df_count as bigint) as df_count, tfidf
    from (
      select *, row_number() over (partition by doc_id order by tfidf desc, term) as rank
      from scored
    ) where rank <= 3
"""


@register("text_tfidf_top_terms", TFIDF_SQL)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive terms per document by TF-IDF: one token explode,
    map-side-combined term frequencies, broadcast vocabulary join, top-k
    window. Scores round to 6 decimals before ranking so Spark and DuckDB
    order identically despite 1-ulp ln() divergence."""
    docs = load_table(spark, sf_dir, "documents")
    out = text.tf_idf_top_terms(docs, top_n=3)
    return out.select(
        "doc_id",
        "rank",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df_count").cast("long").alias("df_count"),
        "tfidf",
    )


@register(
    "train_stratified_sample",
    f"""
    select doc_id, lang from documents
    where {HB.format(col="doc_id", n=100)} <
          case lang when 'en' then 25 when 'de' then 100 when 'zh' then 50
                    else 10 end
    """,
)
def train_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: per-language keep rates (25% en, 100% de, 50%
    zh, 10% default) selected by deterministic id hash — zero shuffles,
    rerun/append-stable membership."""
    from pyiceberg_lakehouse_spark.operators import traindata

    docs = load_table(spark, sf_dir, "documents")
    return traindata.sample_stratified(
        docs, {"en": 25, "de": 100, "zh": 50}, default_pct=10
    ).select("doc_id", "lang")


PII_SQL = """
    with aug as (
      select doc_id,
             lower(text)
               || case when doc_id % 7 = 0
                       then ' see https://site' || doc_id || '.example/page ok'
                       else '' end
               || case when doc_id % 5 = 0
                       then ' contact user' || doc_id || '@example.com now'
                       else '' end as t
      from documents
    )
    select doc_id,
           regexp_replace(regexp_replace(t, 'https?://[^ ]+', '<URL>', 'g'),
                          '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g')
             as clean_text,
           cast(len(regexp_extract_all(t, 'https?://[^ ]+')) as integer) as n_urls,
           cast(len(regexp_extract_all(
                 regexp_replace(t, 'https?://[^ ]+', '<URL>', 'g'),
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) as integer) as n_emails
    from aug
"""


@register("text_pii_scrub", PII_SQL)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a corpus with deterministically planted emails /
    URLs (so the differential exercises real redactions): URLs then emails
    redacted to typed tokens, per-doc counts reported. Pure regexp
    expressions — the training-data hygiene pass every corpus needs."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.lower(F.col("text")),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" see https://site"),
                    d.cast("string"),
                    F.lit(".example/page ok"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 5 == 0,
                F.concat(
                    F.lit(" contact user"), d.cast("string"), F.lit("@example.com now")
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return text.scrub_pii(aug)


@register(
    "text_lm_familiarity",
    f"""
    with toks as (
      select doc_id, string_split({NORM}, ' ') as tk from documents
    ),
    bi as (
      select doc_id, tk[i] as w1, tk[i + 1] as w2
      from toks, unnest(generate_series(1, len(tk) - 1)) as u(i)
    ),
    ref as (
      select w1, w2, count(*) as c12 from bi
      where doc_id % 10 < 8 group by w1, w2
    ),
    c1 as (select w1, sum(c12) as c1 from ref group by w1)
    select b.doc_id,
           count(*) as n_bigrams,
           cast(sum(case when r.c12 is null then 1 else 0 end) as bigint)
               as n_oov,
           cast(coalesce(sum(case when r.c12 is null then null
                    else (1000000 * r.c12) // c1.c1 end), 0) as bigint)
               as fam_sum
    from bi b
    left join ref r on b.w1 = r.w1 and b.w2 = r.w2
    left join c1 on b.w1 = c1.w1
    where b.doc_id % 10 >= 8
    group by b.doc_id
    """,
)
def text_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style n-gram LM quality scoring (operators/text.py::
    lm_familiarity): a bigram model trained on 80% of the corpus scores
    the held-out 20% by scaled integer conditional frequencies — the
    reference-perplexity training-data filter with every output exact
    (floor division of bigints), so the driver hash covers the whole
    train-then-score pipeline. OOV-bigram counts ride along as the
    perplexity-spike signal."""
    docs = load_table(spark, sf_dir, "documents")
    return text.lm_familiarity(
        docs.filter(F.col("doc_id") % 10 >= 8),
        docs.filter(F.col("doc_id") % 10 < 8),
    )


@register(
    "text_top_bigrams",
    f"""
    with toks as (
      select doc_id, string_split({NORM}, ' ') as tk from documents
    ),
    bi as (
      select tk[i] || ' ' || tk[i + 1] as bigram
      from toks, unnest(generate_series(1, len(tk) - 1)) as u(i)
    )
    select bigram, cast(count(*) as bigint) as n
    from bi group by bigram
    order by n desc, bigram limit 50
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 bigrams: adjacent-token pairs via a zip of the
    token array with itself shifted (one explode, no self-join), then a
    count + global top-k. The n-gram frequency table every corpus analysis
    starts with."""
    docs = load_table(spark, sf_dir, "documents")
    from pyiceberg_lakehouse_spark.operators.dedup import normalize_text

    tk = F.split(normalize_text(F.col("text")), " ")
    bigrams = docs.select(
        F.explode(
            F.zip_with(
                F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
                F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


# connected components, oracle-checked: DETERMINISTIC n-gram Jaccard edges
# (same shingle math as dedup_ngram_jaccard's oracle) + a recursive-CTE
# transitive closure in DuckDB. Near-dup groups are small and dense, so the
# closure's quadratic-in-component cost is fine at oracle scale, while the
# Spark side runs the scale algorithm (min-label propagation, one
# shuffle-join per round).
COMPONENTS_SQL = """
    with toks as (
      select doc_id, lang, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') as t from documents
    ),
    sh as (
      select distinct doc_id, lang,
             unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) as shingle
      from toks
    ),
    sizes as (select doc_id, count(*) as n_sh from sh group by 1),
    common as (
      select a.doc_id as id_a, b.doc_id as id_b, count(*) as n_common
      from sh a join sh b on a.shingle = b.shingle and a.lang = b.lang
                         and a.doc_id < b.doc_id
      group by 1, 2
    ),
    edges as (
      select id_a, id_b
      from common
      join sizes sa on sa.doc_id = id_a
      join sizes sb on sb.doc_id = id_b
      where cast(n_common as double) / cast(sa.n_sh + sb.n_sh - n_common as double) >= 0.6
    ),
    sym as (
      select id_a as src, id_b as dst from edges
      union all
      select id_b, id_a from edges
    ),
    reach as (
      with recursive reach(id, r) as (
        select src, src from sym
        union
        select reach.id, s.dst from reach join sym s on s.src = reach.r
      )
      select * from reach
    ),
    losers as (
      select id from (select id, min(r) as comp from reach group by id)
      where id != comp
    )
    select doc_id, lang from documents
    where doc_id not in (select id from losers)
"""


@register("dedup_components_exact", COMPONENTS_SQL)
def dedup_components_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dedup with a full differential gate: edges are
    DETERMINISTIC n-gram Jaccard pairs (no hash family), so DuckDB can
    rebuild the same graph and take its transitive closure with a
    recursive CTE — the iterative min-label propagation
    (dedup.connected_components) is hash-checked end-to-end, canonical
    selection included. The MinHash-pairs twin (dedup_group_components)
    stays rows-only because its edges are engine-specific; this query
    pins the component ALGORITHM itself."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.6, within="lang")
    return dedup.dedup_groups_keep_canonical(docs, pairs).select("doc_id", "lang")


@register(
    "train_mix_temperature",
    f"""
    select doc_id, cast(0 as int) as source_id from documents
    where doc_id % 2 = 0
    union all
    select doc_id, cast(1 as int) as source_id from documents
    where doc_id % 2 = 1 and {HB.format(col="doc_id", n=1000000)} < 353553
    """,
)
def train_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixing (T=2) of an 8:1-weighted pair of sources:
    rates follow w^(1/T) normalized to the head source, so the minor
    source keeps sqrt(1/8) ~ 0.3536 of its rows (the oracle hard-codes the
    same fixed-point threshold 353553 = int(0.353553.. * 1e6) the hash
    sampler uses). T=1 would reproduce proportional weighting; higher T
    flattens toward uniform."""
    from pyiceberg_lakehouse_spark.operators import traindata

    docs = load_table(spark, sf_dir, "documents")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    return traindata.mix_temperature(
        [(even, 8.0), (odd, 1.0)], temperature=2.0
    ).select("doc_id", "source_id")


# corpus-level bigram document frequency -> per-document novelty: the
# boilerplate/gibberish quality dial. df(bigram) = #docs containing it
# (DISTINCT per doc); a doc's rare_fraction is the share of its bigrams
# seen in no other document. Counts are integers and the fraction is one
# correctly-rounded division of ints < 2^53, so both engines agree bitwise.
BIGRAM_NOVELTY_SQL = """
    with toks as (
      select doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') as t
      from documents
    ),
    bg as (
      select distinct doc_id,
             unnest(list_transform(generate_series(1, greatest(len(t) - 1, 1)),
                                   i -> concat_ws(' ', t[i], t[i+1]))) as bigram
      from toks
    ),
    df_counts as (select bigram, count(*) as df from bg group by 1)
    select b.doc_id,
           cast(count(*) as bigint) as n_bigrams,
           cast(sum(case when d.df = 1 then 1 else 0 end) as bigint) as n_rare,
           cast(sum(case when d.df = 1 then 1 else 0 end) as double)
             / cast(count(*) as double) as rare_fraction
    from bg b join df_counts d on d.bigram = b.bigram
    group by b.doc_id
"""


@register("text_bigram_novelty", BIGRAM_NOVELTY_SQL)
def text_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram novelty against the corpus: explode DISTINCT
    bigrams per doc, one groupBy for corpus document frequency, join back
    (no self-join — the bigram side is the join key), and report each
    doc's count/share of corpus-unique bigrams. LOW rare_fraction flags
    boilerplate (every bigram seen elsewhere), HIGH flags
    gibberish/novel text — the corpus-statistics quality dial next to the
    per-document heuristics in text.quality_score."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
        ).alias("t"),
    )
    n = F.greatest(F.size("t") - 1, F.lit(1))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("bigram"),
    ).distinct()
    # corpus df via a count window over the bigram partition: one shuffle
    # on bigram and NO join — the aggregate-then-join-back form would
    # shuffle and materialize the exploded bigrams twice
    from pyspark.sql import Window as _W

    joined = bg.withColumn(
        "df", F.count(F.lit(1)).over(_W.partitionBy("bigram"))
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("long").alias("n_rare"),
        (
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("rare_fraction"),
    )


@register(
    "lh_ann_auto_maintain",
    """
    select vec_id as qid, cast(3 as integer) as n_results,
           true as matches_unindexed,
           'refresh' as small_append_action,
           'rebuild' as large_append_action
    from embeddings where vec_id < 10
    """,
)
def lh_ann_auto_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential proof of the health->action loop the driver can hash:
    ensure_ann_fresh must pick REFRESH after a small append and REBUILD
    after a corpus-doubling one (maintenance.py:ann_index_health
    thresholds), and after both actions the index probe must equal the
    unindexed ivf_topk twin over the full corpus with the post-action
    centroids — the maintenance policy can never cost correctness."""
    import json

    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import (
        build_ivf_index,
        ensure_ann_fresh,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    lh = Lakehouse(spark, session_tmpdir(prefix="ann_auto_"))
    t = lh.create_table("ns.embeddings_auto", emb.schema)
    t.append(emb)
    build_ivf_index(t, k=None, iters=2)  # policy-sized cells

    # small tail (~5%) -> refresh path
    t.append(
        emb.filter(F.col("vec_id") % 20 == 0).withColumn(
            "vec_id", F.col("vec_id") + 1_000_000
        )
    )
    first = ensure_ann_fresh(t)["action"]
    # corpus-doubling append -> stale fraction past the rebuild threshold
    t.append(emb.withColumn("vec_id", F.col("vec_id") + 2_000_000))
    second = ensure_ann_fresh(t)["action"]

    cents = json.loads(t.log.properties["ivf.centroids"])
    full = t.scan().select("vec_id", "embedding")
    got = similarity.ivf_index_topk(t, q, k=3, n_probe=6)
    twin = similarity.ivf_topk(full, q, cents, k=3, n_probe=6)
    a = got.groupBy("qid").agg(
        F.sort_array(F.collect_list(F.struct("rank", "vid"))).alias("res"),
        F.count("*").cast("int").alias("n_results"),
    )
    b = twin.groupBy("qid").agg(
        F.sort_array(F.collect_list(F.struct("rank", "vid"))).alias("res_twin")
    )
    return a.join(b, "qid").select(
        "qid",
        "n_results",
        (F.col("res") == F.col("res_twin")).alias("matches_unindexed"),
        F.lit(first).alias("small_append_action"),
        F.lit(second).alias("large_append_action"),
    )


@register(
    "text_chunk_overlap",
    f"""
    with toks as (select doc_id, string_split({NORM}, ' ') as t from documents),
    base as (select doc_id, t, len(t) as n from toks),
    ix as (
      select doc_id, t,
             unnest(generate_series(0,
               case when n <= 16 then 0 else (n - 16 + 11) // 12 end)) as i
      from base
    )
    select doc_id,
           cast(i as integer) as chunk_id,
           cast(len(list_slice(t, i*12 + 1, i*12 + 16)) as integer)
             as n_chunk_tokens,
           array_to_string(list_slice(t, i*12 + 1, i*12 + 16), ' ')
             as chunk_text
    from ix
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking with overlap (text.chunk_tokens): every doc
    split into 16-token windows stepping by 12 (4-token overlap), tail
    kept. Map-only — tokenize, integer-derived start sequence, posexplode,
    slice; zero shuffles at any corpus size. The oracle reproduces the
    identical integer chunk arithmetic and slicing in DuckDB."""
    return text.chunk_tokens(
        load_table(spark, sf_dir, "documents"), size=16, overlap=4
    )


@register(
    "train_numeric_profile",
    """
    with b as (
      select case when value is null then -1
                  when value = 300.0 then 9
                  when floor((value - 50.0) / 250.0 * 10) < 0 then -2
                  when floor((value - 50.0) / 250.0 * 10) >= 10 then 10
                  else cast(floor((value - 50.0) / 250.0 * 10) as integer)
             end as bucket
      from events
    )
    select cast(bucket as integer) as bucket,
           count(*) as n,
           50.0 + bucket * 25.0 as lo_edge
    from b
    group by bucket
    """,
)
def train_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dataset-profiling histogram (traindata.numeric_profile) over
    events.value with EXPLICIT bounds [50, 300) x 10 buckets, so the
    below-range (-2) and above-range (10) sentinel buckets are both
    populated and driver-hashed. The bucket index is one multiply+floor
    whose IEEE rounding DuckDB performs identically, making the histogram
    exact cross-engine; the shuffle carries n_buckets+3 rows per map task
    regardless of table size."""
    from pyiceberg_lakehouse_spark.operators.traindata import numeric_profile

    ev = load_table(spark, sf_dir, "events")
    return numeric_profile(ev, "value", n_buckets=10, lo=50.0, hi=300.0)


@register(
    "text_bpe_pair_stats",
    r"""
    with words as (
      select word, count(*) as cnt
      from (select unnest(string_split_regex(text, '\s+')) as word
            from documents)
      where length(word) > 0
      group by word
    )
    select substr(word, i, 1) as left_sym,
           substr(word, i + 1, 1) as right_sym,
           cast(sum(cnt) as bigint) as pair_freq
    from words, unnest(range(1, length(word))) as t(i)
    where length(word) >= 2
    group by 1, 2
    """,
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iteration 0 of the distributed BPE learner (operators/bpe.py),
    driver-hash-checkable: word-frequency-weighted adjacent character-pair
    counts — the statistic every merge decision ranks on. The full
    iterative learner is the rows-only twin ``text_bpe_learn`` (its loop
    isn't one SQL statement), pinned merge-for-merge against a driver-side
    reference implementation in tests/test_bpe.py."""
    from pyiceberg_lakehouse_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    return bpe.pair_stats(docs)


@register("text_bpe_learn")
def text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary learning (operators/bpe.py): 16 merges
    over the corpus's word-frequency table, one JVM-side pair-count
    aggregation + codegen'd array fold per merge. Deterministic
    (lexicographic tie-break) but inherently iterative, so rows-only for
    the driver; exactness vs a reference learner is pytest-pinned."""
    from pyiceberg_lakehouse_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.learn_bpe(docs, num_merges=16)
    return bpe.merges_df(spark, merges)


@register("text_bpe_tokenize")
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword tokenization with a corpus-learned BPE vocabulary: learn 16
    merges, then tokenize every document (Arrow-batched pandas UDF with a
    per-batch word cache). Returns per-doc token statistics — the real
    token budget, replacing the regex pre-tokenizer ESTIMATE
    (text_subword_tokens) with the learned-vocab count."""
    from pyiceberg_lakehouse_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.learn_bpe(docs, num_merges=16)
    tok = bpe.apply_bpe(docs, merges)
    return tok.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct_tokens"),
        F.element_at("tokens", 1).alias("first_token"),
    )


@register(
    "dedup_semantic",
    "select vec_id, label from embeddings",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (operators/dedup.py::semantic_dedup):
    learned k-means clusters as the blocking key, exact cosine within
    clusters, keep-lowest-id per near-dup group.

    Driver-hashable by construction: the corpus is the embeddings table
    UNION an exact copy of every 5th vector under a shifted id. Identical
    vectors always co-assign (so the method's only recall limit — pairs
    straddling a cluster boundary — cannot apply), every planted copy
    pairs with its original at cosine 1 and loses the keep-lowest-id rule,
    and the corpus's own pairs top out near cosine 0.51 (verified), far
    under the 0.97 threshold. The output must therefore equal the original
    table EXACTLY — the oracle states it closed-form, and a hash match
    proves the whole cluster->pair->component->keep pipeline removes the
    planted duplicates and nothing else."""
    from pyiceberg_lakehouse_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(planted)
    return semantic_dedup(corpus, threshold=0.97).select("vec_id", "label")


RANGE_SEARCH_SQL = f"""
    with q as (select vec_id as qid, embedding as q_vec from embeddings where vec_id < 10),
    c as (select vec_id as vid, embedding as c_vec from embeddings),
    scored as (
      select qid, vid,
             {DOT.format(a="q_vec", b="c_vec")}
               / (sqrt({DOT.format(a="q_vec", b="q_vec")})
                  * sqrt({DOT.format(a="c_vec", b="c_vec")})) as score
      from q, c where qid != vid
    )
    select qid, vid, score from scored where score >= 0.3
"""


@register("sim_range_search", RANGE_SEARCH_SQL)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine range search (operators/similarity.py::range_search):
    radius-bounded retrieval, FAISS range_search semantics. Queries
    broadcast, the corpus scans once with no shuffle and no per-query
    window; decimal-exact scores hash-match the DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.range_search(
        emb, emb.filter(F.col("vec_id") < 10), radius=0.3
    )


@register(
    "train_epoch_shards",
    f"""
    with h as (
      select doc_id, lang,
             ('0x' || substr(md5(cast(doc_id as varchar) || ':3'), 1, 15))::bigint as ek
      from documents
    )
    select doc_id, lang,
           cast(ek % 8 as int) as shard,
           cast(row_number() over (partition by ek % 8 order by ek, doc_id) as bigint) as pos
    from h
    """,
)
def train_epoch_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch shuffle sharding
    (operators/traindata.py::epoch_shards): reproducible training order
    with no RNG state — shard and in-shard position are pure functions of
    (id, epoch), ranked within shards so the window scales out. The oracle
    rebuilds the identical order from the portable md5 key."""
    from pyiceberg_lakehouse_spark.operators import traindata

    docs = load_table(spark, sf_dir, "documents")
    out = traindata.epoch_shards(docs, epoch=3, n_shards=8)
    return out.select("doc_id", "lang", "shard", F.col("pos").cast("long").alias("pos"))


@register(
    "lh_ann_range_selfcheck",
    """
    select vec_id as qid, true as matches_unindexed
    from embeddings where vec_id < 10
    """,
)
def lh_ann_range_selfcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential proof of INDEXED range search the driver can hash
    (similarity.ivf_index_range_search): per query, the persisted-index
    path (stored ivf_cell + file pruning) must return EXACTLY the result
    set of an unindexed range search restricted to the same probed cells
    (fresh ivf_assign with the stored centroids). Queries with empty
    result sets match vacuously, so every qid yields a row and the oracle
    is closed-form."""
    import json

    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import build_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    lh = Lakehouse(spark, session_tmpdir(prefix="ann_rng_"))
    t = lh.create_table("ns.embeddings_rng", emb.schema)
    t.append(emb)
    build_ivf_index(t, k=16, iters=2)
    cents = json.loads(t.log.properties["ivf.centroids"])

    got = similarity.ivf_index_range_search(t, q, radius=0.3, n_probe=4)
    # twin: same probed-cell restriction, derived by re-assigning the RAW
    # corpus with the stored centroids — no index structures involved
    import numpy as np

    qids, Q = similarity._collect_queries(q, "vec_id", "embedding", dim=len(cents[0]))
    IC = np.array(cents, dtype=np.float64)
    probed = sorted(
        {int(c) for row in np.argsort(-(Q @ IC.T), axis=1)[:, :4] for c in row}
    )
    assigned = similarity.ivf_assign(emb, cents).filter(
        F.col("ivf_cell").isin(probed)
    )
    twin = similarity.range_search(assigned, q, radius=0.3)

    a = got.groupBy("qid").agg(F.sort_array(F.collect_list("vid")).alias("res"))
    b = twin.groupBy("qid").agg(
        F.sort_array(F.collect_list("vid")).alias("res_twin")
    )
    base = q.select(F.col("vec_id").alias("qid"))
    return (
        base.join(a, "qid", "left")
        .join(b, "qid", "left")
        .select(
            "qid",
            F.col("res").eqNullSafe(F.col("res_twin")).alias("matches_unindexed"),
        )
    )


@register(
    "train_split_leakage_safe",
    f"""
    with fp as (
      select doc_id, lang,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) as f
      from documents
    ),
    canon as (select f, min(doc_id) as c from fp group by f)
    select fp.doc_id, fp.lang,
           case when {HB.format(col="c", n=100)} < 10 then 'test'
                else 'train' end as split
    from fp join canon using (f)
    """,
)
def train_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split
    (operators/traindata.py::split_leakage_safe): the split hashes the
    duplicate group's CANONICAL id, so exact copies of a document can
    never straddle train and test — the memorization-leak hole a row-id
    split leaves open. Oracle rebuilds the fingerprint -> canonical ->
    bucket pipeline closed-form."""
    from pyiceberg_lakehouse_spark.operators import traindata

    docs = load_table(spark, sf_dir, "documents")
    return traindata.split_leakage_safe(docs).select("doc_id", "lang", "split")


RAG_PREP_SQL = f"""
    with fp as (
      select doc_id, {NORM} as norm,
             md5({NORM}) as f
      from documents where n_chars >= 150
    ),
    keep as (
      select fp.doc_id, fp.norm
      from fp join (select f, min(doc_id) as mn from fp group by f) c
        on fp.f = c.f and fp.doc_id = c.mn
    ),
    base as (select doc_id, string_split(norm, ' ') as t,
                    len(string_split(norm, ' ')) as n from keep),
    ix as (
      select doc_id, t,
             unnest(generate_series(0,
               case when n <= 16 then 0 else (n - 16 + 11) // 12 end)) as i
      from base
    ),
    chunks as (
      select doc_id * 100000 + i as ck,
             list_slice(t, i*12 + 1, i*12 + 16) as ct
      from ix
    ),
    ctoks as (select ck, unnest(ct) as token from chunks),
    tf as (select ck, token, count(*) as tf from ctoks group by 1, 2),
    dl as (select ck, count(*) as doc_len from ctoks group by 1),
    stats as (
      select cast(count(*) as double) as n_docs, avg(doc_len) as avgdl from dl
    ),
    dfq as (
      select token, cast(count(distinct ck) as double) as df
      from tf where token in ('merge', 'window') group by 1
    ),
    w as (
      select tf.ck,
             ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2)
               / (tf + 1.2 * (0.25 + 0.75 * doc_len / avgdl)) as wt
      from tf join dfq using (token) join dl using (ck) cross join stats
    ),
    s as (select ck, round(sum(wt), 6) as score from w group by 1),
    r as (
      select ck, score,
             row_number() over (order by score desc, ck) as rank
      from s
    )
    select ck as chunk_key, score, rank from r where rank <= 10
"""


@register("pipeline_rag_prep", RAG_PREP_SQL)
def pipeline_rag_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG corpus preparation, driver-hashable: quality floor ->
    exact dedup (keep-canonical) -> overlapping token-window chunking ->
    chunks ingested into a lakehouse table -> inverted index built ->
    Okapi BM25 top-10 chunks for a query. Every stage is an
    already-audited component (traindata fingerprints, text.chunk_tokens,
    lakehouse/text_index.py); this composite proves they compose into the
    retrieval pipeline a user would actually run, and the oracle rebuilds
    the WHOLE pipeline — dedup through ranking — in SQL."""
    from pyspark.sql import types as T

    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.text_index import (
        bm25_topk,
        create_text_index,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= 150
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    with_fp = docs.select(
        "doc_id", norm.alias("norm"), F.md5(norm).alias("_fp")
    )
    canon = with_fp.groupBy("_fp").agg(F.min("doc_id").alias("_mn"))
    kept = with_fp.join(
        canon,
        (with_fp._fp == canon._fp) & (with_fp.doc_id == canon._mn),
    ).select("doc_id", F.col("norm").alias("text"))
    chunks = text.chunk_tokens(kept, size=16, overlap=4)
    ctab = chunks.select(
        (F.col("doc_id") * 100000 + F.col("chunk_id")).alias("chunk_key"),
        "chunk_text",
    )
    lh = Lakehouse(spark, session_tmpdir(prefix="rag_prep_"))
    t = lh.create_table(
        "ns.rag_chunks",
        T.StructType(
            [
                T.StructField("chunk_key", T.LongType()),
                T.StructField("chunk_text", T.StringType()),
            ]
        ),
    )
    t.append(ctab)
    idx = create_text_index(
        lh, t, "ns.rag_chunks_idx", text_col="chunk_text", id_col="chunk_key"
    )
    return bm25_topk(idx, ["merge", "window"], k=10).select(
        F.col("doc_id").alias("chunk_key"), "score", "rank"
    )
