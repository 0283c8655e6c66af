"""Document deduplication: exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine.

All variants stay in Catalyst expressions (split/transform/explode/groupBy) —
no Python UDFs — so they are JVM-side, codegen'd, and shuffle only on compact
keys (fingerprints, shingles, band hashes). The 100 TB posture for near-dup
is always candidate-generation-by-bucketing (band hash equality) followed by
exact verification on candidates only; the O(n^2) all-pairs path exists only
as a small-data oracle/recall baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^31 - 1 (prime). Shingle hashes are first folded mod MERSENNE so the
# a*h + b universal-hash family below never overflows a 64-bit long.
MERSENNE = 2_147_483_647


def normalize_text(col: F.Column) -> F.Column:
    """Lowercase + collapse whitespace — the canonical dedup key."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content fingerprint; keeps the smallest id per group.

    Hash-groupBy on a 128-bit fingerprint: one shuffle of (fingerprint, id)
    pairs — bytes shuffled are O(docs * 48B) regardless of document size.
    """
    return (
        df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups"))
    )


def word_shingles(tokens: F.Column, k: int = 3) -> F.Column:
    """Distinct k-word shingles from a token-array column.

    IMPORTANT: pass a materialized token COLUMN, not an inline
    split(regexp(...)) expression — Catalyst substitutes lambda bodies
    textually, so an inline expression would re-tokenize the document for
    every element_at (k x shingles x docs regexp evaluations).
    """
    # try_element_at: a document SHORTER than k tokens yields one shortened
    # shingle (out-of-range positions read NULL, concat_ws skips them) —
    # the same semantics as the DuckDB oracle's t[i], where plain
    # element_at under ANSI mode would fail the whole job on a short doc
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(tokens) - k, F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(tokens, i + j + 1) for j in range(k)]
            ),
        )
    )


def _shingle_hash(col: F.Column) -> F.Column:
    """Deterministic 60-bit shingle hash: md5 -> hex prefix -> long.

    Engine-portable (the DuckDB twin is ('0x'||substr(md5(s),1,15))::ubigint),
    unlike murmur/xxhash which differ across engines.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exploded_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, shingle) pairs, distinct per document."""
    toks = df.select(
        F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("_toks")
    )
    return toks.select(F.col(id_col), F.explode(word_shingles(F.col("_toks"), k)).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    within: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all co-shingled pairs.

    Shingle-inverted-index join: pairs sharing no shingle are never
    materialized, so the cross join is avoided; still O(sum of per-shingle
    doc-frequency^2) — use MinHash-LSH at scale, this as its verifier.
    Jaccard = |A∩B| / (|A|+|B|-|A∩B|), computed from exact int counts so the
    double result is bit-identical across engines.
    """
    sh = exploded_shingles(df, text_col, id_col, k)
    if within:
        sh = sh.join(F.broadcast(df.select(id_col, within)), id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    join_keys = ["shingle"] + ([within] if within else [])
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    common = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Flag training documents that share >= ``min_hits`` distinct k-word
    shingles with an evaluation set — n-gram eval-set decontamination (the
    GPT-3/PaLM recipe; k of 8-13 words is the published operating range,
    smaller k for short documents). Returns (id, n_contaminated) per
    flagged training doc; anti-join the result against the corpus to drop
    them.

    100 TB posture: the eval set is small BY DEFINITION, so its distinct
    shingle set broadcasts — the training corpus is scanned ONCE, exploded
    to (id, shingle), hash-joined against the broadcast set, and reduced
    map-side; no self-join, no shuffle of document text, cost linear in
    the training corpus. Contrast with dedup (train x train), where the
    banded-LSH candidate join is required; train x eval never needs it.
    """
    ev = (
        exploded_shingles(eval_df, text_col, id_col, k)
        .select("shingle")
        .distinct()
    )
    tr = exploded_shingles(train, text_col, id_col, k)
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
        .filter(F.col("n_contaminated") >= min_hits)
    )


def duplicated_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-substring coverage per document: the fraction of
    each document's tokens lying inside a k-token span that occurs
    >= ``min_count`` times anywhere in the corpus (including repeats
    within the same document) — the substring-level dedup signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (suffix-array ExactSubstr), re-expressed relationally: a
    token position is covered iff some duplicated k-gram starts within
    the previous k positions, and the union length of equal-length
    intervals needs no gaps-and-islands pass — sorted duplicate starts
    p_1 < p_2 < ... contribute sum(least(k, p_i - p_{i-1})) with the
    first start contributing k.

    Returns (id, n_tokens, dup_tokens, dup_frac) for EVERY document.

    100 TB posture: one explode to (md5(k-gram), position) pairs — k-grams
    ship as 32-byte hashes, never text; the duplicate-k-gram groupBy
    partial-aggregates map-side; the occurrence->duplicate-set join is a
    hash join on the k-gram hash (AQE-skewable, broadcastable when the
    duplicate set is small); the coverage pass is ONE per-document window
    exchange. No suffix array, no self-join, no all-pairs.
    """
    toks = df.select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    base = toks.select(
        F.col(id_col), F.size("_toks").cast("long").alias("n_tokens")
    )
    # start positions are 1-based; a doc shorter than k tokens has no
    # k-grams (the CASE guards Spark's descending sequence(1, 0) trap)
    kg = toks.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(CASE WHEN size(_toks) >= {k} THEN"
                f" sequence(1, size(_toks) - {k} + 1) ELSE"
                " array() END,"
                f" i -> md5(concat_ws(' ', slice(_toks, i, {k}))))"
            )
        ).alias("_p0", "h"),
    ).select(F.col(id_col), (F.col("_p0") + 1).alias("p"), "h")
    dup = (
        kg.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("h")
    )
    starts = kg.join(dup, "h").select(id_col, "p")
    w = Window.partitionBy(id_col).orderBy("p")
    cov = (
        starts.withColumn(
            "_add",
            F.least(F.lit(k).cast("long"), F.coalesce(F.col("p") - F.lag("p").over(w), F.lit(k).cast("long"))),
        )
        .groupBy(id_col)
        .agg(F.sum("_add").alias("dup_tokens"))
    )
    return (
        base.join(cov, id_col, "left")
        .withColumn("dup_tokens", F.coalesce(F.col("dup_tokens"), F.lit(0).cast("long")))
        .withColumn(
            "dup_frac",
            F.col("dup_tokens").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 3,
) -> DataFrame:
    """MinHash signatures via a deterministic universal-hash family.

    h_i(x) = (a_i * x + b_i) mod p over the folded shingle hash. Computed as
    one explode + groupBy(min per hash) — shuffle carries (id, 32 longs), not
    text. Seeds are fixed constants so runs are reproducible.
    """
    sh = exploded_shingles(df, text_col, id_col, k)
    h = (_shingle_hash(F.col("shingle")) % MERSENNE).alias("h")
    sh = sh.select(id_col, h)
    # deterministic LCG-derived coefficients; a_i odd and nonzero.
    # Built as one SQL string per aggregate (one py4j round-trip each)
    # instead of nested Column operators (~25 round-trips each): the
    # parsed AST is the same expression — long-literal coefficients
    # times the long hash, mod the Mersenne prime — so signatures are
    # byte-identical; plan construction drops ~0.6 s per build.
    mins = [
        F.expr(
            f"min(({_coef(i, 1)}L * h + {_coef(i, 2)}L) % {MERSENNE}L)"
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*mins)


def _coef(i: int, salt: int) -> int:
    # splitmix-style constant scrambling, reproducible with no RNG state
    x = (i * 2_654_435_761 + salt * 40_503 + 12_345) % MERSENNE
    return x * 2 + 1  # odd, in [1, 2p)


def banded_signature_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    checkpoint_signatures: bool = False,
) -> DataFrame:
    """(id, band, bh) rows: the MinHash signature folded to one md5
    bucket key per band — THE banding construction, shared by the ad-hoc
    LSH pair join (minhash_lsh_pairs) and the persisted incremental
    index (lakehouse/neardup.py), so the two can never drift apart on
    hash family, fold separator, or band split: identical text produces
    byte-identical band keys through either path."""
    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k)
    if checkpoint_signatures:
        sig = sig.localCheckpoint(eager=False)
    # one parsed SQL string per band (see the mins comment above): the
    # md5(concat_ws(...)) fold is unchanged — concat_ws stringifies the
    # long signature columns identically through either construction
    band_cols = [
        F.expr(
            "struct({bi} as band, md5(concat_ws(',', {cols})) as bh)".format(
                bi=bi,
                cols=", ".join(f"mh_{bi * rows + r}" for r in range(rows)),
            )
        )
        for bi in range(bands)
    ]
    return sig.select(id_col, F.explode(F.array(*band_cols)).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    verify_threshold: float | None = 0.5,
    checkpoint_signatures: bool = True,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows; a pair
    is a candidate iff some band hashes equal — a self-join on (band_idx,
    band_hash), never an all-pairs product. With ``verify_threshold`` set,
    candidates are re-checked with exact Jaccard (on candidates only).
    """
    # checkpoint_signatures=True (default): the round-6 A/B — the first
    # clean one: explicit flag on both arms plus an untimed warmup so
    # neither arm rides the other's page cache (the r5 "checkpoint loses"
    # numbers compared the same no-checkpoint code against itself, cold vs
    # warm) — shows checkpointing the signatures WINS at 100k docs and ties
    # at 1M. ReusedExchange does share the signature shuffle across the
    # band self-join's two sides, but the checkpoint also cuts the lineage
    # replayed by the verify stage's second pass over the pairs. See
    # BENCH_SCALE.json keys minhash_ckpt_100k vs minhash_nockpt_100k and
    # minhash_ckpt_1000k vs minhash_nockpt_1000k (numbers live in the json,
    # not here, so they cannot go stale — tests/test_advice_fixes.py
    # asserts the cited keys exist). The flag remains so the harness keeps
    # the comparison honest round over round.
    banded = banded_signature_rows(
        df, text_col, id_col, num_hashes, bands, k,
        checkpoint_signatures=checkpoint_signatures,
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bh")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # checkpoint the PAIRS (never the corpus): verify_pairs_jaccard consumes
    # them twice (candidate-doc semi-join + the pair join) and the candidate
    # set is orders of magnitude smaller than the corpus
    return verify_pairs_jaccard(
        df, cand.localCheckpoint(eager=False), text_col, id_col, k, verify_threshold
    )


def verify_pairs_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard, computed ONLY for the given candidate pairs.

    This is the scale-critical half of LSH dedup: work is O(candidates x
    shingles-per-doc), never O(all-pairs) — and never O(corpus) either: the
    corpus is first semi-joined down to documents that appear in some pair,
    so the shingle re-explode and the (pair, shingle) intersection join
    touch only candidate documents (measured at 1M docs: verification went
    from re-shingling all 1M to ~the 10% that had a candidate). Shingle
    sets attach to each side of the pair by id join; the intersection count
    is an equi-join on (pair, shingle).
    """
    cand_ids = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    df = df.join(cand_ids, id_col, "left_semi")
    # NOTE (r19, examined + left alone): this frame feeds FOUR subtrees
    # (sh_a, sh_b, and sizes twice via sa/sb) and the executed plan
    # shows 0 ReusedExchange — the candidate semi-join + shingle
    # explode genuinely re-runs four times. localCheckpoint-ing sh and
    # sizes was A/B'd interleaved and LOST at both scales (sf0.1:
    # 2.19 vs 2.11 s; 100k mock docs: 3.99 vs 3.76 s): the four
    # subtrees pipeline concurrently inside one job wave, while the
    # checkpoint serializes a materialization job ahead of them. The
    # recompute is candidate-scoped either way (LSH keeps candidates
    # orders of magnitude below the corpus), so this stays lazy.
    sh = exploded_shingles(df, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """SimHash fingerprints: sign of per-bit vote over token hashes.

    Explode tokens once; each token contributes +-1 to each bit from its
    60-bit hash; the aggregate sign vector packs back into one long. All
    arithmetic is long/bit ops inside codegen.
    """
    tokens = df.select(
        F.col(id_col), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok")
    )
    h = _shingle_hash(F.col("tok"))
    votes = tokens.select(id_col, *[
        (F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(bits)
    ])
    agg = votes.groupBy(id_col).agg(*[F.sum(f"b{b}").alias(f"b{b}") for b in range(bits)])
    packed = agg.select(
        F.col(id_col),
        sum(
            [F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b)).otherwise(0) for b in range(63)],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return packed


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", band_bits: int = 16
) -> DataFrame:
    """Candidate near-dups: equal 16-bit SimHash band (Hamming<=3 heuristic)."""
    sh = simhash(df, text_col, id_col)
    bands = sh.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("simhash", i * band_bits).bitwiseAND(F.lit((1 << band_bits) - 1)).alias("bh"),
                )
                for i in range(64 // band_bits)
            ])
        ).alias("b"),
    ).select(id_col, "b.band", "b.bh")
    a = bands.select(F.col(id_col).alias("id_a"), "band", "bh")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"]).filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster near-duplicate PAIRS into duplicate GROUPS: connected
    components by iterative min-label propagation.

    ``(id, component)`` for every node, where component = the smallest id
    reachable from it. This is the step a real dedup pipeline runs between
    pair generation (MinHash-LSH / SimHash) and canonical-document
    selection — A~B and B~C must collapse to ONE group even though (A, C)
    was never emitted as a pair.

    Scale posture: each round is one shuffle-join + min-aggregate, both on
    the component key; rounds needed = graph diameter (near-dup graphs are
    shallow — duplicate clusters are dense, so a handful of rounds). Lineage
    is truncated every round with an eager localCheckpoint, without which
    iterative Spark plans grow until planning dominates; convergence is
    detected with a changed-label count, so the loop stops as soon as labels
    are stable rather than running max_iter blindly.
    """
    sym = edges.select(
        F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst")
    )
    sym = sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), "comp")
            .groupBy("id")
            .agg(F.min("comp").alias("n_comp"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("n_comp", "comp")).alias("comp"),
                (F.coalesce("n_comp", "comp") < F.col("comp")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    return labels


def dedup_groups_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """End-to-end near-dedup: collapse each connected duplicate group to its
    canonical (smallest-id) member; documents in no pair survive as-is."""
    comps = connected_components(pairs, src_col, dst_col)
    losers = comps.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    k_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embeddings, compare cosine
    similarity only WITHIN a cluster, and collapse each near-duplicate
    group to its lowest-id representative.

    The reference pipeline's embedding near-dedup requires a natural
    blocking key; SemDeDup LEARNS the blocks instead — clusters play the
    role LSH bands play for text. Composition of existing audited pieces:
    deterministic seeded + sample-bounded-Lloyd centroids
    (similarity.sample_centroids / kmeans_refine_local — driver state is
    cap x dim floats, never the corpus), Arrow-batched assignment
    (similarity.ivf_assign), cluster-blocked exact-cosine pairs
    (embedding_near_dup_pairs(within='ivf_cell') — never an unblocked
    all-pairs product; worst-case pair count is sum of per-cluster
    squares, ~N^1.5 under sqrt-N cells), and connected-components
    keep-canonical. Known method limit, inherited from the paper:
    near-duplicates that straddle a cluster boundary are missed —
    identical embeddings always co-assign, so exact-duplicate recall is 1.

    Returns the surviving rows of ``df`` (schema unchanged).
    """
    from pyiceberg_lakehouse_spark.operators import similarity

    if k_cells is None:
        k_cells = similarity.default_n_cells(df.count())
    cents = similarity.kmeans_refine_local(
        df,
        similarity.sample_centroids(df, k=k_cells, id_col=id_col, vec_col=vec_col),
        vec_col=vec_col,
    )
    assigned = similarity.ivf_assign(df, cents, vec_col=vec_col)
    pairs = similarity.embedding_near_dup_pairs(
        assigned,
        threshold,
        id_col=id_col,
        vec_col=vec_col,
        within="ivf_cell",
        exact=False,  # threshold consumer: the 5x-faster double fold
    )
    return dedup_groups_keep_canonical(df, pairs, id_col=id_col)


def plant_exact_duplicates(
    df: DataFrame,
    modulus: int,
    residue: int,
    id_offset: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Differential-test device shared by the planted-recall self-checks
    (dedup_simhash_selfcheck, lh_neardup_index_selfcheck,
    lh_neardup_probe_batch, stream_lh_neardup and their pytests): one
    copy of every ``id % modulus == residue`` row, id shifted by
    ``id_offset``, raw bytes perturbed (uppercased, doubled spaces) but
    NORMALIZED text identical — so any normalization-then-fingerprint
    path must pair copy with original deterministically, and an oracle
    can state the pair set closed-form. The perturbation is the
    correctness premise; keep it in exactly one place.

    The closed-form oracles hold only while every natural id stays below
    ``id_offset`` (above it, planted ids collide with natural ones and a
    natural text-equal pair can fake the verify_exact_pairs offset
    shape), so that premise is CHECKED here — a 1-row aggregate — and a
    too-large corpus fails loudly instead of corrupting the self-check."""
    max_id = df.agg(F.max(F.col(id_col)).cast("long")).collect()[0][0]
    if max_id is not None and max_id >= id_offset:
        raise ValueError(
            f"plant_exact_duplicates: max({id_col})={max_id} >= "
            f"id_offset={id_offset}; planted ids would collide with "
            "natural ids and the offset-shape oracle would be unsound — "
            "raise id_offset above the corpus id range"
        )
    return (
        df.filter(F.col(id_col) % modulus == residue)
        .withColumn(id_col, F.col(id_col) + F.lit(id_offset).cast("long"))
        .withColumn(
            text_col, F.upper(F.regexp_replace(F.col(text_col), " ", "  "))
        )
    )


def verify_exact_pairs(
    pairs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    planted_offset: int | None = 1_000_000,
) -> DataFrame:
    """Exact verification at the strictest level: keep candidate pairs
    whose normalized text is identical -> (id_a, id_b, exact_dup=true).
    The candidate-only twin of verify_pairs_jaccard for threshold 1.

    ``planted_offset`` (default: plant_exact_duplicates' id shift)
    additionally restricts output to original/copy-SHAPED pairs
    (id_b - id_a == offset). This makes the self-check oracles robust
    at ANY scale factor: a corpus that happens to contain NATURAL
    normalized-text duplicates (sf0.1 has 8 such pairs) would otherwise
    surface text-equal pairs the closed-form planted oracle cannot
    state. A natural pair can never satisfy the shape (both ids below
    the offset), and a copy pairs at exactly the offset only with its
    own original — so the filtered set equals the planted set at every
    scale, while recall through the banded index is still the claim
    being checked. Pass None to keep every text-equal pair."""
    norm = corpus.select(
        F.col(id_col).alias("_vid"), normalize_text(F.col(text_col)).alias("_vn")
    )
    na = norm.select(F.col("_vid").alias("id_a"), F.col("_vn").alias("ta"))
    nb = norm.select(F.col("_vid").alias("id_b"), F.col("_vn").alias("tb"))
    out = (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .filter(F.col("ta") == F.col("tb"))
        .select("id_a", "id_b", F.lit(True).alias("exact_dup"))
    )
    if planted_offset is not None:
        out = out.filter(F.col("id_b") - F.col("id_a") == planted_offset)
    return out
