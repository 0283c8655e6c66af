"""Training-data preparation operators: deterministic splits, label
balancing, weighted source mixing, and sequence packing.

The ops a large-scale LLM data pipeline runs after cleaning/dedup and
before tokenized shards. Everything is DETERMINISTIC — no RNG state — so
reruns, retries, and incremental rebuilds produce identical assignments:
randomness comes from an md5-derived hash bucket that is portable across
engines (Spark ``conv(substr(md5(x),1,15),16,10)`` equals DuckDB
``('0x' || substr(md5(x),1,15))::bigint``), which is what lets the oracle
check split membership value-for-value.

Scale posture: split/balance/mix are pure Catalyst expressions (hash, window
rank) — no shuffle beyond what the semantics require (balance needs one
window per label). Packing is an applyInPandas over hash-bucketed groups:
each group packs independently, so the operation parallelizes by bucket and
never materializes a global order.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: F.Column | str, n_buckets: int = 100) -> F.Column:
    """Deterministic, engine-portable bucket in [0, n_buckets) from md5."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
        % n_buckets
    )


def split_train_test(
    df: DataFrame, id_col: str = "doc_id", test_pct: int = 10
) -> DataFrame:
    """Add a ``split`` column ('train'/'test') by hashed id.

    Hash-based (not row-number-based) so membership is stable under
    repartitioning, appends, and reruns — a document never migrates between
    splits when the corpus grows."""
    b = hash_bucket(id_col, 100)
    return df.withColumn(
        "split", F.when(b < test_pct, F.lit("test")).otherwise(F.lit("train"))
    )


def balance_labels(
    df: DataFrame, label_col: str = "lang", id_col: str = "doc_id"
) -> DataFrame:
    """Downsample every label to the minority class size.

    Selection is by hash order (then id for total determinism), so the kept
    subset is an unbiased, rerun-stable sample of each label. One window
    rank per label partition + a broadcast scalar min — two shuffles total,
    independent of label skew."""
    w = Window.partitionBy(label_col).orderBy(hash_bucket(id_col, 1_000_000), id_col)
    counts = df.groupBy(label_col).agg(F.count("*").alias("n"))
    min_n = counts.agg(F.min("n").alias("m"))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(min_n))
        .filter(F.col("_rk") <= F.col("m"))
        .drop("_rk", "m")
    )


def sample_stratified(
    df: DataFrame,
    fractions: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_pct: int = 0,
) -> DataFrame:
    """Stratified sampling: keep ``fractions[stratum]`` percent of each
    stratum, selected by deterministic id hash — no RNG state, membership
    stable under reruns/appends/repartitioning (the same guarantee as
    split_train_test, per stratum).

    One narrow filter expression, zero shuffles: the per-stratum rate is a
    CASE over the stratum column against the shared hash bucket.
    """
    b = hash_bucket(id_col, 100)
    rate = F.lit(default_pct)
    for stratum, pct in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter(b < rate)


def mix_weighted(
    sources: list[tuple[DataFrame, float]], id_col: str = "doc_id"
) -> DataFrame:
    """Mix corpora at per-source sampling rates (0 < rate <= 1).

    ``[(df, 0.5), (df2, 1.0)]`` keeps a deterministic-hash half of source 0
    and all of source 1, tagging each row's ``source_id``. The mix is
    reproducible and incremental: new rows in a source join the sample at
    the same rate with no reshuffling of old membership."""
    parts = []
    for i, (df, rate) in enumerate(sources):
        if not 0 < rate <= 1:
            raise ValueError(f"rate {rate} for source {i} not in (0, 1]")
        sampled = df.filter(hash_bucket(id_col, 1_000_000) < int(rate * 1_000_000))
        parts.append(sampled.withColumn("source_id", F.lit(i)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


PACK_SCHEMA = "doc_id long, n_tokens long, pack_group int, bin_id long"


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_groups: int = 64,
) -> DataFrame:
    """Greedy sequence packing: assign documents to bins of <= max_tokens.

    Documents are hash-assigned to ``n_groups`` independent pack groups;
    within a group, a first-fit-by-id-order pass (Arrow-batched pandas,
    sequential by necessity — packing is order-dependent) fills bins.
    Bin ids are globally unique as (pack_group, local bin) pairs. A doc
    longer than max_tokens gets a bin of its own rather than being dropped.

    At 100 TB: groups pack in parallel (n_groups ~ cluster cores); the
    per-group state is one running counter, so memory is O(batch), and the
    whole operation is one shuffle (the groupBy).
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, used, cur = [], 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if used > 0 and used + t > max_tokens:
                cur += 1
                used = 0
            bins.append(cur)
            used += t
            if used >= max_tokens:  # exactly full (or oversized doc): close
                cur += 1
                used = 0
        out = pdf[[id_col, token_col, "pack_group"]].copy()
        out["bin_id"] = [b * n_groups + int(pdf["pack_group"].iloc[0]) for b in bins]
        return out

    grouped = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(token_col).cast("long").alias(token_col),
        hash_bucket(id_col, n_groups).cast("int").alias("pack_group"),
    )
    return grouped.groupBy("pack_group").applyInPandas(pack, PACK_SCHEMA)


def mix_temperature(
    sources: list[tuple[DataFrame, float]],
    temperature: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled corpus mixing (multilingual-LM practice): source
    sampling rates follow ``w_i^(1/T)``, normalized so the largest-weight
    source keeps rate 1.0 — ``T=1`` reproduces proportional weighting,
    ``T -> inf`` flattens toward uniform, ``T < 1`` sharpens toward the
    head source. Rates feed :func:`mix_weighted`, so membership stays the
    same deterministic hash sample (reproducible, incremental — raising T
    later only ADDS rows to the smaller sources' samples).
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if any(w <= 0 for _, w in sources):
        raise ValueError("source weights must be > 0")
    scaled = [w ** (1.0 / temperature) for _, w in sources]
    top = max(scaled)
    return mix_weighted(
        [(df, s / top) for (df, _), s in zip(sources, scaled)], id_col
    )


def numeric_profile(
    df: DataFrame,
    col: str,
    n_buckets: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Dataset-profiling histogram of a numeric column: one row per bucket
    with exact counts, plus distinct sentinel rows for NULLs (bucket -1),
    below-range values (bucket -2, only reachable with an explicit ``lo``),
    and above-range values (bucket n, only reachable with an explicit
    ``hi``). Bounds default to the observed min/max (one tiny agg —
    metadata-cheap next to the scan itself). ``lo_edge`` is meaningful for
    real buckets 0..n-1 only.

    Bucketing is ``floor((x - lo) / (hi - lo) * n)`` — a single
    multiply+floor whose IEEE rounding every engine performs identically,
    so the histogram is EXACT cross-engine (unlike quantile-sketch
    profiles). One groupBy; at 100 TB the shuffle carries n_buckets+3 rows
    per map task.
    """
    c = F.col(col).cast("double")
    if lo is None or hi is None:
        b = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
        lo = float(b["lo"]) if lo is None else lo
        hi = float(b["hi"]) if hi is None else hi
    span = (hi - lo) or 1.0
    raw = F.floor((c - F.lit(lo)) / F.lit(span) * n_buckets).cast("int")
    bucket = (
        F.when(c.isNull(), F.lit(-1))
        # values exactly at hi land in the last real bucket, not overflow
        .when(c == F.lit(hi), F.lit(n_buckets - 1))
        .when(raw < 0, F.lit(-2))  # below explicit lo — NOT the NULL bucket
        .when(raw >= n_buckets, F.lit(n_buckets))  # above explicit hi
        .otherwise(raw)
    )
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("lo_edge", F.lit(lo) + F.col("bucket") * F.lit(span / n_buckets))
    )


def epoch_shards(
    df: DataFrame,
    epoch: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch global shuffle for training data loaders:
    every row gets a ``shard`` and a dense ``pos`` within it, both pure
    functions of (id, epoch) — a different but fully reproducible order
    each epoch, identical across reruns, engines and cluster sizes (the
    training-run resumability property).

    The order key is the portable md5 hash of ``id || ':' || epoch``
    (engine-portable like every sampling decision in this module), so no
    RNG state exists anywhere. Positions are ranked WITHIN shards — a
    window partitioned by shard, which scales out — never a global
    row_number; loaders consume shard files in (shard, pos) order.
    """
    c = F.col(id_col).cast("string")
    h = F.conv(
        F.substring(
            F.md5(F.concat(c, F.lit(":"), F.lit(str(epoch)))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    from pyspark.sql import Window as W

    shard = (h % n_shards).cast("int")
    out = df.withColumn("_ek", h).withColumn("shard", shard)
    w = W.partitionBy("shard").orderBy(F.col("_ek"), F.col(id_col))
    return out.withColumn("pos", F.row_number().over(w)).drop("_ek")


def split_leakage_safe(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    test_pct: int = 10,
) -> DataFrame:
    """Train/test split that cannot leak duplicated content: the split
    decision hashes the duplicate GROUP's canonical id (min id sharing the
    normalized-text md5 fingerprint), not the row's own id — so every copy
    of a document lands in the SAME split. Splitting on row ids instead
    puts one copy in train and another in test, and the eval score
    measures memorization; this is the standard leakage hole exact-dedup
    fingerprinting closes.

    One fingerprint groupBy (partial-combining) + one fingerprint-keyed
    join — both AQE-skew-splittable; no per-row Python.
    """
    from pyspark.sql import Window as W

    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    ).alias("_fp")
    with_fp = df.withColumn("_fp", fp)
    canon = with_fp.groupBy("_fp").agg(F.min(id_col).alias("_canon"))
    out = with_fp.join(canon, "_fp")
    bucket = hash_bucket(F.col("_canon"), 100)
    return (
        out.withColumn(
            "split", F.when(bucket < test_pct, "test").otherwise("train")
        )
        .drop("_fp", "_canon")
    )
