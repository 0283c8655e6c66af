"""Synthetic data source (S14): the reference's mock dataset, distributed.

mock_dataset_gen.py:9-17 builds a 10M-row table (id int, group in {A,B,C,D},
value1 float, value2 int 1..1000) with numpy RNG on the driver. At 100 TB a
driver-side generator is a non-starter; this one is ``spark.range`` +
arithmetic, so generation is distributed, lazy, and DETERMINISTIC (an LCG on
the row id replaces the unseeded numpy RNG — reproducible runs, and an
ANSI-SQL twin can generate the identical table for the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.registry import register

_GRP = "substr('ABCD', cast((id * 1103515245 + 12345) % 2147483648 % 4 as int) + 1, 1)"
_V1 = "((id * 16807 + 7) % 2147483647) / 2147483647.0 * 100.0"
_V2 = "cast((id * 48271 + 11) % 2147483647 % 1000 + 1 as int)"


def mock_dataset(spark: SparkSession, num_rows: int = 10_000_000) -> DataFrame:
    """The reference's 4-column mock table, generated in parallel."""
    return spark.range(num_rows).select(
        F.col("id").cast("int").alias("id"),
        F.expr(_GRP).alias("group"),
        F.expr(_V1).cast("float").alias("value1"),
        F.expr(_V2).alias("value2"),
    )


# ---------------------------------------------------------------------------
# Scale-test corpora (tools/bench_scale.py): deterministic documents and
# clustered embeddings at ANY row count, generated distributed (spark.range +
# hash expressions — no driver-side data, no RNG state). The shapes mirror
# /root/testdata documents.parquet / embeddings.parquet so the same operators
# run unchanged at 10-100x the sf0.1 sizes.

_VOCAB = (
    "spark table query scan column row value batch part line order sort fast "
    "small agg join group filter read write file block cache hash merge split "
    "index store vector text token count range shuffle stage plan code page "
    "byte key pair list map set tree node edge path graph slot tick span mark "
    "seed gate lane rank tier fold wrap clip trim pad"
).split()


def mock_documents(spark: SparkSession, num_rows: int) -> DataFrame:
    """(doc_id, text, lang) word-salad corpus with planted near-duplicates.

    Every 20th id (id % 20 == 1) re-generates its predecessor's word stream
    (same seed) with only the final word mutated — a ~0.9-Jaccard planted
    pair, so MinHash-LSH recall is measurable at any scale. Word choice,
    length (20-59 words) and lang are all xxhash64 of the id: fully
    deterministic, fully distributed.
    """
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    nv = len(_VOCAB)
    df = spark.range(num_rows).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.when(F.col("id") % 20 == 1, 1).otherwise(0)).alias("_seed"),
    )
    n_words = (F.pmod(F.xxhash64(F.col("_seed") * 31 + 5), F.lit(40)) + 20).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.element_at(
            vocab, (F.pmod(F.xxhash64(F.col("_seed") * 97 + i), nv) + 1).cast("int")
        ),
    )
    mut = F.element_at(
        vocab, (F.pmod(F.xxhash64(F.col("doc_id") * 131 + 7), nv) + 1).cast("int")
    )
    text = F.when(
        F.col("doc_id") % 20 == 1,
        F.concat_ws(
            " ", F.concat(F.slice(words, 1, F.size(words) - 1), F.array(mut))
        ),
    ).otherwise(F.concat_ws(" ", words))
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("zh"), F.lit("fr")),
        (F.pmod(F.xxhash64(F.col("doc_id") * 53 + 3), 4) + 1).cast("int"),
    )
    return df.select("doc_id", text.alias("text"), lang.alias("lang"))


def mock_embeddings(
    spark: SparkSession, num_rows: int, dim: int = 64, n_clusters: int = 32
) -> DataFrame:
    """(vec_id, embedding array<float>, label) with real cluster structure.

    Each vector = 0.8 * its cluster's center + 0.3 * per-vector noise, both
    hash-derived uniform[-1,1] per dimension — so IVF centroids genuinely
    separate the data and ANN recall against brute force is meaningful.
    """

    def u(hash_col):  # xxhash64 -> uniform [-1, 1]
        return F.pmod(hash_col, F.lit(2000003)).cast("double") / 1000001.5 - 1.0

    label = F.pmod(F.xxhash64(F.col("id") * 29 + 1), F.lit(n_clusters)).cast("int")
    df = spark.range(num_rows).select(F.col("id").alias("vec_id"), label.alias("label"))
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            0.8 * u(F.xxhash64(F.col("label") * 8191 + d * 131 + 17))
            + 0.3 * u(F.xxhash64(F.col("vec_id") * 6151 + d * 257 + 11))
        ).cast("float"),
    )
    return df.select("vec_id", emb.alias("embedding"), "label")


# the oracle-checked aggregate keeps value1 as its exact integer numerator
# (k / 2^31-1 * 100 in double would hit decimal rounding ties); the division
# happens once, on the exact integer sum — bit-identical in both engines
_V1_NUM = "(id * 16807 + 7) % 2147483647"


@register(
    "synthetic_mock_dataset",
    f"""
    with ids as (select range as id from range(100000))
    select {_GRP} as grp,
           count(*) as n,
           cast(sum({_V1_NUM}) as double) / 2147483647.0 * 100.0 as sum_v1,
           cast(sum({_V2}) as bigint) as sum_v2
    from ids group by 1
    """,
)
def synthetic_mock_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100k-row deterministic mock table, aggregated by group (sf-independent)."""
    df = spark.range(100_000).select(
        F.expr(_GRP).alias("grp"),
        F.expr(_V1_NUM).alias("v1_num"),
        F.expr(_V2).alias("v2"),
    )
    return df.groupBy("grp").agg(
        F.count("*").alias("n"),
        (F.sum("v1_num").cast("double") / 2147483647.0 * 100.0).alias("sum_v1"),
        F.sum("v2").alias("sum_v2"),
    )
