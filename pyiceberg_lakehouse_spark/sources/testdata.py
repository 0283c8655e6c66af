"""Loaders for the driver-generated testdata tables.

Explicit schemas (no inference cost, strict on drift) for the ten tables at
``/root/testdata/sf*/``. The only normalization applied is the events ``ts``
column: stored as parquet TIMESTAMP(NANOS or MICROS depending on the
testdata generation — the footer is probed), read as a raw long (see
session.RUNTIME_CONFS) and converted to a microsecond timestamp —
equivalent to the reference's per-file cast-to-canonical-schema step
(main-daft.py:133, main-polars-lazy.py:160-162).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# events.ts is declared LongType: parquet TIMESTAMP(NANOS) surfaces as a
# long under spark.sql.legacy.parquet.nanosAsLong; load_table converts it.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


# events.parquet's ts unit differs across testdata generations (TIMESTAMP
# NANOS vs MICROS); probe the footer once per path so the long->timestamp
# conversion always matches what's actually on disk.
_TS_UNIT_CACHE: dict[str, str] = {}


def events_ts_unit(path: str) -> str:
    """'ns' or 'us' from the parquet footer (one driver-side footer read)."""
    if path not in _TS_UNIT_CACHE:
        import pyarrow.parquet as pq

        _TS_UNIT_CACHE[path] = pq.ParquetFile(path).schema_arrow.field("ts").type.unit
    return _TS_UNIT_CACHE[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its canonical schema.

    ``events.ts`` arrives as an epoch long (nanos or micros, per the file's
    parquet type) and is converted to a TIMESTAMP_NTZ — integer division
    stays inside whole-stage codegen, no Python round-trip.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # nanosAsLong must be on before planning the events scan; harmless for
    # the others. Runtime-settable, so this also covers driver-owned sessions.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.schema(SCHEMAS[name]).parquet(path)
    if name == "events":
        # exact LONG integer division — double division near 1.7e18 exceeds
        # 2^53 and lands ~10% of rows one microsecond off the oracle
        micros = "ts div 1000" if events_ts_unit(path) == "ns" else "ts"
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr(micros)).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view (mirrors the DuckDB oracle setup)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# (sf_dir, table) -> parquet row-group count (footer probe, cached)
_ROW_GROUP_CACHE: dict[tuple[str, str], int] = {}


def row_group_count(sf_dir: str, name: str) -> int:
    """Parquet row-group count of one testdata table (footer probe,
    cached per process). Row groups are the unit of scan parallelism, so
    this is the honest 'is this input splittable?' signal shared by
    ``load_table_spread`` and ``localdf.spread_ids``."""
    key = (sf_dir, name)
    rgs = _ROW_GROUP_CACHE.get(key)
    if rgs is None:
        import pyarrow.parquet as pq

        rgs = pq.ParquetFile(
            os.path.join(sf_dir, f"{name}.parquet")
        ).metadata.num_row_groups
        _ROW_GROUP_CACHE[key] = rgs
    return rgs


def load_table_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load_table`` + round-robin fan-out when the file's ROW-GROUP count
    caps scan parallelism below the session's cores.

    Parquet reads parallelize at row-group granularity, so a single-row-
    group file is an unsplittable input no matter how `maxPartitionBytes`
    is tuned — the optimization guide's §2.5 prescription for that shape
    is "repartition immediately after the read". The condition is a real
    property of the input footer (cached per process): at production
    scale files carry many row groups, the condition is false, and no
    shuffle is added. Use only where per-row compute dominates (shingle
    explodes, k-gram hashing) — a plain scan-aggregate stays on
    ``load_table``."""
    df = load_table(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    if row_group_count(sf_dir, name) < par:
        df = df.repartition(par)
    return df
