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
