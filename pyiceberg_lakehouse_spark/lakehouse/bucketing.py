"""Bucketed tables: co-located joins with zero shuffle.

At 100 TB the dominant join cost is shuffling both sides by the key. Writing
both tables bucketed (hash-partitioned into N files) and sorted by the join
key lets Spark plan a SortMergeJoin with NO Exchange on either side — the
bucket files are already co-partitioned. This is the persistent-layout
counterpart to broadcast joins (which only work for small sides).

Spark requires bucketed tables to live in the session catalog
(``saveAsTable``); we pin them to an explicit external LOCATION so nothing
writes into the working directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    location: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` bucketed+sorted by ``bucket_col`` at ``location``."""
    spark = df.sparkSession
    spark.sql(f"drop table if exists {table_name}")
    (
        df.write.mode("overwrite")
        .option("path", os.path.abspath(location))
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables; the plan carries no Exchange."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=on)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle (for assertions)."""
    return "Exchange" in df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
