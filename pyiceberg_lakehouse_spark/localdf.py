"""Driver-local rows -> DataFrame without the empty-slice trap.

``SparkSession.createDataFrame(list_of_rows, ...)`` parallelizes the rows
with the RDD default slice count — ``defaultParallelism`` — even when the
list holds one row, so a single-row metadata frame becomes an RDD of 32
Python-backed partitions, 31 of them empty. Every empty partition still
costs a JVM<->Python worker round-trip when computed; worse, a downstream
``coalesce(1)`` (the usual "write one file" idiom) folds them into ONE task
that drains all 32 parent partitions SEQUENTIALLY — measured ~6.5 s for a
one-row write on local[32] vs ~0.4 s with one slice (optimization guide
§4: the Python boundary is paid per partition, not per row).

``local_rows_df`` sizes the slice count to the data instead:
``min(len(rows), defaultParallelism)`` — tiny metadata frames collapse to
one partition while genuinely parallel work lists (file paths fanned out
to executors) keep one row per slice exactly as before. Row order is
preserved either way (``parallelize`` keeps list order across slices), so
results are byte-identical to the stock path.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(
    spark: SparkSession,
    rows: Iterable[Any],
    schema,
    slices: int | None = None,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with a data-sized slice
    count (see module docstring). ``slices`` overrides when the caller
    wants a specific fan-out."""
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        # one empty slice, not defaultParallelism of them: an empty frame
        # built via createDataFrame([], schema) still carries 32 empty
        # Python partitions that each cost a worker round-trip downstream
        return spark.createDataFrame(
            spark.sparkContext.parallelize([], 1), schema
        )
    if slices is None:
        slices = max(1, min(len(rows), spark.sparkContext.defaultParallelism))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), schema
    )


def spread_ids(df: DataFrame) -> DataFrame:
    """Round-robin a small id-only frame across the session's cores.

    The planted-fixture multimodal/crawl queries feed ``mapInPandas``
    from a filtered scan of the tiny ``documents`` table — at bench
    scale that scan is a SINGLE input split, so the whole Python-side
    codec stage (the real cost) ran on one core. Repartitioning the
    id stream to ``defaultParallelism`` costs a shuffle of a few KB of
    longs and fans the per-document decode out across the cluster
    (guide §2.5 input skew: one unsplittable input → repartition right
    after the read). Scale-adaptive by construction: the target tracks
    the session's core count, never a constant. Only ever applied to
    id-only frames — payload-carrying scans keep their native splits
    so bytes are never shuffled (guide §8)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
