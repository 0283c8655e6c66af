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
