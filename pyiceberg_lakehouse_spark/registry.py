"""Query registry backing the driver contract (__spark_entry__.py).

Every operator module registers its queries here: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string over the same parquet tables. The driver compares the two at
sf=0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased IDENTICALLY on both sides;
- float aggregates go through exact decimal arithmetic (functions.exact) so
  Spark and DuckDB produce bitwise-identical doubles regardless of
  accumulation order — the comparison never depends on float tolerance.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks it rows-only (non-SQL ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import pyiceberg_lakehouse_spark.queries.relational  # noqa: F401
    import pyiceberg_lakehouse_spark.queries.relational_ext  # noqa: F401
    import pyiceberg_lakehouse_spark.queries.relational_ext2  # noqa: F401
    import pyiceberg_lakehouse_spark.queries.relational_tpch  # noqa: F401
    import pyiceberg_lakehouse_spark.queries.relational_ext3  # noqa: F401
    import pyiceberg_lakehouse_spark.operators.queries  # noqa: F401
    import pyiceberg_lakehouse_spark.lakehouse.queries  # noqa: F401
    import pyiceberg_lakehouse_spark.streaming.queries  # noqa: F401
    import pyiceberg_lakehouse_spark.streaming.queries2  # noqa: F401
    import pyiceberg_lakehouse_spark.streaming.queries_lakehouse  # noqa: F401
    import pyiceberg_lakehouse_spark.sources.synthetic  # noqa: F401
