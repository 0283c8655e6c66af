"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship TPC-H-Q1-shaped pricing summary at sf0.001;
``queries``/``oracle_sql`` expose the full registered corpus (relational
operators, LLM-data operators, lakehouse lifecycle, streaming, synthetic
source) from ``pyiceberg_lakehouse_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyiceberg_lakehouse_spark.registry import ORACLE, QUERIES, load_all  # noqa: E402
from pyiceberg_lakehouse_spark.session import (  # noqa: E402
    ensure_runtime_confs,
    export_worker_pythonpath,
)

# The driver creates its own SparkSession after importing this module;
# workers need the repo root on PYTHONPATH before that JVM starts so they
# can deserialize the package's Arrow-batched UDF closures.
export_worker_pythonpath()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_runtime_confs(spark)
    load_all()
    return QUERIES["agg_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    load_all()

    def with_confs(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_confs(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: with_confs(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query; rows-only ops omitted."""
    load_all()
    return dict(ORACLE)
