"""SparkSession factory with scale-oriented defaults.

The reference tunes its engines per-script (thread pinning, object-store
sizing: main-polars-ray.py:157-192; read parallelism: main-ray.py:62). In
Spark all of that is session configuration, centralized here.

Defaults are chosen for a large cluster while remaining correct on
``local[N]``:
- AQE on (runtime coalescing, skew-join splitting),
- shuffle partitions sized to the session's parallelism (overridable),
- zstd parquet writes (reference compression choice, main-daft.py:69),
- UTC session timezone so timestamp semantics match the DuckDB oracle,
- Arrow-based pandas interchange for the vectorized-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and necessary) to set on an already-running session,
# e.g. the driver-owned session handed to __spark_entry__.entry().
RUNTIME_CONFS: dict[str, str] = {
    # testdata events.parquet stores timestamp[ns]; Spark's reader rejects
    # TIMESTAMP(NANOS) unless it is surfaced as a raw long (we convert back
    # to a timestamp in sources/testdata.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # lets Python data sources (sources/datasource.py) receive pushFilters
    "spark.sql.python.filterPushdown.enabled": "true",
    # 512 MB reference target-file-size (main-daft.py:106) is a *write*
    # target; for reads we keep the Spark default-ish split size so a 100 TB
    # scan fans out across all executor cores.
    "spark.sql.files.maxPartitionBytes": "134217728",
}


def export_worker_pythonpath() -> None:
    """Put the repo root on PYTHONPATH so Spark python workers can import
    this package BY NAME when deserializing pandas-UDF / mapInPandas
    closures (functions/dense.py, operators/similarity.py) — workers inherit
    PYTHONPATH from the JVM's environment, not the driver's sys.path.

    Must run in the driver process BEFORE the JVM starts: ``get_spark``
    calls it ahead of ``getOrCreate``, and ``__spark_entry__`` calls it at
    import (the correctness driver imports the entry module before creating
    its own session). Kept out of package import so merely importing
    ``pyiceberg_lakehouse_spark`` stays side-effect free.
    """
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = root + (os.pathsep + existing if existing else "")


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally created session."""
    for key, value in RUNTIME_CONFS.items():
        if key == "spark.sql.legacy.parquet.nanosAsLong":
            # load-bearing for the events table — fail loudly at setup, not
            # at scan time, if this build can't set it
            spark.conf.set(key, value)
            continue
        try:
            spark.conf.set(key, value)
        except Exception:
            # not runtime-settable in this build — defaults still correct
            pass
    return spark


def get_spark(
    app_name: str = "pyiceberg-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a tuned SparkSession.

    ``master`` resolves from the SPARK_MASTER env var, then ``local[N]``
    with N = SPARK_GRAFT_CPUS or all cores. ``shuffle_partitions`` defaults
    to the session parallelism (32 on the test rig) — on a real cluster set
    it to 2-3x total executor cores or rely on AQE coalescing.
    """
    export_worker_pythonpath()
    if master is None:
        master = os.environ.get("SPARK_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    # In case getOrCreate() returned a pre-existing session.
    return ensure_runtime_confs(spark)
