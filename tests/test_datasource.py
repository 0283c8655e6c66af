"""The registered ``lakehouse`` format (sources/datasource.py): batch read
with pushed-filter file skipping, time travel, and the partitioned
snapshot-offset streaming source with exactly-once restarts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, LessThan

from pyiceberg_lakehouse_spark.lakehouse.table import Lakehouse
from pyiceberg_lakehouse_spark.sources.datasource import (
    LakehouseBatchReader,
    register_lakehouse_source,
)
from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table


@pytest.fixture()
def orders_table(spark, warehouse, sf_dir):
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table(
        "ns.orders_fmt",
        SCHEMAS["orders"],
        partition_by=["o_orderstatus"],
        properties={
            "write.sort-order": "o_totalprice",
            "write.target-records-per-file": "300",
        },
    )
    t.append(load_table(spark, sf_dir, "orders"))
    register_lakehouse_source(spark)
    return t


def test_batch_read_matches_scan(spark, orders_table, sf_dir):
    df = spark.read.format("lakehouse").load(orders_table.table_dir)
    assert df.schema == orders_table.schema()
    assert df.count() == load_table(spark, sf_dir, "orders").count()
    assert df.exceptAll(orders_table.scan()).count() == 0


def test_pushed_filters_prune_files(orders_table):
    baseline = LakehouseBatchReader({"path": orders_table.table_dir})
    n_all = len(baseline.partitions())
    pruned = LakehouseBatchReader({"path": orders_table.table_dir})
    residual = pruned.pushFilters(
        [EqualTo(("o_orderstatus",), "O"), LessThan(("o_totalprice",), 50000.0)]
    )
    # file skipping is file-granular: every filter must come back to Spark
    assert len(list(residual)) == 2
    assert len(pruned.partitions()) < n_all


def test_pushed_filter_results_correct(spark, orders_table, sf_dir):
    df = spark.read.format("lakehouse").load(orders_table.table_dir)
    got = df.filter("o_orderstatus = 'O' and o_totalprice < 50000").count()
    exp = (
        load_table(spark, sf_dir, "orders")
        .filter("o_orderstatus = 'O' and o_totalprice < 50000")
        .count()
    )
    assert got == exp > 0


def test_time_travel_option(spark, orders_table, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    snap1 = orders_table.log.current_snapshot_id()
    orders_table.append(orders.limit(10))
    head = spark.read.format("lakehouse").load(orders_table.table_dir)
    past = (
        spark.read.format("lakehouse")
        .option("snapshot_id", snap1)
        .load(orders_table.table_dir)
    )
    assert head.count() == orders.count() + 10
    assert past.count() == orders.count()


@pytest.mark.slow
def test_partitioned_stream_exactly_once_restart(
    spark, orders_table, sf_dir, tmp_path
):
    """The gap the file-stream source can't cover: a PARTITIONED table
    streamed with snapshot-id offsets, surviving a restart without
    re-reading or losing rows."""
    orders = load_table(spark, sf_dir, "orders")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain() -> int:
        s = spark.readStream.format("lakehouse").load(orders_table.table_dir)
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).count()

    n = orders.count()
    assert drain() == n
    orders_table.append(orders.limit(7))
    assert drain() == n + 7  # restart reads exactly the new snapshot
    assert drain() == n + 7  # nothing new -> nothing appended
    # partition column round-trips through log metadata, not hive paths
    streamed = spark.read.parquet(out)
    assert streamed.filter(F.col("o_orderstatus").isNull()).count() == 0


def test_stream_rejects_rewrite_history(spark, orders_table, tmp_path):
    orders_table.delete_where(F.col("o_orderkey") % 2 == 0)
    s = spark.readStream.format("lakehouse").load(orders_table.table_dir)
    q = (
        s.writeStream.format("parquet")
        .option("path", str(tmp_path / "out2"))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append-only|STREAM"):
        q.awaitTermination(120)


def test_writer_append_roundtrip(spark, orders_table, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    before = orders_table.scan().count()
    orders.limit(50).write.format("lakehouse").mode("append").save(
        orders_table.table_dir
    )
    orders_table.log.load()
    assert orders_table.scan().count() == before + 50
    snap = orders_table.log.snapshots[-1]
    assert snap.operation == "append"
    # executor-side footer stats landed in the log for every new file
    assert all(f.get("stats") for f in snap.added_files)


def test_writer_overwrite(spark, orders_table, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    orders.limit(25).write.format("lakehouse").mode("overwrite").save(
        orders_table.table_dir
    )
    orders_table.log.load()
    assert orders_table.scan().count() == 25


def test_writer_rejects_schema_mismatch(spark, orders_table, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(Exception, match="columns"):
        orders.drop("o_custkey").write.format("lakehouse").mode("append").save(
            orders_table.table_dir
        )


def test_writer_rejects_transform_partitioning(spark, warehouse, sf_dir):
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table(
        "ns.orders_tr", SCHEMAS["orders"], partition_by=["month(o_orderdate)"]
    )
    register_lakehouse_source(spark)
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(Exception, match="hidden-partitioning|transform"):
        orders.write.format("lakehouse").mode("append").save(t.table_dir)


def test_stream_writer_exactly_once(spark, warehouse, sf_dir, tmp_path):
    from pyiceberg_lakehouse_spark.streaming.queries_lakehouse import (
        EVENTS_TABLE_SCHEMA,
    )
    from pyiceberg_lakehouse_spark.streaming.windows import events_stream

    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.events_w", EVENTS_TABLE_SCHEMA)
    register_lakehouse_source(spark)
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, sf_dir, "events")
    # one source dir for both runs — the checkpoint pins the source path
    stream = events_stream(spark, sf_dir)

    def run():
        q = (
            stream.writeStream.format("lakehouse")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(t.table_dir)
        )
        q.awaitTermination(120)
        t.log.load()
        return t.scan().count()

    assert run() == ev.count()
    assert run() == ev.count()  # replay/no-new-data never duplicates


def test_batch_read_transform_partitioned_table(spark, warehouse, sf_dir):
    """Hidden partitioning: derived month(o_orderdate) values never appear
    in the schema; the reader serves the source columns straight from the
    data files and ignores the derived partition segment."""
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table(
        "ns.orders_hp", SCHEMAS["orders"], partition_by=["month(o_orderdate)"]
    )
    orders = load_table(spark, sf_dir, "orders")
    t.append(orders)
    register_lakehouse_source(spark)
    df = spark.read.format("lakehouse").load(t.table_dir)
    assert df.schema == t.schema()
    assert df.count() == orders.count()
    assert df.filter(F.col("o_orderdate").isNull()).count() == 0


def test_batch_incremental_options(spark, orders_table, sf_dir):
    """format("lakehouse") incremental scan: only the files appended in
    (from_snapshot, to_snapshot] are planned."""
    orders = load_table(spark, sf_dir, "orders")
    snap0 = orders_table.log.current_snapshot_id()
    orders_table.append(orders.limit(10))
    snap1 = orders_table.log.current_snapshot_id()
    orders_table.append(orders.limit(4))
    inc = (
        spark.read.format("lakehouse")
        .option("from_snapshot", snap0)
        .load(orders_table.table_dir)
    )
    assert inc.count() == 14
    bounded = (
        spark.read.format("lakehouse")
        .option("from_snapshot", snap0)
        .option("to_snapshot", snap1)
        .load(orders_table.table_dir)
    )
    assert bounded.count() == 10


def test_writer_abort_leaves_no_committed_state(spark, orders_table, sf_dir):
    """A write that fails mid-flight must not commit: the snapshot log is
    unchanged, reads are unaffected, and the debris is orphan-cleanable."""
    import os

    from pyiceberg_lakehouse_spark.lakehouse.maintenance import remove_orphan_files

    orders = load_table(spark, sf_dir, "orders")
    before_snapshots = len(orders_table.log.snapshots)
    before_rows = orders_table.scan().count()
    poisoned = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") >= 0, F.col("o_custkey")).otherwise(
            F.raise_error(F.lit("boom"))
        ),
    ).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 500 == 7, F.raise_error(F.lit("boom")))
        .otherwise(F.col("o_totalprice"))
        .cast("double"),
    )
    with pytest.raises(Exception):
        poisoned.write.format("lakehouse").mode("append").save(
            orders_table.table_dir
        )
    orders_table.log.load()
    assert len(orders_table.log.snapshots) == before_snapshots
    assert orders_table.scan().count() == before_rows
    # any stray task output is unreferenced and reclaimable immediately
    remove_orphan_files(orders_table, older_than_s=0)
    assert orders_table.scan().count() == before_rows


def test_concurrent_datasource_appends_both_commit(spark, orders_table, sf_dir):
    """Two racing format("lakehouse") appends: the optimistic-retry commit
    path lands both as separate snapshots with no lost update.

    Python data source lookup consults the JVM's THREAD-LOCAL active
    session; a fresh Python thread maps to a fresh JVM thread with none
    set, so the write fails with DATA_SOURCE_NOT_FOUND unless the thread
    re-activates the session first (same workaround Spark's own
    multi-threading docs prescribe for session-scoped state)."""
    from pyspark import InheritableThread

    orders = load_table(spark, sf_dir, "orders")
    before = orders_table.scan().count()
    errs = []

    def write(n):
        try:
            spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
                spark._jsparkSession
            )
            orders.limit(n).write.format("lakehouse").mode("append").save(
                orders_table.table_dir
            )
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append(e)

    t1 = InheritableThread(target=write, args=(11,))
    t2 = InheritableThread(target=write, args=(23,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    orders_table.log.load()
    assert orders_table.scan().count() == before + 34


def test_batch_read_branch_option(spark, orders_table, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    dev = orders_table.create_branch("dev")
    dev.append(orders.limit(9))
    main_df = spark.read.format("lakehouse").load(orders_table.table_dir)
    dev_df = (
        spark.read.format("lakehouse")
        .option("branch", "dev")
        .load(orders_table.table_dir)
    )
    assert dev_df.count() == main_df.count() + 9
