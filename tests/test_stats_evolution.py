"""File-skipping stats + schema evolution."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.stats import prune_files
from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table


def test_scan_skips_files_by_stats(spark, warehouse, sf_dir):
    """Commits are key-ranged, so a key predicate must skip whole files."""
    orders = load_table(spark, sf_dir, "orders")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.orders_stats", SCHEMAS["orders"])
    for lo, hi in ((0, 500), (500, 1000), (1000, 10**9)):
        t.append(orders.filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)))

    files = t.log.live_files()
    assert all(f.get("stats", {}).get("o_orderkey") for f in files)

    pruned = prune_files(files, {"o_orderkey": ("<", 500)})
    assert len(pruned) < len(files)

    df = t.scan(stat_filter={"o_orderkey": ("<", 500)}).filter(F.col("o_orderkey") < 500)
    expected = orders.filter(F.col("o_orderkey") < 500).count()
    assert df.count() == expected


def test_stats_string_and_timestamp_bounds(spark, warehouse, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.orders_sb", SCHEMAS["orders"])
    t.append(orders)
    stats = t.log.live_files()[0]["stats"]
    assert stats["o_orderstatus"][0] == "F" and stats["o_orderstatus"][1] == "P"
    assert stats["o_orderdate"][0].startswith("1995")


def test_add_column_evolution(spark, warehouse, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.nation_ev", SCHEMAS["nation"])
    t.append(nation)
    t.add_column("comment", T.StringType())
    # old files read back with NULL for the new column
    df = t.scan()
    assert "comment" in df.columns
    assert df.filter(F.col("comment").isNull()).count() == nation.count()
    # new writes carry the column
    t.append(
        nation.limit(2).withColumn("comment", F.lit("updated"))
    )
    assert t.scan().filter(F.col("comment") == "updated").count() == 2
    assert t.history()[-2].operation == "schema_change"


def test_rename_column_without_rewrite(spark, warehouse, sf_dir):
    """Files written before the rename serve under the new name; files
    written after carry it natively; values line up across epochs."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.orders_rn", SCHEMAS["orders"])
    orders = load_table(spark, sf_dir, "orders")
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)
    t.append(first)
    t.rename_column("o_totalprice", "price")
    t.append(second.withColumnRenamed("o_totalprice", "price"))
    got = t.scan()
    assert "price" in got.columns and "o_totalprice" not in got.columns
    assert got.count() == orders.count()
    exp = orders.withColumnRenamed("o_totalprice", "price")
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_rename_column_chained_and_partitioned(spark, warehouse, sf_dir):
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

    lh = Lakehouse(spark, warehouse)
    t = lh.create_table(
        "ns.orders_rn2", SCHEMAS["orders"], partition_by=["o_orderstatus"]
    )
    orders = load_table(spark, sf_dir, "orders")
    t.append(orders)
    t.rename_column("o_totalprice", "price_v1")
    t.rename_column("price_v1", "price")
    got = t.scan()
    assert "price" in got.columns
    assert got.agg(F.sum("price")).collect()[0][0] is not None
    assert got.count() == orders.count()
    # partition columns are off-limits
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.rename_column("o_orderstatus", "status")


def test_rename_column_via_datasource(spark, warehouse, sf_dir):
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.sources.datasource import register_lakehouse_source
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.orders_rn3", SCHEMAS["orders"])
    orders = load_table(spark, sf_dir, "orders")
    t.append(orders.limit(200))
    t.rename_column("o_custkey", "customer_id")
    register_lakehouse_source(spark)
    df = spark.read.format("lakehouse").load(t.table_dir)
    assert "customer_id" in df.columns
    assert df.filter(F.col("customer_id").isNull()).count() == 0
    assert df.count() == 200


def test_rename_key_column_after_mor_delete(spark, warehouse, sf_dir):
    """Delete files store key columns under their at-commit names; renaming
    the key afterwards must not break the anti-join (names map forward)."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.orders_rnd", SCHEMAS["orders"])
    orders = load_table(spark, sf_dir, "orders").limit(100)
    t.append(orders)
    t.delete_keys(
        orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey"),
        ["o_orderkey"],
    )
    expected = orders.filter(F.col("o_orderkey") % 2 != 0).count()
    assert t.scan().count() == expected
    t.rename_column("o_orderkey", "order_id")
    got = t.scan()
    assert "order_id" in got.columns
    assert got.count() == expected
    # the surviving ids are exactly the odd ones, under the new name
    assert got.filter(F.col("order_id") % 2 == 0).count() == 0


def test_rename_survives_snapshot_expiry(spark, warehouse, sf_dir):
    """Expiring the snapshot that recorded a rename must not break reads of
    files written before it (the rename event is stashed on the base)."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import expire_snapshots
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.orders_rne", SCHEMAS["orders"])
    orders = load_table(spark, sf_dir, "orders").limit(120)
    t.append(orders)  # written under o_totalprice
    t.rename_column("o_totalprice", "price")
    t.append(orders.limit(30).withColumnRenamed("o_totalprice", "price"))
    expire_snapshots(t, keep_last=1)  # drops the rename snapshot itself
    got = t.scan()
    assert got.count() == 150
    # the old files' column still serves under the new name, not as nulls
    assert got.filter(F.col("price").isNull()).count() == 0


def test_drop_then_readd_column_does_not_resurrect(spark, warehouse, sf_dir):
    """Without field ids, name-based resolution would serve STALE bytes for
    a dropped-then-re-added column; the epoch guard nulls them instead."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table
    from pyspark.sql import types as T

    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.orders_readd", SCHEMAS["orders"])
    orders = load_table(spark, sf_dir, "orders").limit(80)
    t.append(orders)  # epoch 1: files CONTAIN o_comment-like data? use o_custkey
    t.drop_column("o_custkey")
    t.add_column("o_custkey", T.LongType())
    got = t.scan()
    assert got.count() == 80
    # every pre-re-add row must be NULL, not the resurrected original value
    assert got.filter(F.col("o_custkey").isNotNull()).count() == 0
    # rows appended after the re-add serve real values
    t.append(orders.limit(10))
    got2 = t.scan()
    assert got2.filter(F.col("o_custkey").isNotNull()).count() == 10


def test_promote_column_widens_without_rewrite(spark, warehouse):
    """int->bigint, float->double, decimal precision widening: old narrow
    files byte-untouched, values exactly preserved across generations;
    illegal promotions rejected."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse

    lh = Lakehouse(spark, warehouse)
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.FloatType()),
            T.StructField("d", T.DecimalType(10, 2)),
        ]
    )
    t = lh.create_table("ns.promo", schema)
    df = spark.range(5).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") + 0.5).cast("float").alias("v"),
        F.col("id").cast("decimal(10,2)").alias("d"),
    )
    t.append(df)
    old_files = {f["path"]: os.path.getmtime(f["path"]) for f in t.log.live_files()}

    t.promote_column("k", T.LongType())
    t.promote_column("v", T.DoubleType())
    t.promote_column("d", T.DecimalType(20, 2))

    # illegal: narrowing, cross-family, scale change
    with _pytest.raises(ValueError, match="illegal type promotion"):
        t.promote_column("k", T.IntegerType())
    with _pytest.raises(ValueError, match="illegal type promotion"):
        t.promote_column("v", T.StringType())
    with _pytest.raises(ValueError, match="illegal type promotion"):
        t.promote_column("d", T.DecimalType(22, 4))

    # wide-typed append lands next to the narrow files
    t.append(
        spark.range(5, 8).select(
            F.col("id").alias("k"),
            (F.col("id") + 0.5).cast("double").alias("v"),
            F.col("id").cast("decimal(20,2)").alias("d"),
        )
    )
    got = t.scan().orderBy("k").collect()
    assert t.scan().schema.simpleString() == "struct<k:bigint,v:double,d:decimal(20,2)>"
    assert [r.k for r in got] == list(range(8))
    # float 0.5 offsets widen exactly
    assert all(abs(r.v - (r.k + 0.5)) == 0.0 for r in got)
    # no data file was rewritten by the promotions
    for p, mtime in old_files.items():
        assert os.path.getmtime(p) == mtime
