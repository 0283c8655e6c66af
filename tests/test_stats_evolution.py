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
