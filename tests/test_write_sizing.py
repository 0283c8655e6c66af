"""Target-file-size enforcement on the lakehouse write path."""

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table


def test_target_records_per_file_splits_output(spark, warehouse, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table(
        "ns.orders_sz",
        SCHEMAS["orders"],
        properties={"write.target-records-per-file": "400"},
    )
    t.append(orders.limit(1000))
    files = t.log.live_files()
    assert len(files) >= 3  # 1000 rows / 400 per file
    assert t.scan().count() == 1000


def test_distribution_mode_hash_collapses_small_files(spark, warehouse, sf_dir):
    """Without distribution, every input task writes a file into every
    partition it holds rows for; hash mode co-locates each partition on one
    task — the 100 TB guard against small-file explosion."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

    orders = load_table(spark, sf_dir, "orders").repartition(8)
    lh = Lakehouse(spark, warehouse)

    t_none = lh.create_table(
        "ns.orders_dn", SCHEMAS["orders"], partition_by=["o_orderstatus"]
    )
    t_none.append(orders)
    files_none = len(t_none.log.live_files())

    t_hash = lh.create_table(
        "ns.orders_dh",
        SCHEMAS["orders"],
        partition_by=["o_orderstatus"],
        properties={"write.distribution-mode": "hash"},
    )
    t_hash.append(orders)
    files_hash = len(t_hash.log.live_files())

    n_parts = orders.select("o_orderstatus").distinct().count()
    assert files_none > n_parts  # the explosion exists without distribution
    assert files_hash <= n_parts + 1, (files_hash, n_parts)
    assert t_hash.scan().count() == orders.count()


def test_distribution_mode_range_tightens_bounds(spark, warehouse, sf_dir):
    """range mode globally orders on the sort column, so file bounds are
    near-disjoint and a range predicate prunes — without an explicit
    repartition(1) trick or post-hoc zorder."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.stats import prune_files
    from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

    orders = load_table(spark, sf_dir, "orders").repartition(8)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table(
        "ns.orders_dr",
        SCHEMAS["orders"],
        properties={
            "write.distribution-mode": "range",
            "write.sort-order": "o_totalprice",
            "write.target-records-per-file": "300",
        },
    )
    t.append(orders)
    files = t.log.live_files()
    assert len(files) > 3
    kept = prune_files(files, {"o_totalprice": ("<", 50000.0)})
    assert len(kept) < len(files) / 2, (len(kept), len(files))
