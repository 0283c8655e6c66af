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
