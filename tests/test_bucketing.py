"""Bucketed co-located join: zero-Exchange plan + correct results."""

from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse.bucketing import (
    colocated_join,
    plan_has_exchange,
    write_bucketed,
)
from pyiceberg_lakehouse_spark.sources.testdata import load_table


def test_bucketed_join_has_no_shuffle(spark, warehouse, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    write_bucketed(orders, "t_bk_orders", f"{warehouse}/o", "custkey", 4)
    write_bucketed(customer, "t_bk_customer", f"{warehouse}/c", "custkey", 4)

    # force a sort-merge join so the bucket layout (not a broadcast) is
    # what eliminates the shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "t_bk_customer", "t_bk_orders", "custkey")
        assert not plan_has_exchange(joined), "bucketed join must not shuffle"
        # and an unbucketed baseline DOES shuffle
        baseline = load_table(spark, sf_dir, "customer").join(
            load_table(spark, sf_dir, "orders"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        assert plan_has_exchange(baseline)
        # results match the plain join
        assert joined.count() == baseline.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("drop table if exists t_bk_orders")
        spark.sql("drop table if exists t_bk_customer")
