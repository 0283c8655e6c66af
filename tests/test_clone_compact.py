"""Shallow clone + partition-scoped compaction (lakehouse/maintenance.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.maintenance import compact, shallow_clone
from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

SF = "/root/testdata/sf0.001"


def test_shallow_clone_is_zero_copy_and_divergent(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    orders = load_table(spark, SF, "orders")
    src = lh.create_table("ns.clone_src", SCHEMAS["orders"])
    src.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    src.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    src_paths = {f["path"] for f in src.log.live_files()}

    clone = shallow_clone(lh, src, "ns.clone_dst")
    # zero-copy: the clone references the SOURCE's files verbatim
    assert {f["path"] for f in clone.log.live_files()} == src_paths
    assert clone.scan().exceptAll(src.scan()).count() == 0
    assert src.scan().exceptAll(clone.scan()).count() == 0

    # divergence: mutations on either side are invisible to the other
    clone.delete_where(F.col("o_orderkey") % 7 == 0)
    src.append(orders.limit(5))
    assert src.scan().filter(F.col("o_orderkey") % 7 == 0).count() > 0
    assert clone.scan().filter(F.col("o_orderkey") % 7 == 0).count() == 0
    assert clone.scan().count() < src.scan().count()
    # source files untouched on disk
    for p in src_paths:
        assert os.path.exists(p)


def test_shallow_clone_carries_mor_deletes_and_sequences_new_ones(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    orders = load_table(spark, SF, "orders")
    src = lh.create_table("ns.clone_mor_src", SCHEMAS["orders"])
    src.append(orders)
    src.delete_keys(
        spark.createDataFrame([(2,)], "o_orderkey int"), ["o_orderkey"]
    )
    clone = shallow_clone(lh, src, "ns.clone_mor_dst")
    # the source's live delete applies in the clone
    assert clone.scan().filter(F.col("o_orderkey") == 2).count() == 0
    # a NEW delete in the clone must apply to the cloned files (sequencing)
    clone.delete_keys(
        spark.createDataFrame([(4,)], "o_orderkey int"), ["o_orderkey"]
    )
    assert clone.scan().filter(F.col("o_orderkey") == 4).count() == 0
    # and not leak back to the source
    assert src.scan().filter(F.col("o_orderkey") == 4).count() > 0


def test_compact_partition_scoped_touches_only_matching_files(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    orders = load_table(spark, SF, "orders")
    t = lh.create_table(
        "ns.compact_part", SCHEMAS["orders"], partition_by=["o_orderstatus"]
    )
    for i in range(3):  # small-file history in every partition
        t.append(orders.filter(F.col("o_orderkey") % 3 == i))
    before = {
        f["path"]: f["partition"].get("o_orderstatus")
        for f in t.log.live_files()
    }
    n_o_before = sum(1 for v in before.values() if v == "O")
    assert n_o_before >= 3
    expect = t.scan().groupBy("o_orderstatus").count().collect()

    snap = compact(t, partition_filter={"o_orderstatus": "O"})
    assert snap.summary["op"] == "compact"
    after = {
        f["path"]: f["partition"].get("o_orderstatus")
        for f in t.log.live_files()
    }
    # other partitions' files byte-identical (same paths)
    for p, v in before.items():
        if v != "O":
            assert p in after
    # the O partition compacted to fewer files; rows unchanged
    assert sum(1 for v in after.values() if v == "O") < n_o_before
    got = t.scan().groupBy("o_orderstatus").count().collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))
    # invisible to incremental consumers
    assert snap.summary["data-change"] is False


def test_compact_partition_scoped_materializes_mor_deletes(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    orders = load_table(spark, SF, "orders")
    t = lh.create_table(
        "ns.compact_mor", SCHEMAS["orders"], partition_by=["o_orderstatus"]
    )
    t.append(orders)
    key = orders.filter(F.col("o_orderstatus") == "O").limit(1).collect()[0][0]
    t.delete_keys(
        spark.createDataFrame([(key,)], "o_orderkey int"), ["o_orderkey"]
    )
    expect = t.scan().count()
    compact(t, partition_filter={"o_orderstatus": "O"})
    assert t.scan().count() == expect
    assert t.scan().filter(F.col("o_orderkey") == key).count() == 0
