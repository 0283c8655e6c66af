"""Bloom-reduced joins: the semi-join row reducer (operators/joins.py) and
the bloom-index file pruner (lakehouse/bloom.py::prune_files_bloom_any).

Correctness here never depends on the bloom — the real join owns it — so
these tests pin the two things the differential gate can't see: that the
file pruner PHYSICALLY skips files holding none of the probed keys, and
that the row reducer passes every matching row (no false negatives, the
one failure mode that would corrupt results).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse.bloom import prune_files_bloom_any
from pyiceberg_lakehouse_spark.lakehouse.table import Lakehouse
from pyiceberg_lakehouse_spark.operators.joins import semi_join_reduce
from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table


def _key_table(spark, warehouse):
    """Orders-shaped table where each append's custkeys live in a disjoint
    range -> each file's bloom is decisive for out-of-range probes."""
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table(
        "ns.bloom_join_t",
        SCHEMAS["orders"],
        properties={"write.bloom-columns": "o_custkey"},
    )
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    for lo, hi in [(0, 50), (50, 100), (100, 150)]:
        batch = orders.filter(
            (F.col("o_custkey") >= lo) & (F.col("o_custkey") < hi)
        )
        t.append(batch.coalesce(1))
    return t


def test_bloom_any_prunes_files_without_any_key(spark, warehouse):
    t = _key_table(spark, warehouse)
    files = t.log.live_files()
    assert len(files) == 3
    # probe keys from ranges 1 and 3 only -> the middle file must drop
    kept = prune_files_bloom_any(spark, files, "o_custkey", [7, 120])
    kept_ranges = set()
    for f in kept:
        lo = int(f["stats"]["o_custkey"][0])
        kept_ranges.add(0 if lo < 50 else (1 if lo < 100 else 2))
    assert 1 not in kept_ranges, "file with no probed key was not skipped"
    assert {0, 2} <= kept_ranges


def test_bloom_any_keeps_files_without_bloom(spark, warehouse):
    t = _key_table(spark, warehouse)
    files = [dict(f) for f in t.log.live_files()]
    files[0] = {k: v for k, v in files[0].items() if k != "bloom"}
    kept = prune_files_bloom_any(spark, files, "o_custkey", [999999])
    # no key exists anywhere: bloomed files all prune, bloomless file stays
    assert kept == [files[0]]


def test_scan_bloom_any_join_matches_plain_join(spark, warehouse):
    t = _key_table(spark, warehouse)
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").filter(
        F.col("o_custkey") < 150
    )
    keys = [5, 55, 105, 999999]
    via_bloom = (
        t.scan(bloom_filter_any={"o_custkey": keys})
        .filter(F.col("o_custkey").isin(keys))
        .select("o_orderkey")
    )
    plain = orders.filter(F.col("o_custkey").isin(keys)).select("o_orderkey")
    assert sorted(r[0] for r in via_bloom.collect()) == sorted(
        r[0] for r in plain.collect()
    )


def test_semi_join_reduce_no_false_negatives(spark):
    fact = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    dim = (
        load_table(spark, "/root/testdata/sf0.001", "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select("s_suppkey")
    )
    reduced = semi_join_reduce(fact, dim, "l_suppkey", "s_suppkey", m=64)
    # every truly-matching fact row must survive even a tiny bucket space
    truth = fact.join(dim, fact.l_suppkey == dim.s_suppkey, "left_semi")
    assert truth.exceptAll(reduced).count() == 0
    # and the reducer only ever drops rows, never invents them
    assert reduced.exceptAll(fact).count() == 0


def test_semi_join_reduce_reduces(spark):
    fact = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_suppkey"
    )
    dim = (
        load_table(spark, "/root/testdata/sf0.001", "supplier")
        .filter(F.col("s_suppkey") <= 2)
        .select("s_suppkey")
    )
    reduced = semi_join_reduce(fact, dim, "l_suppkey", "s_suppkey")
    # with m = 2^20 and ~2 dim keys, false positives are ~0: the surviving
    # fraction must be close to the true match fraction, far below 1
    total, kept = fact.count(), reduced.count()
    truth = fact.join(dim, fact.l_suppkey == dim.s_suppkey, "left_semi").count()
    assert kept < total * 0.5
    assert kept >= truth
