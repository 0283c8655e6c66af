"""Iceberg v2 EXPORT (VERDICT r17 task #2) —
lakehouse/iceberg_export.py::export_iceberg_table.

The contract: a native lakehouse table exports to spec-exact Iceberg
v2 metadata (real Avro manifest lists + manifests with field-ids,
bounds and null counts; metadata.json with the log's own snapshot
ids) such that ``read_iceberg_table`` — the engine's native
``iceberg_scan`` — reproduces ``table.scan()`` at EVERY exported
snapshot, including merge-on-read delete history. The DuckDB iceberg
extension cannot install in this sandbox (no network), so foreign-
engine compatibility is pinned structurally: spec field-ids on every
Avro field, the required container metadata keys, Appendix-D bounds
bytes, and the Column Projection rule for identity partitions.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse import iceberg_interop as I
from pyiceberg_lakehouse_spark.lakehouse.iceberg_export import (
    export_iceberg_table,
)
from pyiceberg_lakehouse_spark.operators.avro import decode_avro
from pyiceberg_lakehouse_spark.sources.testdata import SCHEMAS, load_table

SF = "/root/testdata/sf0.001"


def _rows(df, cols=("o_orderkey", "o_custkey")):
    return set(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture
def exported(spark, warehouse):
    """Partitioned table with append + CoW delete + MoR position
    delete history, exported."""
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table(
        "ns.exp_orders", SCHEMAS["orders"],
        partition_by=["o_orderstatus"],
    )
    orders = load_table(spark, SF, "orders")
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    t.delete_where(F.col("o_orderkey") % 7 == 0)
    t.delete_where_positions(F.col("o_orderkey") % 10 == 3)
    return t, export_iceberg_table(t)


def test_roundtrip_every_snapshot(spark, exported):
    t, mp = exported
    assert _rows(I.read_iceberg_table(spark, mp)) == _rows(t.scan())
    for s in t.log.snapshots:
        assert _rows(
            I.read_iceberg_table(spark, mp, snapshot_id=s.snapshot_id)
        ) == _rows(t.scan(snapshot_id=s.snapshot_id)), s.operation


def test_identity_partition_column_projection(spark, exported):
    """Data files drop identity partition columns (hive layout); the
    exported schema declares them and the reader reconstitutes them
    from r102 metadata per the spec's Column Projection rule."""
    t, mp = exported
    df = I.read_iceberg_table(spark, mp)
    assert "o_orderstatus" in df.columns
    # and the values are real, not nulls
    assert df.filter(F.col("o_orderstatus").isNull()).count() == 0
    got = _rows(df, ("o_orderkey", "o_orderstatus"))
    want = _rows(t.scan(), ("o_orderkey", "o_orderstatus"))
    assert got == want
    # schema order matches the table's
    assert df.columns == [f.name for f in t.schema().fields]


def test_exported_stats_prune(spark, exported):
    t, mp = exported
    plan = I.plan_iceberg_scan(mp, predicates=[("o_orderkey", "<=", 5)])
    assert plan["n_pruned"] > 0, "exported bounds must prune"
    plan2 = I.plan_iceberg_scan(
        mp, predicates=[("o_orderstatus", "=", "F")]
    )
    assert plan2["n_pruned"] > 0, "identity partitions must prune"
    # pruned read still correct with the in-query predicate
    got = _rows(
        I.read_iceberg_table(
            spark, mp, predicates=[("o_orderstatus", "=", "F")]
        ).filter(F.col("o_orderstatus") == "F")
    )
    want = _rows(t.scan().filter(F.col("o_orderstatus") == "F"))
    assert got == want


def test_snapshot_ids_and_parents_preserved(spark, exported):
    t, mp = exported
    meta = json.load(open(mp))
    assert meta["format-version"] == 2
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    for s in t.log.snapshots:
        assert s.snapshot_id in snaps
        got = snaps[s.snapshot_id]
        assert got["timestamp-ms"] == s.timestamp_ms
        if s.parent_id is not None:
            assert got["parent-snapshot-id"] == s.parent_id
    assert meta["current-snapshot-id"] == t.log.current_snapshot_id()
    assert (meta["refs"]["main"]["snapshot-id"]
            == t.log.current_snapshot_id())


def test_manifest_structure_spec_exact(spark, exported):
    """Structural spec pins a foreign engine relies on: Avro container
    metadata keys, field-ids on every schema field, Appendix-D bounds
    bytes, delete manifests in content=1 lists."""
    t, mp = exported
    meta = json.load(open(mp))
    head = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    mlist = decode_avro(open(head["manifest-list"], "rb").read())
    # manifest-list schema carries the spec's field-ids
    ml_ids = {
        f["name"]: f.get("field-id") for f in mlist["schema"]["fields"]
    }
    assert ml_ids["manifest_path"] == 500
    assert ml_ids["content"] == 517
    assert ml_ids["sequence_number"] == 515
    assert mlist["meta"]["format-version"] == b"2"
    contents = {e["content"] for e in mlist["records"]}
    assert contents == {0, 1}, "data + delete manifests expected"
    for entry in mlist["records"]:
        man = decode_avro(open(entry["manifest_path"], "rb").read())
        m = man["meta"]
        assert m["format-version"] == b"2"
        assert m["content"] == (
            b"data" if entry["content"] == 0 else b"deletes"
        )
        assert m["partition-spec-id"] == b"0"
        emb_schema = json.loads(m["schema"])
        assert emb_schema["type"] == "struct"
        assert [f["name"] for f in emb_schema["fields"]] == [
            f.name for f in t.schema().fields
        ]
        spec_fields = json.loads(m["partition-spec"])
        assert [f["name"] for f in spec_fields] == ["o_orderstatus"]
        assert spec_fields[0]["transform"] == "identity"
        # manifest-entry schema field-ids (status=0, data_file=2)
        ids = {
            f["name"]: f.get("field-id")
            for f in man["schema"]["fields"]
        }
        assert ids == {
            "status": 0, "snapshot_id": 1, "sequence_number": 3,
            "file_sequence_number": 4, "data_file": 2,
        }
        df_ids = {
            f["name"]: f.get("field-id")
            for f in next(
                f for f in man["schema"]["fields"]
                if f["name"] == "data_file"
            )["type"]["fields"]
        }
        assert df_ids["file_path"] == 100
        assert df_ids["partition"] == 102
        assert df_ids["lower_bounds"] == 125
        assert df_ids["upper_bounds"] == 128
    # a data manifest entry carries little-endian bounds for
    # o_orderkey (field id 1) and exact value/null counts
    dman = decode_avro(open(next(
        e["manifest_path"] for e in mlist["records"]
        if e["content"] == 0
    ), "rb").read())
    entry = next(
        e for e in dman["records"]
        if e["data_file"]["lower_bounds"]
    )
    df_rec = entry["data_file"]
    lo = {kv["key"]: kv["value"] for kv in df_rec["lower_bounds"]}
    import struct as _struct

    assert 1 in lo and len(lo[1]) == 8  # o_orderkey is a long
    lo_val = _struct.unpack("<q", lo[1])[0]
    vals = {kv["key"]: kv["value"] for kv in df_rec["value_counts"]}
    assert vals[1] == df_rec["record_count"]
    nulls = {
        kv["key"]: kv["value"] for kv in df_rec["null_value_counts"]
    }
    assert nulls.get(1) == 0
    # the bound actually holds over the file
    actual_min = (
        spark.read.parquet(df_rec["file_path"])
        .agg(F.min("o_orderkey")).collect()[0][0]
    )
    assert lo_val == actual_min


def test_unpartitioned_and_temporal_bounds(spark, warehouse):
    """Unpartitioned export; timestamp bounds serialize as epoch
    micros (Appendix D) and prune through plan_iceberg_scan."""
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.exp_flat", SCHEMAS["orders"])
    orders = load_table(spark, SF, "orders")
    t.append(orders)
    mp = export_iceberg_table(t)
    assert _rows(I.read_iceberg_table(spark, mp)) == _rows(t.scan())
    fields = json.load(open(mp))["schemas"][0]["fields"]
    ice_t = next(
        f["type"] for f in fields if f["name"] == "o_orderdate"
    )
    assert ice_t in ("timestamp", "timestamptz")
    import datetime

    # every TPC-H order is >= 1992; a pre-1980 cutoff prunes all
    cutoff_us = int(
        (datetime.datetime(1980, 1, 1, tzinfo=datetime.timezone.utc)
         - datetime.datetime(
             1970, 1, 1, tzinfo=datetime.timezone.utc
         )).total_seconds() * 1_000_000
    )
    plan = I.plan_iceberg_scan(
        mp, predicates=[("o_orderdate", "<", cutoff_us)]
    )
    assert plan["n_pruned"] == plan["n_candidates"] > 0


def test_transform_partitions_export_unpartitioned(spark, warehouse):
    """Transform-partitioned tables export WITHOUT the transform spec
    (this engine's transforms are not bit-identical to Iceberg's, and
    a mismatched spec would make foreign pruning silently wrong) —
    the data still round-trips because transform sources live in the
    data files."""
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table(
        "ns.exp_hidden", SCHEMAS["orders"],
        partition_by=["month(o_orderdate)"],
    )
    orders = load_table(spark, SF, "orders")
    t.append(orders)
    mp = export_iceberg_table(t)
    meta = json.load(open(mp))
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]
    assert _rows(I.read_iceberg_table(spark, mp)) == _rows(t.scan())


def test_export_gates(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.exp_gate", SCHEMAS["orders"])
    orders = load_table(spark, SF, "orders")
    t.append(orders)
    t.rename_column("o_orderpriority", "prio")
    with pytest.raises(NotImplementedError, match="schema-evolution"):
        export_iceberg_table(t)

    t2 = lh.create_table("ns.exp_gate2", SCHEMAS["orders"])
    t2.append(orders)
    victim = t2.log.live_files()[0]["path"]
    os.rename(victim, victim + ".hidden")
    try:
        with pytest.raises(ValueError, match="historical file"):
            export_iceberg_table(t2)
    finally:
        os.rename(victim + ".hidden", victim)


def test_distributed_stats_many_files(spark, warehouse):
    """r18 scale posture: >64 data files route footer-stats collection
    through one Spark job (executor-side reads) instead of a driver
    loop — same stats, same pruning, same roundtrip."""
    lh = Lakehouse(spark, warehouse)
    df = spark.range(0, 7000).selectExpr(
        "id as o_orderkey", "id % 100 as o_custkey"
    )
    t = lh.create_table("ns.exp_many", df.schema)
    t.append(df.repartition(70))
    assert len(t.log.live_files()) >= 65
    mp = export_iceberg_table(t)
    got = _rows(I.read_iceberg_table(spark, mp),
                ("o_orderkey", "o_custkey"))
    want = _rows(t.scan(), ("o_orderkey", "o_custkey"))
    assert got == want
    # every file carries bounds: a no-match predicate prunes ALL
    plan = I.plan_iceberg_scan(
        mp, predicates=[("o_orderkey", ">", 10 ** 9)]
    )
    assert plan["n_pruned"] == plan["n_candidates"] >= 65
