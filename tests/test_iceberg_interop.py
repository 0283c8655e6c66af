"""Iceberg v2 metadata interop tests (lakehouse/iceberg_interop.py):
spec-shaped metadata walk, manifest tombstones, time travel, gates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import iceberg_interop as I
from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir

SCHEMA_FIELDS = [
    {"id": 1, "name": "id", "required": True, "type": "long"},
    {"id": 2, "name": "v", "required": False, "type": "long"},
]


@pytest.fixture
def table(spark):
    td = session_tmpdir(prefix="ice_")
    d1, d2 = os.path.join(td, "d1"), os.path.join(td, "d2")
    spark.range(0, 100).withColumn("v", F.col("id") * 2).coalesce(1) \
        .write.parquet(d1)
    spark.range(100, 150).withColumn("v", F.col("id") * 2).coalesce(1) \
        .write.parquet(d2)
    f1 = next(os.path.join(d1, f) for f in os.listdir(d1)
              if f.endswith(".parquet"))
    f2 = next(os.path.join(d2, f) for f in os.listdir(d2)
              if f.endswith(".parquet"))
    mp = I.write_iceberg_metadata(
        td,
        snapshots=[
            {"files": [{"path": f1, "records": 100}]},
            {"files": [{"path": f2, "records": 50}]},
            {"deleted": [f1]},
        ],
        schema_fields=SCHEMA_FIELDS,
    )
    return mp, f1, f2


def test_current_follows_main_ref_past_tombstone(spark, table):
    mp, f1, _f2 = table
    assert os.path.exists(f1)  # deleted file still on disk
    df = I.read_iceberg_table(spark, mp)
    assert df.count() == 50
    assert df.agg(F.min("id")).collect()[0][0] == 100


def test_time_travel_by_snapshot_id(spark, table):
    mp, _f1, _f2 = table
    assert I.read_iceberg_table(spark, mp, snapshot_id=1000).count() == 100
    assert I.read_iceberg_table(spark, mp, snapshot_id=1001).count() == 150
    with pytest.raises(KeyError):
        I.read_iceberg_table(spark, mp, snapshot_id=9999)


def test_live_files_accounting(table):
    mp, _f1, f2 = table
    info = I.iceberg_live_files(mp)
    assert [f["path"] for f in info["files"]] == [os.path.abspath(f2)]
    assert info["files"][0]["records"] == 50
    info2 = I.iceberg_live_files(mp, snapshot_id=1001)
    assert len(info2["files"]) == 2


def test_delete_manifest_content_gated(table):
    mp, _f1, _f2 = table
    import json

    from pyiceberg_lakehouse_spark.operators.avro import (
        decode_avro,
        encode_avro,
    )

    meta = json.load(open(mp))
    snap = meta["snapshots"][-1]
    mlist = decode_avro(open(snap["manifest-list"], "rb").read())
    recs = mlist["records"]
    recs[0]["content"] = 1  # claim a DELETE manifest
    with open(snap["manifest-list"], "wb") as fh:
        fh.write(encode_avro(recs, I._MANIFEST_LIST_SCHEMA))
    with pytest.raises(NotImplementedError, match="DELETE"):
        I.iceberg_live_files(mp)
