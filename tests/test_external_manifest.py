"""External-readable snapshot manifest (VERDICT r13 task #6): a foreign
engine resolves a lakehouse table from the manifest alone — the
reference's iceberg_scan interop (query_iceberg_duckdb.py:24-27)."""

from __future__ import annotations

import glob
import json
import os

import pytest

from pyiceberg_lakehouse_spark.lakehouse.table import Lakehouse
from pyspark.sql import functions as F


def _mk(spark, tmp_path, name="ns.t"):
    lh = Lakehouse(spark, str(tmp_path))
    t = lh.create_table(
        name,
        spark.range(0).selectExpr(
            "cast(id as long) as k", "'x' as cat", "cast(id as double) as v"
        ).schema,
        partition_by=["cat"],
    )
    return t


def test_manifest_lists_live_files_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    df = spark.range(100).selectExpr(
        "cast(id as long) as k",
        "case when id % 2 = 0 then 'a' else 'b' end as cat",
        "cast(id as double) as v",
    )
    t.append(df.filter("k < 50"))
    t.append(df.filter("k >= 50"))
    snap_before = t.current_snapshot_id()
    t.delete_where(F.col("k") % 10 == 3)  # rewrites every file
    path = t.write_external_manifest()
    entries = [json.loads(ln) for ln in open(path)]
    live = {os.path.abspath(f["path"]) for f in t.log.live_files()}
    assert {e["path"] for e in entries} == live
    assert all(e["format"] == "parquet" for e in entries)
    assert all(e["snapshot_id"] == t.current_snapshot_id() for e in entries)
    # dead files really sit on disk beside the live ones
    on_disk = {
        os.path.abspath(p)
        for p in glob.glob(f"{t.table_dir}/**/*.parquet", recursive=True)
    }
    assert live < on_disk
    # no torn tmp files left behind
    assert not glob.glob(f"{path}.tmp-*")
    # a historical snapshot resolves ITS files
    old = t.write_external_manifest(
        path=f"{t.table_dir}/_old.json", snapshot_id=snap_before
    )
    old_paths = {json.loads(ln)["path"] for ln in open(old)}
    assert old_paths == {
        os.path.abspath(f["path"]) for f in t.log.live_files(snap_before)
    }
    assert old_paths != {e["path"] for e in entries}


def test_manifest_refuses_pending_mor_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    df = spark.range(20).selectExpr(
        "cast(id as long) as k", "'a' as cat", "cast(id as double) as v"
    )
    t.append(df)
    t.delete_keys(df.filter("k < 5").select("k"), key_cols=["k"])
    with pytest.raises(NotImplementedError, match="merge-on-read"):
        t.write_external_manifest()


def test_duckdb_reads_exactly_the_snapshot(spark, tmp_path):
    """The interop contract end-to-end: DuckDB's rows from the manifest
    equal this engine's scan(), row for row, partition column included."""
    import duckdb

    t = _mk(spark, tmp_path)
    df = spark.range(60).selectExpr(
        "cast(id as long) as k",
        "case when id % 3 = 0 then 'a' else 'b' end as cat",
        "cast(id * 1.5 as double) as v",
    )
    t.append(df)
    t.delete_where(F.col("k") % 4 == 1)
    manifest = t.write_external_manifest()
    con = duckdb.connect()
    files = [
        r[0]
        for r in con.execute(
            "select path from read_json_auto(?)", [manifest]
        ).fetchall()
    ]
    got = con.execute(
        "select k, cat, v from read_parquet(?, hive_partitioning=1)"
        " order by k",
        [files],
    ).fetchall()
    want = [
        (r["k"], r["cat"], r["v"])
        for r in t.scan().orderBy("k").collect()
    ]
    assert got == want
