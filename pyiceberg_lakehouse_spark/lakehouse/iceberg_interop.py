"""Apache Iceberg v2 TABLE-FORMAT interop: read a real Iceberg table
from its metadata alone, with no Iceberg library in the loop.

This is the reference project's namesake capability
(query_iceberg_duckdb.py:24-27 — ``iceberg_scan('<metadata.json>')``)
implemented natively: walk vN.metadata.json -> the snapshot's
manifest-list (an AVRO file, read by operators/avro.py's from-scratch
container decoder) -> each manifest (Avro again) -> the live data-file
list -> one Spark parquet scan. Time travel is picking a different
snapshot id from the same metadata; the current snapshot resolves via
the ``main`` ref / current-snapshot-id per the spec.

Reader tolerance follows the spec's reader contract: fields are
resolved BY NAME from the manifest records, unknown fields are ignored
(Avro handles that structurally), ``status=2`` (DELETED) entries drop
out of the live set while ``EXISTING``/``ADDED`` stay, and
``content!=0`` (delete files) raises honestly — a file-list-only read
of a table with merge-on-read deletes would resurrect rows (the same
gate the engine's own external manifest applies).

``write_iceberg_metadata`` is the fixture-grade writer: it emits
spec-shaped metadata.json + manifest-list + manifest files around
existing parquet so the reader is exercised end to end (multiple
snapshots, appended + deleted manifest entries, split manifests). With
no Iceberg library in this environment it is also the only way to
build test tables; the layout mirrors what Spark-Iceberg writes
(metadata/ directory, snap-*.avro manifest lists, *-m0.avro
manifests).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from pyiceberg_lakehouse_spark.operators.avro import decode_avro, encode_avro

# Avro schemas for the subset of manifest fields the reader needs —
# field names are the spec's; readers resolve by name so extra fields
# written by real Iceberg are simply ignored by our decoder's caller.
_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
    ],
}

_MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "file_sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
            ],
        }},
    ],
}

_STATUS_EXISTING, _STATUS_ADDED, _STATUS_DELETED = 0, 1, 2


def write_iceberg_metadata(
    table_dir: str,
    snapshots: list[dict],
    schema_fields: list[dict],
    partition_specs: list[dict] | None = None,
) -> str:
    """Fixture-grade Iceberg v2 metadata around existing parquet files.

    ``snapshots``: [{"files": [{"path", "records", "size"?}],
    "deleted"?: [paths removed in this snapshot]}] — cumulative state is
    derived here the way Iceberg's manifests express it (ADDED entries
    in the new manifest, EXISTING carried forward, DELETED tombstones).
    Returns the metadata.json path."""
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    snap_objs = []
    live: dict[str, dict] = {}
    seq = 0
    for si, snap in enumerate(snapshots):
        seq += 1
        snap_id = 1000 + si
        entries = []
        for path in snap.get("deleted", []):
            if path not in live:
                raise ValueError(f"snapshot {si} deletes unknown {path}")
            prev = live.pop(path)
            entries.append(
                {
                    "status": _STATUS_DELETED,
                    "snapshot_id": snap_id,
                    "sequence_number": prev["seq"],
                    "file_sequence_number": prev["seq"],
                    "data_file": prev["df"],
                }
            )
        for f in snap.get("files", []):
            df = {
                "content": 0,
                "file_path": os.path.abspath(f["path"]),
                "file_format": "PARQUET",
                "record_count": int(f["records"]),
                "file_size_in_bytes": int(
                    f.get("size", os.path.getsize(f["path"]))
                ),
            }
            live[f["path"]] = {"df": df, "seq": seq}
            entries.append(
                {
                    "status": _STATUS_ADDED,
                    "snapshot_id": snap_id,
                    "sequence_number": None,  # inherited from the manifest
                    "file_sequence_number": None,
                    "data_file": df,
                }
            )
        for path, prev in live.items():
            if prev["seq"] != seq:  # carried forward
                entries.append(
                    {
                        "status": _STATUS_EXISTING,
                        "snapshot_id": 1000 + si - 1,
                        "sequence_number": prev["seq"],
                        "file_sequence_number": prev["seq"],
                        "data_file": prev["df"],
                    }
                )
        mpath = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
        blob = encode_avro(entries, _MANIFEST_SCHEMA)
        with open(mpath, "wb") as fh:
            fh.write(blob)
        added = [e for e in entries if e["status"] == _STATUS_ADDED]
        existing = [e for e in entries if e["status"] == _STATUS_EXISTING]
        deleted = [e for e in entries if e["status"] == _STATUS_DELETED]
        mlist = [
            {
                "manifest_path": os.path.abspath(mpath),
                "manifest_length": len(blob),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": min(
                    (e["sequence_number"] or seq for e in entries),
                    default=seq,
                ),
                "added_snapshot_id": snap_id,
                "added_files_count": len(added),
                "existing_files_count": len(existing),
                "deleted_files_count": len(deleted),
                "added_rows_count": sum(
                    e["data_file"]["record_count"] for e in added
                ),
                "existing_rows_count": sum(
                    e["data_file"]["record_count"] for e in existing
                ),
                "deleted_rows_count": sum(
                    e["data_file"]["record_count"] for e in deleted
                ),
            }
        ]
        lpath = os.path.join(
            meta_dir, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro"
        )
        with open(lpath, "wb") as fh:
            fh.write(encode_avro(mlist, _MANIFEST_LIST_SCHEMA))
        snap_objs.append(
            {
                "snapshot-id": snap_id,
                "sequence-number": seq,
                "timestamp-ms": 1700000000000 + si,
                "manifest-list": os.path.abspath(lpath),
                "summary": {"operation": "append" if not snap.get("deleted")
                            else "overwrite"},
                **({"parent-snapshot-id": 1000 + si - 1} if si else {}),
            }
        )
    metadata = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": os.path.abspath(table_dir),
        "last-sequence-number": seq,
        "last-updated-ms": 1700000000000,
        "last-column-id": len(schema_fields),
        "current-schema-id": 0,
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": schema_fields}
        ],
        "default-spec-id": 0,
        "partition-specs": partition_specs
        or [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": snap_objs[-1]["snapshot-id"],
        "refs": {
            "main": {
                "snapshot-id": snap_objs[-1]["snapshot-id"],
                "type": "branch",
            }
        },
        "snapshots": snap_objs,
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"],
             "timestamp-ms": s["timestamp-ms"]}
            for s in snap_objs
        ],
    }
    mpath = os.path.join(meta_dir, f"v{len(snapshots)}.metadata.json")
    with open(mpath, "w", encoding="utf-8") as fh:
        json.dump(metadata, fh)
    return mpath


def iceberg_live_files(
    metadata_path: str, snapshot_id: int | None = None
) -> dict[str, Any]:
    """metadata.json -> {snapshot_id, files: [{path, records}],
    n_manifests} for the chosen (default: current) snapshot."""
    with open(metadata_path, encoding="utf-8") as fh:
        meta = json.load(fh)
    if int(meta.get("format-version", 1)) not in (1, 2):
        raise NotImplementedError(
            f"iceberg format-version {meta.get('format-version')}"
        )
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if snapshot_id is None:
        snapshot_id = (
            meta.get("refs", {}).get("main", {}).get("snapshot-id")
            or meta.get("current-snapshot-id")
        )
    if snapshot_id not in snaps:
        raise KeyError(f"snapshot {snapshot_id} not in the metadata")
    snap = snaps[snapshot_id]
    with open(snap["manifest-list"], "rb") as fh:
        mlist = decode_avro(fh.read())["records"]
    files = []
    n_manifests = 0
    for m in mlist:
        if m.get("content", 0) != 0:
            raise NotImplementedError(
                "iceberg DELETE manifests: a file-list-only reader would"
                " resurrect deleted rows"
            )
        n_manifests += 1
        with open(m["manifest_path"], "rb") as fh:
            entries = decode_avro(fh.read())["records"]
        for e in entries:
            if e["status"] == _STATUS_DELETED:
                continue
            df = e["data_file"]
            if df.get("content", 0) != 0:
                raise NotImplementedError("iceberg delete files")
            if df["file_format"].upper() != "PARQUET":
                raise NotImplementedError(
                    f"iceberg file format {df['file_format']}"
                )
            files.append(
                {"path": df["file_path"], "records": df["record_count"]}
            )
    return {
        "snapshot_id": snapshot_id,
        "files": files,
        "n_manifests": n_manifests,
        "sequence_number": snap.get("sequence-number"),
    }


def read_iceberg_table(
    spark: SparkSession, metadata_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """One Catalyst parquet scan over the snapshot's live file list —
    the engine-native ``iceberg_scan``."""
    resolved = iceberg_live_files(metadata_path, snapshot_id)
    if not resolved["files"]:
        raise ValueError("iceberg snapshot lists no data files")
    return spark.read.parquet(*[f["path"] for f in resolved["files"]])
