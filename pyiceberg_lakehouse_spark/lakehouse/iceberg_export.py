"""Export a native lakehouse table AS Apache Iceberg v2 metadata
(VERDICT r17 task #2 — the missing half of the interop story).

``iceberg_interop.read_iceberg_table`` already reads REAL Iceberg v2
metadata natively; this module goes the other direction: given a
table written by this engine's own snapshot log, emit spec-exact
Iceberg v2 metadata — vN.metadata.json, snap-*.avro manifest lists,
*-m0.avro manifests with per-column lower/upper bounds and
value/null counts, r102 partition structs through an identity spec,
and content=1/2 delete manifests for merge-on-read history — around
the table's EXISTING parquet data files (metadata-only: no data
bytes are rewritten or copied, exactly like Iceberg's own
``register_table`` / ``add_files`` flows).

Reference parity: the reference project queries its tables through
DuckDB's ``iceberg_scan`` over pyiceberg-written metadata
(query_iceberg_duckdb.py:24-27, main.py's pyiceberg catalog writes).
Here the lakehouse's OWN log is the source of truth and the Iceberg
tree is derived from it, so any engine that walks Iceberg v2 metadata
can read the table without this library in the loop. The DuckDB
iceberg extension cannot be installed in this sandbox (no network),
so spec compliance is pinned structurally (tests/test_iceberg_export)
and behaviorally by round-tripping through ``read_iceberg_table`` —
itself validated against spec vectors — and diffing vs
``table.scan()`` at every snapshot.

Scale posture: export is a metadata-scale lifecycle operation — one
parquet FOOTER read per data file (the same cost Iceberg's add_files
pays), no row data touched; manifests stream through the from-scratch
Avro encoder. A 100 TB table with 100k files exports in file-count
time, not data-size time.
"""

from __future__ import annotations

import datetime
import os
from typing import Any

from pyspark.sql import types as T

from pyiceberg_lakehouse_spark.localdf import local_rows_df

from pyiceberg_lakehouse_spark.lakehouse.iceberg_interop import (
    write_iceberg_metadata,
)
from pyiceberg_lakehouse_spark.lakehouse.iceberg_transforms import (
    serialize_single_value,
)

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(
    1970, 1, 1, tzinfo=datetime.timezone.utc
)

# Spark type -> (iceberg type string, avro partition-struct type).
_SPARK_TO_ICE: dict[type, tuple[str, Any]] = {
    T.BooleanType: ("boolean", "boolean"),
    T.IntegerType: ("int", "int"),
    T.ShortType: ("int", "int"),
    T.ByteType: ("int", "int"),
    T.LongType: ("long", "long"),
    T.FloatType: ("float", "float"),
    T.DoubleType: ("double", "double"),
    T.StringType: ("string", "string"),
    T.DateType: ("date", {"type": "int", "logicalType": "date"}),
    T.TimestampType: (
        "timestamptz",
        {"type": "long", "logicalType": "timestamp-micros"},
    ),
    T.TimestampNTZType: (
        "timestamp",
        {"type": "long", "logicalType": "local-timestamp-micros"},
    ),
    T.BinaryType: ("binary", "bytes"),
}


def _ice_type(dt: T.DataType) -> tuple[str, Any]:
    if isinstance(dt, T.DecimalType):
        # spec spells it with the space; avro side unused (decimals
        # are not supported as partition columns here)
        return (f"decimal({dt.precision}, {dt.scale})", None)
    try:
        return _SPARK_TO_ICE[type(dt)]
    except KeyError:
        raise NotImplementedError(
            f"iceberg export for Spark type {dt.simpleString()!r} "
            "(nested/interval types have no v2 primitive mapping)"
        ) from None


def _stat_value(v: Any, ice_type: str) -> Any:
    """Parquet-footer statistic -> the typed value
    serialize_single_value expects for ``ice_type``."""
    if ice_type == "date":
        if isinstance(v, datetime.date):
            return (v - _EPOCH_DATE).days
        return int(v)
    if ice_type in ("timestamp", "timestamptz"):
        if isinstance(v, datetime.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=datetime.timezone.utc)
            return round((v - _EPOCH_TS).total_seconds() * 1_000_000)
        return int(v)
    if ice_type == "string" and isinstance(v, bytes):
        return v.decode("utf-8")
    return v


def _file_stats(path: str, fields: list[dict]) -> dict[str, dict]:
    """One footer read -> the manifest's four stats maps
    (field-id keyed): lower/upper bounds as Appendix-D bytes plus
    value/null counts. Columns whose physical stats pyarrow cannot
    surface (or whose type has no single-value serialization) are
    simply absent — pruning stays conservative for them."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path).metadata
    by_name = {f["name"]: f for f in fields}
    mins: dict[int, Any] = {}
    maxs: dict[int, Any] = {}
    vals: dict[int, int] = {}
    nulls: dict[int, int] = {}
    statless: set[int] = set()
    for rg in range(meta.num_row_groups):
        n_rows = meta.row_group(rg).num_rows
        for ci in range(meta.num_columns):
            col = meta.row_group(rg).column(ci)
            fld = by_name.get(col.path_in_schema)
            if fld is None:
                continue
            fid, ice_t = int(fld["id"]), fld["type"]
            vals[fid] = vals.get(fid, 0) + n_rows
            try:
                st = col.statistics
            except NotImplementedError:
                st = None
            if st is not None and st.null_count is not None:
                nulls[fid] = nulls.get(fid, 0) + st.null_count
            else:
                statless.add(fid)
            if ice_t.startswith("decimal(") or ice_t == "binary":
                statless.add(fid)  # no bounds serde for these here
                continue
            if st is None or not st.has_min_max:
                statless.add(fid)
                continue
            try:
                lo = _stat_value(st.min, ice_t)
                hi = _stat_value(st.max, ice_t)
            except (UnicodeDecodeError, TypeError, ValueError):
                statless.add(fid)
                continue
            mins[fid] = lo if fid not in mins else min(mins[fid], lo)
            maxs[fid] = hi if fid not in maxs else max(maxs[fid], hi)
    lower: dict[int, bytes] = {}
    upper: dict[int, bytes] = {}
    for fid in mins:
        if fid in statless or fid not in maxs:
            continue
        ice_t = next(
            f["type"] for f in fields if int(f["id"]) == fid
        )
        lower[fid] = serialize_single_value(mins[fid], ice_t)
        upper[fid] = serialize_single_value(maxs[fid], ice_t)
    return {
        "lower_bounds": lower,
        "upper_bounds": upper,
        "value_counts": dict(vals),
        "null_value_counts": {
            k: v for k, v in nulls.items() if k not in statless
        },
    }


def _typed_partition(
    raw: dict[str, str] | None, part_cols: list[tuple[str, str]]
) -> dict[str, Any]:
    """Log partition values (path-segment strings) -> typed r102
    struct values per the identity transform's source type."""
    raw = raw or {}
    out: dict[str, Any] = {}
    for name, ice_t in part_cols:
        v = raw.get(name)
        if v is None or v == "__HIVE_DEFAULT_PARTITION__":
            out[name] = None
        elif ice_t in ("int", "long"):
            out[name] = int(v)
        elif ice_t == "date":
            out[name] = (
                datetime.date.fromisoformat(str(v)) - _EPOCH_DATE
            ).days
        elif ice_t in ("float", "double"):
            out[name] = float(v)
        elif ice_t == "boolean":
            out[name] = str(v).lower() == "true"
        else:
            out[name] = str(v)
    return out


def _collect_stats_distributed(
    spark, paths: list[str], fields: list[dict]
) -> dict[str, dict]:
    """One Spark job: executor-side footer reads -> the per-file
    manifest stats maps. Result rows are metadata-scale (files x
    stat-bearing columns)."""
    import base64

    schema = (
        "path string, fid int, lower string, upper string,"
        " value_count long, null_count long"
    )

    def _batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for path in pdf["path"]:
                st = _file_stats(str(path), fields)
                fids = (set(st["lower_bounds"])
                        | set(st["value_counts"])
                        | set(st["null_value_counts"]))
                for fid in sorted(fids):
                    lo = st["lower_bounds"].get(fid)
                    up = st["upper_bounds"].get(fid)
                    rows.append((
                        str(path), fid,
                        base64.b64encode(lo).decode() if lo is not None
                        else None,
                        base64.b64encode(up).decode() if up is not None
                        else None,
                        st["value_counts"].get(fid),
                        st["null_value_counts"].get(fid),
                    ))
            yield pd.DataFrame(rows, columns=[
                "path", "fid", "lower", "upper",
                "value_count", "null_count",
            ])

    src = local_rows_df(
        spark, [(p,) for p in paths], "path string"
    ).repartition(min(len(paths), 256))
    out: dict[str, dict] = {
        p: {"lower_bounds": {}, "upper_bounds": {},
            "value_counts": {}, "null_value_counts": {}}
        for p in paths
    }
    import base64

    for r in src.mapInPandas(_batches, schema).collect():
        st = out[r["path"]]
        fid = int(r["fid"])
        if r["lower"] is not None:
            st["lower_bounds"][fid] = base64.b64decode(r["lower"])
        if r["upper"] is not None:
            st["upper_bounds"][fid] = base64.b64decode(r["upper"])
        if r["value_count"] is not None:
            st["value_counts"][fid] = int(r["value_count"])
        if r["null_count"] is not None:
            st["null_value_counts"][fid] = int(r["null_count"])
    return out


def export_iceberg_table(
    table, dest_dir: str | None = None, with_stats: bool = True
) -> str:
    """Lakehouse table -> Iceberg v2 metadata tree; returns the
    metadata.json path (feed it to ``read_iceberg_table`` or any
    engine's ``iceberg_scan``).

    The FULL snapshot history exports 1:1 — snapshot ids, parents,
    timestamps and operations are the lakehouse log's own, so Iceberg
    time travel to any exported snapshot matches
    ``table.scan(snapshot_id=...)``. Merge-on-read history maps to the
    spec's delete files: position-delete files (already (file_path,
    pos) parquet, the spec's own column names) become content=1
    entries; key deletes become content=2 equality deletes with
    ``equality_ids`` resolved from the key columns. Schema-evolution
    history (renames / type changes) is gated: Iceberg tracks columns
    by field-id across evolution and this log's history predates the
    mapping, so exporting it would silently mis-bind old manifests —
    ``compact()`` + ``expire_snapshots`` past the evolution point
    first."""
    log = table.log
    if table._rename_events() or table._column_events():
        raise NotImplementedError(
            "iceberg export across schema-evolution history: field-id"
            " continuity cannot be reconstructed — expire_snapshots"
            " past the evolution point first"
        )
    # FULL table schema: identity-partition columns are not in the
    # data files (hive layout), so the exported schema declares them
    # and read-side resolves them per the spec's Column Projection
    # rule from the r102 partition metadata.
    schema = table.schema()
    fields: list[dict] = []
    for i, f in enumerate(schema.fields, start=1):
        ice_t, _avro_t = _ice_type(f.dataType)
        fields.append({
            "id": i, "name": f.name,
            "required": not f.nullable, "type": ice_t,
        })
    by_name = {f["name"]: f for f in fields}

    # Identity partition fields export as the Iceberg spec; TRANSFORM
    # fields (bucket/truncate/temporal) are deliberately NOT exported
    # as transforms — this engine's transform functions are not
    # bit-identical to Iceberg's (murmur3 bucket, epoch-month ints),
    # and a mismatched transform would make a foreign engine's
    # metadata pruning silently WRONG. Their source columns live in
    # the data files, so dropping them from the exported spec loses
    # only partition-level pruning (bounds stats still prune), never
    # correctness.
    part_cols: list[tuple[str, str]] = []
    partition_fields: list[tuple[str, Any]] = []
    for pf in table.partition_fields:
        if not pf.is_identity:
            continue
        name = pf.source
        fld = by_name.get(name)
        if fld is None:
            raise ValueError(
                f"partition column {name!r} not in the table schema"
            )
        ice_t = fld["type"]
        _ice, avro_t = _ice_type(schema[name].dataType)
        if avro_t is None:
            raise NotImplementedError(
                f"iceberg export of a {ice_t} partition column"
            )
        part_cols.append((name, ice_t))
        partition_fields.append((name, avro_t))
    partition_specs = None
    if part_cols:
        partition_specs = [{
            "spec-id": 0,
            "fields": [
                {"name": n, "transform": "identity",
                 "source-id": by_name[n]["id"],
                 "field-id": 1000 + i}
                for i, (n, _t) in enumerate(part_cols)
            ],
        }]

    stats_cache: dict[str, dict] = {}
    if with_stats:
        all_paths = sorted({
            f["path"] for snap_ in log.snapshots
            for f in snap_.added_files
        })
        if len(all_paths) > 64:
            # 100 TB posture: footer stats for a big file census
            # collect DISTRIBUTED (one executor-side footer read per
            # file, metadata-scale result rows) instead of a driver
            # loop over 100k files
            stats_cache = _collect_stats_distributed(
                table.spark, all_paths, fields
            )

    def _entry(f: dict) -> dict:
        import pyarrow.parquet as pq

        path = f["path"]
        rows = f.get("rows")
        if rows is None:
            rows = pq.ParquetFile(path).metadata.num_rows
        out = {"path": path, "records": int(rows)}
        if part_cols:
            out["partition"] = _typed_partition(
                f.get("partition"), part_cols
            )
        if with_stats:
            if path not in stats_cache:
                stats_cache[path] = _file_stats(path, fields)
            out.update(stats_cache[path])
        return out

    missing = [
        f["path"]
        for s in log.snapshots
        for f in s.added_files
        if not os.path.exists(f["path"])
    ] + [
        d["path"]
        for s in log.snapshots
        for d in s.added_deletes
        if not os.path.exists(d["path"])
    ]
    if missing:
        raise ValueError(
            "iceberg export needs every historical file on disk (the"
            " manifests reference them); vacuumed/expired files are"
            f" gone: {missing[:3]}... — expire_snapshots to drop the"
            " unreachable history first"
        )

    snapshots: list[dict] = []
    exported_paths: set[str] = set()
    for s in log.snapshots:
        snap: dict[str, Any] = {
            "snapshot_id": int(s.snapshot_id),
            "timestamp_ms": int(s.timestamp_ms),
            "operation": {
                "create": "append", "append": "append",
                "add_files": "append", "overwrite": "overwrite",
                "delete": "delete", "replace": "replace",
            }.get(s.operation, "replace"),
            "files": [_entry(f) for f in s.added_files],
            "deleted": [
                p for p in s.removed_paths if p in exported_paths
            ],
        }
        exported_paths |= {f["path"] for f in s.added_files}
        exported_paths -= set(snap["deleted"])
        pos, eq = [], []
        for d in s.added_deletes:
            import pyarrow.parquet as pq

            n = pq.ParquetFile(d["path"]).metadata.num_rows
            if d.get("kind") == "position":
                pos.append({"path": d["path"], "records": n})
            else:
                try:
                    ids = [
                        by_name[c]["id"] for c in d["key_cols"]
                    ]
                except KeyError as exc:
                    raise ValueError(
                        f"delete key column {exc} not in the data"
                        " schema"
                    ) from exc
                eq.append({
                    "path": d["path"], "records": n,
                    "equality_ids": ids,
                })
        if pos:
            snap["pos_deletes"] = pos
        if eq:
            snap["eq_deletes"] = eq
        snapshots.append(snap)

    dest = dest_dir or table.table_dir
    return write_iceberg_metadata(
        dest,
        snapshots=snapshots,
        schema_fields=fields,
        partition_specs=partition_specs,
        partition_fields=partition_fields or None,
    )
