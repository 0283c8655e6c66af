"""Lakehouse tables as a registered Spark data source: ``format("lakehouse")``.

PySpark 4's Python DataSource API lets the snapshot log participate in
Spark's own planning instead of living behind helper functions:

- **batch**: ``spark.read.format("lakehouse").load(table_dir)`` — one input
  partition per live data file, planned driver-side from metadata only.
  ``option("snapshot_id", k)`` time-travels. ``pushFilters`` receives
  Catalyst's conjuncts and prunes the FILE LIST against the per-file min/max
  stats and identity partition values recorded in the log (the same skipping
  as ``LakehouseTable.scan(stat_filter=...)``, but driven by the query's own
  WHERE clause — no side-channel argument). Every filter is handed back to
  Spark for row-level evaluation: log-based skipping is file-granular.
- **streaming**: ``spark.readStream.format("lakehouse").load(table_dir)`` —
  offsets ARE snapshot ids. Each micro-batch reads the files committed in
  ``(start, end]`` append/add_files snapshots, so partitioned tables stream
  correctly (partition values come from the log, not from hive-path
  discovery — the restriction in streaming/lakehouse_io.py:84 is gone).
  Non-append history (overwrite/replace/delete) raises, the same
  append-only contract as ``read_incremental``.

Executor-side reads go through pyarrow and yield Arrow record batches —
vectorized end to end, never per-row Python. At 100 TB the driver handles
O(files) metadata and each task opens exactly one file; offsets-by-snapshot
means a streaming restart replans from the checkpointed snapshot id alone.

Mirrors: snapshot-aware scan main.py-era reference scripts (read_history.py:
10-11, query_iceberg_duckdb.py:24-29); incremental/CDC posture matches
Iceberg's Spark streaming source (option ``from_snapshot`` ~=
``stream-from-timestamp``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Iterator, Sequence
from urllib.parse import unquote

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from pyiceberg_lakehouse_spark.lakehouse.log import SnapshotLog
from pyiceberg_lakehouse_spark.lakehouse.stats import prune_files


@dataclass
class FileSlice(InputPartition):
    """One data file + its identity partition values (hive-path columns are
    stripped from the file by Spark's writer, so the reader re-attaches
    them as constants from log metadata — flat and hive layouts unify)."""

    path: str
    partition: dict = field(default_factory=dict)


def _read_slice(slice_: FileSlice, schema_json: str) -> Iterator[Any]:
    """Yield Arrow record batches for one file, conformed to the table
    schema (column order, types, attached partition constants)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    if not slice_.path:
        return
    schema = T.StructType.fromJson(json.loads(schema_json))
    target = to_arrow_schema(schema)
    pf = pq.ParquetFile(slice_.path)
    file_cols = set(pf.schema_arrow.names)
    read_cols = [f.name for f in target if f.name in file_cols]
    for batch in pf.iter_batches(batch_size=1 << 16, columns=read_cols):
        tbl = pa.Table.from_batches([batch])
        n = len(tbl)
        arrays = []
        for f in target:
            if f.name in file_cols:
                arrays.append(tbl.column(f.name).cast(f.type).combine_chunks())
            elif f.name in slice_.partition:
                arrays.append(
                    pa.array([slice_.partition[f.name]] * n, pa.string()).cast(f.type)
                )
            else:
                arrays.append(pa.nulls(n, f.type))
        yield pa.RecordBatch.from_arrays(arrays, schema=target)


def _to_slice(f: dict[str, Any]) -> FileSlice:
    return FileSlice(
        path=f["path"],
        partition={k: unquote(str(v)) for k, v in (f.get("partition") or {}).items()},
    )


class LakehouseBatchReader(DataSourceReader):
    """Metadata-planned batch reader with stats/partition file skipping."""

    def __init__(self, options: dict):
        self.table_dir = options["path"]
        snap = options.get("snapshot_id")
        self.snapshot_id = int(snap) if snap is not None else None
        log = SnapshotLog(self.table_dir).load()
        if log.live_deletes(self.snapshot_id):
            raise ValueError(
                "table has merge-on-read deletes; read it via "
                "LakehouseTable.scan(), which applies them"
            )
        self.schema_json = log.schema_json
        self.files = log.live_files(self.snapshot_id)
        # col -> list of (op, value) conjuncts for stats pruning
        self.stat_preds: dict[str, list] = {}
        # col -> allowed string values for identity-partition pruning
        self.part_preds: dict[str, set] = {}

    def pushFilters(self, filters: list[Filter]):
        ops = {
            EqualTo: "=",
            LessThan: "<",
            LessThanOrEqual: "<=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
        }
        for flt in filters:
            if len(getattr(flt, "attribute", ())) != 1:
                continue
            col = flt.attribute[0]
            op = ops.get(type(flt))
            if op is not None:
                self.stat_preds.setdefault(col, []).append((op, flt.value))
                if op == "=":
                    self.part_preds.setdefault(col, set()).add(str(flt.value))
            elif isinstance(flt, In) and flt.value:
                vals = list(flt.value)
                try:
                    conj = [(">=", min(vals)), ("<=", max(vals))]
                except TypeError:
                    continue
                self.stat_preds.setdefault(col, []).extend(conj)
                self.part_preds.setdefault(col, set()).update(str(v) for v in vals)
        # skipping is file-granular — Spark still evaluates every filter
        # against the rows, so partially-pruned files stay correct
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        files = self.files
        if self.stat_preds:
            files = prune_files(files, self.stat_preds)
        for col, allowed in self.part_preds.items():
            # conservative: files missing the partition key are kept
            files = [
                f
                for f in files
                if col not in (f.get("partition") or {})
                or unquote(str(f["partition"][col])) in allowed
            ]
        # Spark requires >=1 partition; an empty path reads as no rows
        return [_to_slice(f) for f in files] or [FileSlice(path="")]

    def read(self, partition: FileSlice) -> Iterator[Any]:
        return _read_slice(partition, self.schema_json)


class LakehouseStreamReader(DataSourceStreamReader):
    """Micro-batch source whose offsets are snapshot ids."""

    def __init__(self, options: dict):
        self.table_dir = options["path"]
        self.start_snapshot = int(options.get("from_snapshot", 0))
        self.schema_json = SnapshotLog(self.table_dir).load().schema_json

    def initialOffset(self) -> dict:
        return {"snapshot_id": self.start_snapshot}

    def latestOffset(self) -> dict:
        log = SnapshotLog(self.table_dir).load()
        return {"snapshot_id": log.current_snapshot_id() or 0}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["snapshot_id"], end["snapshot_id"]
        log = SnapshotLog(self.table_dir).load()
        slices: list[FileSlice] = []
        for snap in log.snapshots:
            if not (lo < snap.snapshot_id <= hi):
                continue
            if snap.operation in ("overwrite", "replace", "delete"):
                raise ValueError(
                    f"snapshot {snap.snapshot_id} is {snap.operation!r}; the "
                    "streaming source covers append-only history — restart "
                    "from a fresh checkpoint past the rewrite"
                )
            slices.extend(_to_slice(f) for f in snap.added_files)
        return slices or [FileSlice(path="")]

    def read(self, partition: FileSlice) -> Iterator[Any]:
        return _read_slice(partition, self.schema_json)

    def commit(self, end: dict) -> None:
        # offsets derive from the durable snapshot log; nothing to persist
        pass


class LakehouseDataSource(DataSource):
    """``spark.dataSource.register(LakehouseDataSource)`` then
    ``spark.read.format("lakehouse").load(table_dir)`` (batch, time travel
    via ``snapshot_id``) or ``spark.readStream.format(...)`` (micro-batch
    stream, snapshot ids as offsets, ``from_snapshot`` to seek)."""

    @classmethod
    def name(cls) -> str:
        return "lakehouse"

    def schema(self) -> T.StructType:
        log = SnapshotLog(self.options["path"]).load()
        return log.schema()

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return LakehouseBatchReader(self.options)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return LakehouseStreamReader(self.options)


def register_lakehouse_source(spark) -> None:
    """Idempotent registration of the ``lakehouse`` format."""
    # required for pushFilters to participate in planning (off by default)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseDataSource)
