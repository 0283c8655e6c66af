"""Incrementally-maintained aggregate rollups over lakehouse tables.

The timeseries-DB "continuous aggregate" / hypertable-rollup pattern on
snapshot-log metadata: a rollup is a SMALL summary table (one row per
dimension combination) whose state is advanced from the source table's
snapshot DIFF, not recomputed from the full fact table. At 100 TB the
economics are the whole point — a daily summary refresh reads the appended
files only (``read_incremental`` plans them from metadata), aggregates the
delta, and merges it with the existing summary by a groupBy over summary
rows; the fact table is never rescanned.

Only incrementally MERGEABLE aggregates are supported — sum, count, min,
max (avg = sum/count at read time). Merge rules: partial sums/counts add;
partial mins/maxes fold with least/greatest. History that is not an
append-only delta (overwrite / replace / delete snapshots, or an expired
refresh cursor) cannot be merged incrementally; ``refresh_rollup`` detects
that from the log and falls back to a FULL recompute, recording which mode
ran in the commit summary — correctness never depends on the fast path
applying.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse.table import LakehouseTable

# supported aggregate -> (delta aggregation, partial-merge aggregation).
# Both stages use the same function for min/max (associative) and sum;
# count's merge stage SUMS the partial counts.
_SUPPORTED = ("sum", "count", "min", "max")


def _out_col(col: str, fn: str) -> str:
    return "cnt_rows" if fn == "count" else f"{fn}_{col}"


def _dim_cols(df: DataFrame, dims: list) -> tuple[DataFrame, list[str]]:
    """Resolve dims: a plain string groups by that column; a (name, sql)
    pair derives the dimension with ``F.expr`` first — the hypertable
    time-bucket shape (e.g. ``("hour_bucket", "date_trunc('HOUR', ts)")``)
    without the fact table having to materialize the bucket column."""
    names = []
    for d in dims:
        if isinstance(d, str):
            names.append(d)
        else:
            name, sql = d
            df = df.withColumn(name, F.expr(sql))
            names.append(name)
    return df, names


def _delta_agg(df: DataFrame, dims: list, aggs: list[tuple[str, str]]) -> DataFrame:
    df, dims = _dim_cols(df, dims)
    exprs = []
    for col, fn in aggs:
        name = _out_col(col, fn)
        if fn == "count":
            exprs.append(F.count(F.lit(1)).cast("long").alias(name))
        elif fn == "sum":
            exprs.append(F.sum(col).alias(name))
        elif fn == "min":
            exprs.append(F.min(col).alias(name))
        elif fn == "max":
            exprs.append(F.max(col).alias(name))
        else:
            raise ValueError(f"unsupported rollup aggregate {fn!r}; use {_SUPPORTED}")
    return df.groupBy(*dims).agg(*exprs)


def _dim_names(dims: list) -> list[str]:
    return [d if isinstance(d, str) else d[0] for d in dims]


def _merge_agg(df: DataFrame, dims: list, aggs: list[tuple[str, str]]) -> DataFrame:
    # partials already carry the (possibly derived) dimension columns
    dims = _dim_names(dims)
    exprs = []
    for col, fn in aggs:
        name = _out_col(col, fn)
        if fn in ("sum", "count"):
            merged = F.sum(name)
        elif fn == "min":
            merged = F.min(name)
        else:
            merged = F.max(name)
        if fn == "count":
            merged = merged.cast("long")
        exprs.append(merged.alias(name))
    return df.groupBy(*dims).agg(*exprs)


def create_rollup(
    lh,
    source: LakehouseTable,
    identifier: str,
    dims: list[str],
    aggs: list[tuple[str, str]],
) -> LakehouseTable:
    """Materialize ``source`` grouped by ``dims`` with mergeable ``aggs``
    (list of ``(column, fn)``; fn in sum/count/min/max, column ignored for
    count) into a new lakehouse table, and record the maintenance contract
    (source dims/aggs + the snapshot the state covers) in its properties.

    The initial build is the one full pass; every later ``refresh_rollup``
    advances from the recorded snapshot cursor.
    """
    for _, fn in aggs:
        if fn not in _SUPPORTED:
            raise ValueError(f"unsupported rollup aggregate {fn!r}; use {_SUPPORTED}")
    covered = source.log.current_snapshot_id()
    state = _delta_agg(source.scan(), dims, aggs)
    rollup = lh.create_table(identifier, state.schema)
    rollup.log.properties.update(
        {
            "rollup.source": source.table_dir,
            "rollup.dims": json.dumps(dims),
            "rollup.aggs": json.dumps(aggs),
            "rollup.last-snapshot": str(covered),
        }
    )
    rollup.append(state)
    return rollup


def refresh_rollup(rollup: LakehouseTable, source: LakehouseTable) -> dict[str, Any]:
    """Advance the rollup to the source's current snapshot.

    Incremental path: aggregate ONLY the files appended since the recorded
    cursor (metadata-planned; the fact table is not rescanned) and merge
    the partials with the current summary rows. Fallback to a full
    recompute when the interval is not an append-only delta — overwrite /
    replace / delete snapshots void partial mins and double-count sums —
    or when the cursor snapshot was expired. Returns
    ``{"mode": "incremental"|"full"|"noop", "covered_snapshot": id}``;
    the mode is also recorded in the overwrite commit's summary so the
    maintenance history is auditable from the log alone.
    """
    dims = json.loads(rollup.log.properties["rollup.dims"])
    aggs = [tuple(a) for a in json.loads(rollup.log.properties["rollup.aggs"])]
    cursor = int(rollup.log.properties["rollup.last-snapshot"])
    head = source.log.current_snapshot_id()
    if head == cursor:
        return {"mode": "noop", "covered_snapshot": cursor}
    mode = "incremental"
    try:
        delta = source.read_incremental(cursor, head)
        state = _merge_agg(
            rollup.scan().unionByName(_delta_agg(delta, dims, aggs)), dims, aggs
        )
    except (ValueError, KeyError):
        # non-append history in the interval, or expired cursor: partials
        # cannot merge — recompute from the live snapshot instead
        mode = "full"
        state = _delta_agg(source.scan(), dims, aggs)
    # align to the rollup schema (summary tables are small; the overwrite
    # rewrites O(|dims-combinations|) rows, never fact-table bytes)
    state = state.select(*[f.name for f in rollup.schema().fields])
    rollup.log.properties["rollup.last-snapshot"] = str(head)
    rollup.overwrite(state, summary={"op": "rollup_refresh", "rollup.mode": mode})
    return {"mode": mode, "covered_snapshot": head}
