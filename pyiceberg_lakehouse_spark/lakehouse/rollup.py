"""Incrementally-maintained aggregate rollups over lakehouse tables.

The timeseries-DB "continuous aggregate" / hypertable-rollup pattern on
snapshot-log metadata: a rollup is a SMALL summary table (one row per
dimension combination) whose state is advanced from the source table's
snapshot DIFF, not recomputed from the full fact table. At 100 TB the
economics are the whole point — a daily summary refresh reads the appended
files only (``read_incremental`` plans them from metadata), aggregates the
delta, and merges it with the existing summary by a groupBy over summary
rows; the fact table is never rescanned.

Only incrementally MERGEABLE state is stored. sum/count/min/max store
their own value; avg and stddev are DECOMPOSED into mergeable parts —
non-null sum (``psum_<col>``), sum of squares (``psumsq_<col>``), and
non-null count (``pcnt_<col>``) — and the final column is derived at read
time by :func:`read_rollup` (avg = psum/pcnt; sample stddev =
sqrt((psumsq - psum²/pcnt)/(pcnt-1))). Merge rules: partial sums/counts/
squares add; partial mins/maxes fold with least/greatest. History that is
not an append-only delta (overwrite / replace / delete snapshots, or an
expired refresh cursor) cannot be merged incrementally; ``refresh_rollup``
detects that from the log and falls back to a FULL recompute, recording
which mode ran in the commit summary — correctness never depends on the
fast path applying.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse.table import LakehouseTable

# requested aggregate surface; avg/stddev are stored as decomposed parts
_SUPPORTED = ("sum", "count", "min", "max", "avg", "stddev")


def _out_col(col: str, fn: str) -> str:
    return "cnt_rows" if fn == "count" else f"{fn}_{col}"


def _part_cols(aggs: list[tuple[str, str]]) -> dict[str, tuple[str, str]]:
    """Expand requested aggregates into the mergeable STORAGE parts:
    ``{storage_column: (part_kind, source_column)}``. avg and stddev on
    the same column share their psum/pcnt parts (dict keying dedups)."""
    parts: dict[str, tuple[str, str]] = {}
    for col, fn in aggs:
        if fn in ("sum", "count", "min", "max"):
            parts[_out_col(col, fn)] = (fn, col)
        elif fn == "avg":
            parts[f"psum_{col}"] = ("psum", col)
            parts[f"pcnt_{col}"] = ("pcnt", col)
        elif fn == "stddev":
            parts[f"psum_{col}"] = ("psum", col)
            parts[f"psumsq_{col}"] = ("psumsq", col)
            parts[f"pcnt_{col}"] = ("pcnt", col)
        else:
            raise ValueError(f"unsupported rollup aggregate {fn!r}; use {_SUPPORTED}")
    return parts


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
    for name, (kind, col) in _part_cols(aggs).items():
        if kind == "count":
            exprs.append(F.count(F.lit(1)).cast("long").alias(name))
        elif kind == "sum":
            exprs.append(F.sum(col).alias(name))
        elif kind == "min":
            exprs.append(F.min(col).alias(name))
        elif kind == "max":
            exprs.append(F.max(col).alias(name))
        elif kind == "psum":
            exprs.append(F.sum(col).alias(name))
        elif kind == "psumsq":
            exprs.append(F.sum(F.col(col) * F.col(col)).alias(name))
        else:  # pcnt: NON-NULL count, the avg/stddev denominator
            exprs.append(F.count(col).cast("long").alias(name))
    return df.groupBy(*dims).agg(*exprs)


def _dim_names(dims: list) -> list[str]:
    return [d if isinstance(d, str) else d[0] for d in dims]


def _merge_agg(df: DataFrame, dims: list, aggs: list[tuple[str, str]]) -> DataFrame:
    # partials already carry the (possibly derived) dimension columns
    dims = _dim_names(dims)
    exprs = []
    for name, (kind, _col) in _part_cols(aggs).items():
        if kind == "min":
            merged = F.min(name)
        elif kind == "max":
            merged = F.max(name)
        else:  # sum/count/psum/psumsq/pcnt are all additive
            merged = F.sum(name)
        if kind in ("count", "pcnt"):
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
    (list of ``(column, fn)``; fn in sum/count/min/max/avg/stddev, column
    ignored for count; avg/stddev stored as decomposed psum/psumsq/pcnt
    parts — read the requested shape back via :func:`read_rollup`) into a
    new lakehouse table, and record the maintenance contract (source
    dims/aggs + the snapshot the state covers) in its properties.

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


def read_rollup(rollup: LakehouseTable) -> DataFrame:
    """Read the rollup in its REQUESTED-aggregate shape: dims plus one
    column per requested aggregate. sum/count/min/max read their stored
    column directly; avg and stddev are derived from the mergeable parts —
    avg = psum/pcnt, sample stddev = sqrt((psumsq - psum²/pcnt)/(pcnt-1)),
    NULL for empty/singleton populations.

    The derivation is a handful of scalar IEEE ops on exactly-merged
    parts, so (for integer-valued or decimal-routed measures) the result
    is bit-identical to a from-scratch avg/stddev over the fact table
    computed with the same formula — the property the differential oracle
    checks.
    """
    dims = _dim_names(json.loads(rollup.log.properties["rollup.dims"]))
    aggs = [tuple(a) for a in json.loads(rollup.log.properties["rollup.aggs"])]
    return _derive_requested(rollup.scan(), dims, aggs)


def _derive_requested(
    df: DataFrame, dim_names: list[str], aggs: list[tuple[str, str]]
) -> DataFrame:
    """Project summary-state rows (dims + mergeable parts) into the
    REQUESTED-aggregate shape."""
    cols: list = [F.col(d) for d in dim_names]
    for col, fn in aggs:
        if fn in ("sum", "count", "min", "max"):
            cols.append(F.col(_out_col(col, fn)))
        elif fn == "avg":
            n = F.col(f"pcnt_{col}").cast("double")
            cols.append(
                F.when(n > 0, F.col(f"psum_{col}") / n).alias(f"avg_{col}")
            )
        else:  # stddev (sample)
            n = F.col(f"pcnt_{col}").cast("double")
            s = F.col(f"psum_{col}")
            ss = F.col(f"psumsq_{col}")
            var = (ss - s * s / n) / (n - F.lit(1.0))
            # FP rounding can push the derivation fractionally negative for
            # near-constant non-integer measures; clamp so stddev surfaces
            # 0.0 there, never NaN from sqrt of a tiny negative.
            var = F.greatest(var, F.lit(0.0))
            cols.append(F.when(n > 1, F.sqrt(var)).alias(f"stddev_{col}"))
    return df.select(*cols)


def reaggregate_rollup(rollup: LakehouseTable, dims: list) -> DataFrame:
    """Answer a COARSER aggregate query from the summary table without
    touching the fact table — the continuous-aggregate read path ("roll up
    the rollup"): an hourly rollup answers daily/weekly questions, a
    per-(a,b) rollup answers per-a questions.

    ``dims`` group the SUMMARY rows: plain strings name stored dimension
    columns; ``(name, sql)`` pairs derive coarser buckets from them (e.g.
    ``("day_bucket", "date_trunc('DAY', hour_bucket)")``). All stored
    aggregates re-merge exactly — sums/counts/psums add, min/max fold, and
    the avg/stddev parts stay decomposed until the final derivation, so a
    twice-merged average equals the from-scratch one bit-for-bit. Cost is
    O(|summary|) regardless of fact-table size.
    """
    aggs = [tuple(a) for a in json.loads(rollup.log.properties["rollup.aggs"])]
    df, names = _dim_cols(rollup.scan(), dims)
    merged = _merge_agg(df, names, aggs)
    return _derive_requested(merged, _dim_names(dims), aggs)


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
