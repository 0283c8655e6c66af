"""Per-file column statistics for scan-time data skipping.

Iceberg manifests carry per-file column bounds so planners skip files whose
[min, max] can't satisfy a predicate; at 100 TB this is the difference
between listing a few files and scanning a few thousand. Our snapshot log
stores the same bounds per file entry (``stats: {col: [min, max]}``), read
from the parquet FOOTER at commit time (row-group statistics — no data pages
touched), and ``prune_files`` evaluates simple predicates against them
before Spark ever sees the file list.

Stats collection is driver-side footer reads — O(files), not O(rows) — the
same cost class as the reference's schema probe (main-daft.py:45).
"""

from __future__ import annotations

import datetime
from typing import Any

import pyarrow.parquet as pq

# stat-typed columns only: orderable primitives with a JSON-safe encoding
_STATABLE = (int, float, str)


def file_row_count(path: str) -> int:
    """Exact row count from the parquet footer — no data pages touched."""
    return pq.ParquetFile(path).metadata.num_rows


def collect_file_stats(path: str, columns: list[str] | None = None) -> dict[str, list]:
    """Column -> [min, max] from the parquet footer's row-group statistics."""
    meta = pq.ParquetFile(path).metadata
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    for rg in range(meta.num_row_groups):
        for ci in range(meta.num_columns):
            col = meta.row_group(rg).column(ci)
            name = col.path_in_schema
            if columns is not None and name not in columns:
                continue
            try:
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                lo_raw, hi_raw = st.min, st.max
            except NotImplementedError:
                # pyarrow can't surface stats for some physical types
                # (e.g. decimals); a statless column just can't be pruned
                # on — it must never fail the COMMIT (skipping is an
                # optimization, not a requirement)
                continue
            lo, hi = _jsonable(lo_raw), _jsonable(hi_raw)
            if lo is None or hi is None:
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    return {c: [mins[c], maxs[c]] for c in mins if c in maxs}


def _jsonable(v: Any):
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v if isinstance(v, _STATABLE) else None


def prune_files(
    files: list[dict[str, Any]], predicates: dict[str, Any]
) -> list[dict[str, Any]]:
    """Keep files whose stats MIGHT satisfy every predicate.

    ``predicates`` maps column -> (op, value) or a LIST of (op, value)
    conjuncts (e.g. a range is ``[(">=", lo), ("<", hi)]``), op in {"=",
    "<", "<=", ">", ">=", "in"}. ``("in", [v1, v2, ...])`` keeps a file if
    ANY listed value falls inside its [min, max] — the probe shape for
    IN-list point lookups (e.g. IVF cell probes). A file with no stats for
    a column is kept (skipping must be conservative). Values compare after
    the same normalization used at collection time.
    """
    out = []
    for f in files:
        stats = f.get("stats") or {}
        keep = True
        for col, preds in predicates.items():
            if col not in stats:
                # a partition VALUE is an exact stat (min == max == value):
                # identity-partitioned files carry no in-file stats for the
                # column, but equality/IN predicates on it prune exactly.
                # Compare through canon_part_str (hive stores booleans
                # lowercase; str(True) is 'True') and only for types with
                # ONE canonical string form — floats may format differently
                # than the writer's path segment, so they keep the file.
                # Range ops stay conservative too (lexicographic order
                # would lie for numerics).
                pv = (f.get("partition") or {}).get(col)
                if pv is not None:
                    from urllib.parse import unquote

                    from pyiceberg_lakehouse_spark.lakehouse.transforms import (
                        canon_part_str,
                    )

                    exact = (str, int, bool)
                    pv_s = unquote(str(pv))
                    for op, value in (
                        [preds] if isinstance(preds, tuple) else preds
                    ):
                        if (
                            op == "="
                            and isinstance(value, exact)
                            and canon_part_str(value) != pv_s
                        ):
                            keep = False
                        elif (
                            op == "in"
                            and value
                            and all(isinstance(v, exact) for v in value)
                            and all(canon_part_str(v) != pv_s for v in value)
                        ):
                            keep = False
                        if not keep:
                            break
                if not keep:
                    break
                continue
            lo, hi = stats[col]
            if isinstance(preds, tuple):
                preds = [preds]
            for op, value in preds:
                if op == "in":
                    vs = [x for x in (_jsonable(v) for v in value) if x is not None]
                    try:
                        if vs and not any(lo <= v <= hi for v in vs):
                            keep = False
                    except TypeError:
                        continue
                    if not keep:
                        break
                    continue
                v = _jsonable(value)
                if v is None:
                    continue
                # incomparable types (int probe vs string stats recorded
                # under an older schema) must keep the file, not fail the
                # scan — skipping is always conservative
                try:
                    if op == "=" and not (lo <= v <= hi):
                        keep = False
                    elif op in ("<", "<=") and not (lo <= v if op == "<=" else lo < v):
                        keep = False
                    elif op in (">", ">=") and not (v <= hi if op == ">=" else v < hi):
                        keep = False
                except TypeError:
                    continue
                if not keep:
                    break
            if not keep:
                break
        if keep:
            out.append(f)
    return out
