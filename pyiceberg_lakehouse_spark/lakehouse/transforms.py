"""Iceberg-style partition transforms (hidden partitioning).

The reference's partition specs are identity-only (IdentityTransform,
main-daft.py:86-92), but Iceberg's data model — and any 100 TB table keyed
by time or a high-cardinality id — needs transforms: ``day(ts)`` keeps one
partition per day instead of per microsecond, ``bucket(16, user_id)`` caps
partition count on an unbounded key, ``truncate(4, code)`` groups by prefix.

A spec is a list of strings, each either a bare column (identity) or
``transform(args..., column)``:

    ["o_orderstatus"]                       identity
    ["month(o_orderdate)"]                  one dir per calendar month
    ["bucket(8, o_custkey)", "day(ts)"]     composable

Derived partition values are computed at WRITE time as ordinary Catalyst
expressions (no UDF) and recorded per file in the snapshot log; the source
column stays in the data files (transforms are lossy), so reads are
transparent — queries filter the source column as usual, and scan-time
pruning maps a source predicate to derived values driver-side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date, datetime
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPEC = re.compile(r"^\s*(\w+)\s*\(\s*(?:(\d+)\s*,\s*)?([\w.]+)\s*\)\s*$")

_TRANSFORMS = ("identity", "year", "month", "day", "hour", "bucket", "truncate")


@dataclass(frozen=True)
class PartitionField:
    source: str  # source column name
    transform: str  # one of _TRANSFORMS
    param: int | None  # bucket count / truncate width
    name: str  # partition directory key (identity: the source name)

    @property
    def is_identity(self) -> bool:
        return self.transform == "identity"


def parse_spec(spec: str) -> PartitionField:
    m = _SPEC.match(spec)
    if not m:
        return PartitionField(spec.strip(), "identity", None, spec.strip())
    transform, param, source = m.group(1), m.group(2), m.group(3)
    if transform not in _TRANSFORMS:
        raise ValueError(f"unknown partition transform {transform!r} in {spec!r}")
    if transform in ("bucket", "truncate") and param is None:
        raise ValueError(f"{transform} needs a numeric parameter: {spec!r}")
    return PartitionField(
        source,
        transform,
        int(param) if param is not None else None,
        f"{source}_{transform}",
    )


def parse_fields(specs: list[str]) -> list[PartitionField]:
    return [parse_spec(s) for s in specs]


def derived_column(pf: PartitionField) -> Column:
    """Catalyst expression computing the partition value of a source column.

    Values are strings with lexicographic ordering matching the transform's
    natural ordering, so hive directory names stay human-readable and
    metadata range pruning on names remains possible.
    """
    c = F.col(pf.source)
    if pf.transform == "identity":
        return c
    if pf.transform == "year":
        return F.date_format(c, "yyyy")
    if pf.transform == "month":
        return F.date_format(c, "yyyy-MM")
    if pf.transform == "day":
        return F.date_format(c, "yyyy-MM-dd")
    if pf.transform == "hour":
        return F.date_format(c, "yyyy-MM-dd-HH")
    if pf.transform == "bucket":
        return F.pmod(F.xxhash64(c), F.lit(pf.param)).cast("string")
    if pf.transform == "truncate":
        # string form (prefix); numeric sources resolve via
        # derived_column_typed to Iceberg's round-down-to-multiple
        return F.substring(c.cast("string"), 1, pf.param)
    raise AssertionError(pf.transform)


def derived_column_typed(pf: PartitionField, dtype_simple: str) -> Column:
    """Like ``derived_column`` but resolves type-dependent transforms."""
    if pf.transform == "truncate" and dtype_simple in (
        "int",
        "bigint",
        "smallint",
        "tinyint",
    ):
        c = F.col(pf.source)
        return (c - F.pmod(c, F.lit(pf.param))).cast("string")
    return derived_column(pf)


def canon_part_str(value: Any) -> str:
    """Canonical hive-path string for a partition value.

    Hive layouts (and the snapshot log's partition entries) store booleans
    lowercase (``flag=true``); Python's ``str(True)`` is ``'True'``, which
    would prune every matching file. Normalize bools; everything else keeps
    its ``str`` form.
    """
    if isinstance(value, bool):
        return str(value).lower()
    return str(value)


def probe_value(spark, pf: PartitionField, value: Any, dtype_simple: str) -> str:
    """Partition value a given SOURCE value lands in — drives scan pruning.

    year/month/day/hour/truncate compute driver-side; bucket goes through a
    1-row Spark job so the hash is exactly the write path's xxhash64.
    """
    if pf.transform == "identity":
        return canon_part_str(value)
    if pf.transform in ("year", "month", "day", "hour"):
        v = value
        if isinstance(v, str):
            v = datetime.fromisoformat(v)
        assert isinstance(v, (date, datetime)), f"need a date for {pf.transform}"
        fmt = {
            "year": "%Y",
            "month": "%Y-%m",
            "day": "%Y-%m-%d",
            "hour": "%Y-%m-%d-%H",
        }[pf.transform]
        return v.strftime(fmt)
    if pf.transform == "truncate":
        if isinstance(value, int):
            return str(value - (value % pf.param))
        return str(value)[: pf.param]
    if pf.transform == "bucket":
        row = (
            spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(value).cast(dtype_simple)), F.lit(pf.param))
                .cast("string")
                .alias("b")
            )
            .collect()[0]
        )
        return row["b"]
    raise AssertionError(pf.transform)
