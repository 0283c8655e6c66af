"""Iceberg partition transforms + single-value serialization + the
metadata-time pruning calculus (spec §"Partition Transforms" and
Appendix B/D), pure Python — the planning layer real Iceberg tables
rely on at 100 TB: a predicate constant is pushed THROUGH the
transform so bucket/truncate/temporal-partitioned files prune at
metadata time, and manifest ``lower_bounds``/``upper_bounds`` skip
files whose value range cannot match.

Everything here is from the public Apache Iceberg table spec:

- ``murmur3_32`` is MurmurHash3 x86 32-bit (public domain algorithm),
  the spec's required bucket hash. Validated in
  tests/test_iceberg_transforms.py against BOTH the widely published
  murmur3 vectors (e.g. "hello" @ seed 0) and the Iceberg spec
  Appendix B hash-requirement vectors (34 -> 2017239379,
  "iceberg" -> 1210000089) — if either family mismatched, bucket
  values would disagree with real Iceberg writers.
- ``serialize_single_value`` is Appendix D single-value
  serialization: little-endian fixed-width for int/long/float/double
  (ints HASH as 8-byte longs per Appendix B so bucket(int)==
  bucket(long)), UTF-8 for strings, dates as days, timestamps as
  micros.
- Pruning is CONSERVATIVE by construction: any file the rules cannot
  prove non-matching is kept (missing bounds, missing partition
  value, an op the transform cannot serve — bucket only serves
  equality). Skipping is an optimization; the query's own filter
  owns correctness.

Reference parity: the reference reads Iceberg through DuckDB's
iceberg_scan (query_iceberg_duckdb.py:24-27) and gets this pruning
from the library; here it is native so the same metadata walk the
engine already does (iceberg_interop.py) plans like a real reader.
"""

from __future__ import annotations

import struct
from typing import Any

_MASK32 = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit -> SIGNED 32-bit int (Java semantics,
    which is what the Iceberg spec's bucket transform consumes)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK32
    n = len(data)
    limit = n - (n % 4)
    for i in range(0, limit, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK32
        h = (h * 5 + 0xE6546B64) & _MASK32
    k = 0
    for i in range(n - 1, limit - 1, -1):
        k = (k << 8) | data[i]
    if k:
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


# ---------------------------------------------- single-value serde --

_US_PER_HOUR = 3_600_000_000


def serialize_single_value(value: Any, ice_type: str) -> bytes:
    """Appendix D single-value serialization (the bounds-map payload
    and the bucket-hash input format)."""
    if value is None:
        raise ValueError("cannot serialize a null bound")
    if ice_type == "boolean":
        return b"\x01" if value else b"\x00"
    if ice_type in ("int", "date"):
        return struct.pack("<i", int(value))
    if ice_type in ("long", "time", "timestamp", "timestamptz"):
        return struct.pack("<q", int(value))
    if ice_type == "float":
        return struct.pack("<f", float(value))
    if ice_type == "double":
        return struct.pack("<d", float(value))
    if ice_type == "string":
        return str(value).encode("utf-8")
    if ice_type == "binary":
        return bytes(value)
    raise NotImplementedError(
        f"iceberg single-value serialization for type {ice_type}"
    )


def deserialize_single_value(data: bytes, ice_type: str) -> Any:
    try:
        if ice_type == "boolean":
            # Appendix D: booleans are exactly one 0x00/0x01 byte;
            # b"" or multi-byte blobs reject like the fixed-width types
            if len(data) != 1:
                raise ValueError(
                    "iceberg single-value bytes invalid for boolean: "
                    f"expected 1 byte, got {len(data)}"
                )
            return data != b"\x00"
        if ice_type in ("int", "date"):
            return struct.unpack("<i", data)[0]
        if ice_type in ("long", "time", "timestamp", "timestamptz"):
            return struct.unpack("<q", data)[0]
        if ice_type == "float":
            return struct.unpack("<f", data)[0]
        if ice_type == "double":
            return struct.unpack("<d", data)[0]
        if ice_type == "string":
            return data.decode("utf-8")
    except (struct.error, UnicodeDecodeError) as exc:
        # corrupt manifest bytes reject structurally (the repo's
        # clean-rejection contract), never as a raw struct crash
        raise ValueError(
            f"iceberg single-value bytes invalid for {ice_type}: {exc}"
        ) from exc
    if ice_type == "binary":
        return bytes(data)
    raise NotImplementedError(
        f"iceberg single-value deserialization for type {ice_type}"
    )


def bucket_hash(value: Any, ice_type: str) -> int:
    """Appendix B: ints/dates hash as the 8-byte long with the same
    value (so bucket(int 34) == bucket(long 34)); times/timestamps as
    their long micros; strings as UTF-8."""
    if ice_type in ("int", "long", "date", "time", "timestamp",
                    "timestamptz"):
        return murmur3_32(struct.pack("<q", int(value)))
    if ice_type in ("string", "binary"):
        return murmur3_32(serialize_single_value(value, ice_type))
    raise NotImplementedError(f"iceberg bucket over type {ice_type}")


# -------------------------------------------------- transform apply --


def parse_transform(spec: str) -> tuple[str, int | None]:
    """'identity' -> ('identity', None); 'bucket[16]' -> ('bucket',
    16); 'truncate[4]' -> ('truncate', 4); temporal names pass
    through."""
    s = spec.strip().lower()
    if "[" in s:
        name, _, arg = s.partition("[")
        return name, int(arg.rstrip("]"))
    return s, None


def apply_transform(transform: str, value: Any, ice_type: str) -> Any:
    """The transform of a VALUE (what a writer stores in the r102
    partition struct, and what the planner computes from a predicate
    constant). Null passes through (spec: transforms preserve null).

    Temporal sources are epoch-based integers (date: days,
    timestamp: micros) — the spec's internal representation."""
    if value is None:
        return None
    name, arg = parse_transform(transform)
    if name == "identity":
        return value
    if name == "void":
        return None
    if name == "bucket":
        return (bucket_hash(value, ice_type) & 0x7FFFFFFF) % arg
    if name == "truncate":
        if ice_type in ("int", "long"):
            v = int(value)
            return v - (v % arg)  # Python % is floor-mod, per spec
        if ice_type == "string":
            return str(value)[:arg]
        raise NotImplementedError(
            f"iceberg truncate over type {ice_type}"
        )
    if name in ("year", "month", "day", "hour"):
        if ice_type == "date":
            days = int(value)
            import datetime as _dt

            d = _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
            if name == "year":
                return d.year - 1970
            if name == "month":
                return (d.year - 1970) * 12 + (d.month - 1)
            if name == "day":
                return days
            raise ValueError("iceberg: hour transform over a date")
        if ice_type in ("timestamp", "timestamptz"):
            us = int(value)
            if name == "hour":
                return us // _US_PER_HOUR
            days = us // (24 * _US_PER_HOUR)
            if name == "day":
                return days
            import datetime as _dt

            d = _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
            if name == "year":
                return d.year - 1970
            return (d.year - 1970) * 12 + (d.month - 1)
        raise NotImplementedError(
            f"iceberg {name} transform over type {ice_type}"
        )
    raise NotImplementedError(f"iceberg transform {transform}")


# ----------------------------------------------------- prune calculus --

_OPS = ("=", "<", "<=", ">", ">=", "in")


def partition_may_match(
    transform: str, part_value: Any, op: str, const: Any, ice_type: str
) -> bool:
    """Can a file whose r102 partition value is ``part_value`` hold a
    row satisfying ``source op const``? False ONLY when provably not.

    - identity serves every op exactly;
    - bucket serves only = / in (ranges don't survive hashing);
    - truncate[W] on int/long is exact interval arithmetic
      (rows live in [p, p+W-1]);
    - truncate on string and the temporal transforms compare at
      transform granularity, conservative at the boundary.
    """
    if op not in _OPS:
        raise ValueError(f"iceberg prune op {op!r}")
    if part_value is None:
        return True  # null partition (or unknown) — cannot disprove
    if op == "in":
        return any(
            partition_may_match(transform, part_value, "=", c, ice_type)
            for c in const
        )
    name, arg = parse_transform(transform)
    if name == "identity":
        if op == "=":
            return part_value == const
        if op == "<":
            return part_value < const
        if op == "<=":
            return part_value <= const
        if op == ">":
            return part_value > const
        return part_value >= const
    if name == "bucket":
        if op == "=":
            return part_value == apply_transform(transform, const, ice_type)
        return True  # bucket cannot serve ranges
    if name == "truncate" and ice_type in ("int", "long"):
        c = int(const)
        lo = int(part_value)          # rows are in [lo, lo + arg - 1]
        hi = lo + arg - 1
        if op == "=":
            return lo <= c <= hi
        if op == "<":
            return lo < c
        if op == "<=":
            return lo <= c
        if op == ">":
            return hi > c
        return hi >= c
    if name == "truncate" and ice_type == "string":
        if op == "=":
            return part_value == str(const)[:arg]
        return True  # conservative on string ranges
    if name in ("year", "month", "day", "hour"):
        tc = apply_transform(transform, const, ice_type)
        if op == "=":
            return part_value == tc
        if op in ("<", "<="):
            return part_value <= tc
        return part_value >= tc
    return True  # unknown transform: keep (never silently wrong)


def bounds_may_match(
    lower: Any, upper: Any, op: str, const: Any
) -> bool:
    """Can a file whose column range is [lower, upper] hold a row
    satisfying ``col op const``? Missing bounds keep the file."""
    if op == "in":
        return any(
            bounds_may_match(lower, upper, "=", c) for c in const
        )
    if op == "=":
        return ((lower is None or lower <= const)
                and (upper is None or upper >= const))
    if op == "<":
        return lower is None or lower < const
    if op == "<=":
        return lower is None or lower <= const
    if op == ">":
        return upper is None or upper > const
    if op == ">=":
        return upper is None or upper >= const
    raise ValueError(f"iceberg prune op {op!r}")
