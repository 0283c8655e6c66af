"""Roaring bitmaps, pure Python, from the public RoaringFormatSpec
(github.com/RoaringBitmap/RoaringFormatSpec) — the serialization
Iceberg v3 DELETION VECTORS carry inside Puffin blobs.

32-bit portable format:
- cookie: SERIAL_COOKIE_NO_RUNCONTAINER (12346) as u32 LE followed by
  a u32 LE container count, OR SERIAL_COOKIE (12347) in the low 16
  bits with (count-1) in the high 16 bits followed by the run-flag
  bitset ((count+7)//8 bytes, LSB-first);
- descriptive header: per container u16 LE key + u16 LE
  (cardinality-1);
- offset header: u32 LE absolute offsets, present always for the
  no-run cookie and, with the run cookie, only when count >=
  NO_OFFSET_THRESHOLD (4);
- containers in key order: ARRAY (cardinality <= 4096: u16 LE
  values), BITMAP (8 KiB, 1024 u64 LE words), RUN (u16 LE n_runs,
  then per run u16 LE start + u16 LE (length-1)).

64-bit "portable" format (Roaring64NavigableMap): u64 LE count of
32-bit buckets, then per bucket u32 LE high-bits key + a 32-bit
portable serialization. (Iceberg's DV spec pins this exact layout and
adds its own magic/CRC framing — see lakehouse/puffin.py.)

The writer picks the smallest container encoding (array vs bitmap vs
run) like the reference implementations; the reader accepts any mix.
Self-validating: round-trips are bit-exact and every container type
is pinned in tests/test_puffin.py. No roaring library exists in this
sandbox, so cross-validation is structural (format constants, sizes,
known-layout vectors built by hand).
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def _split_runs(values: list[int]) -> list[tuple[int, int]]:
    """Sorted distinct u16 values -> [(start, run_length)]."""
    runs = []
    start = prev = values[0]
    for v in values[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start + 1))
        start = prev = v
    runs.append((start, prev - start + 1))
    return runs


def _container_encodings(values: list[int]) -> tuple[str, bytes]:
    """Pick the smallest of array/bitmap/run for one container."""
    n = len(values)
    runs = _split_runs(values)
    size_array = 2 * n
    size_bitmap = 8192
    size_run = 2 + 4 * len(runs)
    best = min(
        (size_run, "run"),
        (size_array if n <= _ARRAY_MAX else 1 << 30, "array"),
        (size_bitmap, "bitmap"),
    )[1]
    if best == "array":
        return "array", struct.pack(f"<{n}H", *values)
    if best == "bitmap":
        words = [0] * 1024
        for v in values:
            words[v >> 6] |= 1 << (v & 63)
        return "bitmap", struct.pack("<1024Q", *words)
    out = bytearray(struct.pack("<H", len(runs)))
    for start, length in runs:
        out += struct.pack("<HH", start, length - 1)
    return "run", bytes(out)


def serialize_roaring32(values) -> bytes:
    """Sorted-or-not iterable of u32 values -> portable bytes."""
    vals = sorted(set(int(v) for v in values))
    if vals and not 0 <= vals[-1] < (1 << 32):
        raise ValueError("roaring32 value out of the u32 range")
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    enc = [_container_encodings(buckets[k]) for k in keys]
    has_run = any(kind == "run" for kind, _ in enc)
    n = len(keys)
    out = bytearray()
    if has_run:
        out += struct.pack("<I", SERIAL_COOKIE | ((n - 1) << 16))
        flags = bytearray((n + 7) // 8)
        for i, (kind, _) in enumerate(enc):
            if kind == "run":
                flags[i // 8] |= 1 << (i % 8)
        out += flags
        write_offsets = n >= NO_OFFSET_THRESHOLD
    else:
        out += struct.pack("<II", SERIAL_COOKIE_NO_RUN, n)
        write_offsets = True
    for k, (_kind, _blob) in zip(keys, enc):
        out += struct.pack("<HH", k, len(buckets[k]) - 1)
    if write_offsets:
        at = len(out) + 4 * n
        for _k, (_kind, blob) in zip(keys, enc):
            out += struct.pack("<I", at)
            at += len(blob)
    for _kind, blob in enc:
        out += blob
    return bytes(out)


def deserialize_roaring32(data: bytes, at: int = 0) -> tuple[list[int], int]:
    """Portable bytes -> (sorted u32 values, next offset). Truncated
    or corrupt bytes reject as ValueError (clean-rejection contract),
    never as a raw struct crash."""
    try:
        return _deserialize_roaring32(data, at)
    except struct.error as exc:
        raise ValueError(f"roaring32: truncated stream: {exc}") from exc


def _deserialize_roaring32(data: bytes, at: int) -> tuple[list[int], int]:
    if at + 4 > len(data):
        raise ValueError("roaring32: truncated cookie")
    cookie = struct.unpack_from("<I", data, at)[0]
    base = at
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        at += 4
        nb = (n + 7) // 8
        flags = data[at : at + nb]
        if len(flags) != nb:
            raise ValueError("roaring32: truncated run flags")
        at += nb
        run_flags = [(flags[i // 8] >> (i % 8)) & 1 for i in range(n)]
        has_offsets = n >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUN:
        n = struct.unpack_from("<I", data, at + 4)[0]
        at += 8
        run_flags = [0] * n
        has_offsets = True
    else:
        raise ValueError(f"roaring32: unknown cookie {cookie}")
    keys = []
    cards = []
    for _ in range(n):
        if at + 4 > len(data):
            raise ValueError("roaring32: truncated descriptive header")
        k, cm1 = struct.unpack_from("<HH", data, at)
        at += 4
        keys.append(k)
        cards.append(cm1 + 1)
    offsets = None
    if has_offsets:
        offsets = []
        for _ in range(n):
            offsets.append(struct.unpack_from("<I", data, at)[0])
            at += 4
    out: list[int] = []
    for i in range(n):
        if offsets is not None:
            at = base + offsets[i]
        hi = keys[i] << 16
        card = cards[i]
        if run_flags[i]:
            n_runs = struct.unpack_from("<H", data, at)[0]
            at += 2
            got = 0
            for _ in range(n_runs):
                start, lm1 = struct.unpack_from("<HH", data, at)
                at += 4
                out.extend(hi | v for v in range(start, start + lm1 + 1))
                got += lm1 + 1
            if got != card:
                raise ValueError(
                    "roaring32: run container cardinality mismatch"
                )
        elif card > _ARRAY_MAX:
            words = struct.unpack_from("<1024Q", data, at)
            at += 8192
            got = 0
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    out.append(hi | (wi << 6) | (b.bit_length() - 1))
                    w ^= b
                    got += 1
            if got != card:
                raise ValueError(
                    "roaring32: bitmap container cardinality mismatch"
                )
        else:
            vals = struct.unpack_from(f"<{card}H", data, at)
            at += 2 * card
            prev = -1
            for v in vals:
                if v <= prev:
                    raise ValueError(
                        "roaring32: array container not strictly sorted"
                    )
                prev = v
                out.append(hi | v)
    return out, at


def serialize_roaring64(values) -> bytes:
    """u64 values -> the 64-bit portable format (u64 LE bucket count,
    then per bucket u32 LE high key + 32-bit portable bytes)."""
    vals = sorted(set(int(v) for v in values))
    if vals and not 0 <= vals[-1] < (1 << 64):
        raise ValueError("roaring64 value out of the u64 range")
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for k in sorted(buckets):
        out += struct.pack("<I", k)
        out += serialize_roaring32(buckets[k])
    return bytes(out)


def deserialize_roaring64(data: bytes) -> list[int]:
    try:
        return _deserialize_roaring64(data)
    except struct.error as exc:
        raise ValueError(f"roaring64: truncated stream: {exc}") from exc


def _deserialize_roaring64(data: bytes) -> list[int]:
    if len(data) < 8:
        raise ValueError("roaring64: truncated bucket count")
    n = struct.unpack_from("<Q", data, 0)[0]
    at = 8
    out: list[int] = []
    prev_key = -1
    for _ in range(n):
        if at + 4 > len(data):
            raise ValueError("roaring64: truncated bucket key")
        k = struct.unpack_from("<I", data, at)[0]
        if k <= prev_key:
            raise ValueError("roaring64: bucket keys not ascending")
        prev_key = k
        at += 4
        vals, at = deserialize_roaring32(data, at)
        out.extend((k << 32) | v for v in vals)
    if at != len(data):
        raise ValueError("roaring64: trailing bytes after last bucket")
    return out
