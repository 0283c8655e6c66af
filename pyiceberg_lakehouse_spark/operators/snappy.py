"""Snappy raw-format decompressor, pure Python.

The Hadoop ecosystem's default block codec (Avro's common codec,
parquet's legacy default). Raw snappy only — a varint uncompressed
length followed by literal / 1-2-4-byte-offset copy tags (the framing
format with chunk headers is a different container and raises).

Validated against the reference implementation: every test frame in
tests/test_snappy.py is produced by pyarrow's bundled snappy encoder
(the same external-validation posture as the zstd decoder).
"""

from __future__ import annotations


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy varint truncated")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy varint longer than 32 bits")


def decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Raw snappy block -> bytes. Strict: truncated tags, offsets
    before the start, and length mismatches raise."""
    if data[:10] == b"\xff\x06\x00\x00sNaPpY":
        raise NotImplementedError(
            "snappy FRAMING format (chunked stream) — raw blocks only"
        )
    n, pos = _uvarint(data, 0)
    if n > max_output:
        raise ValueError("snappy output exceeds the allowed maximum")
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                nbytes = length - 60
                if pos + nbytes > len(data):
                    raise ValueError("snappy literal length truncated")
                length = int.from_bytes(
                    data[pos : pos + nbytes], "little"
                ) + 1
                pos += nbytes
            if pos + length > len(data):
                raise ValueError("snappy literal overruns its input")
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            if pos >= len(data):
                raise ValueError("snappy copy-1 offset truncated")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > len(data):
                raise ValueError("snappy copy-2 offset truncated")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > len(data):
                raise ValueError("snappy copy-4 offset truncated")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy copy offset outside the output")
        start = len(out) - offset
        for k in range(length):  # overlap-safe byte copy
            out.append(out[start + k])
        if len(out) > max_output:
            raise ValueError("snappy output exceeds the allowed maximum")
    if len(out) != n:
        raise ValueError(
            f"snappy header says {n} bytes, stream decoded {len(out)}"
        )
    return bytes(out)
