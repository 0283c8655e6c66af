"""Avro Object Container Files (the Hadoop-era row format) — reader +
writer, pure stdlib.

Implements the Avro 1.11 spec's binary encoding and container layout:
the Obj\\x01 magic, file-metadata map carrying the writer schema JSON
and codec, 16-byte sync markers framing each block, zigzag-varint
longs, length-prefixed strings/bytes, little-endian IEEE float/double,
records as field concatenation, arrays/maps in count-prefixed blocks
(including the negative-count + block-size form writers may emit),
unions as index + value, enums as index, fixed as raw bytes, and ALL SIX
spec codecs: null, deflate, snappy AND zstandard both directions
through the pure-Python codecs in operators/snappy.py and
operators/zstd.py (each cross-validated against its reference
implementation; snappy CRC32-checked per the spec), plus bzip2 + xz
via stdlib.

Schema support covers the tabular shapes lakehouse interchange actually
uses: records of primitives, nullable-union columns, arrays, maps,
enums, fixed. Recursive/logical types pass through structurally (a
logical type reads as its underlying type, per spec §Logical Types).

Validation: byte-level pins of the spec's own encoding examples
(zigzag, the §Binary Encoding worked examples) plus writer<->reader
round trips across codecs and block sizes (tests/test_avro.py).

Reference parity: the reference reads tabular files only through
engine-bundled readers (parquet via Daft/Polars); Avro closes this
repo's last gated tabular SOURCE (sources/ docstring: "Avro honestly
gated: external module" — no longer).
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ------------------------------------------------------ binary encoding --


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("avro varint truncated")
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("avro varint longer than 64 bits")
    return (u >> 1) ^ -(u & 1), pos


def _encode_value(value, schema) -> bytes:
    if isinstance(schema, dict) and "logicalType" in schema:
        schema = {k: v for k, v in schema.items() if k != "logicalType"}
        if set(schema) == {"type"}:
            schema = schema["type"]
    if isinstance(schema, list):  # union
        for idx, branch in enumerate(schema):
            if _matches(value, branch):
                return _zigzag_encode(idx) + _encode_value(value, branch)
        raise ValueError(f"value {value!r} fits no union branch {schema}")
    stype = schema["type"] if isinstance(schema, dict) else schema
    if stype == "null":
        return b""
    if stype == "boolean":
        return b"\x01" if value else b"\x00"
    if stype in ("int", "long"):
        return _zigzag_encode(int(value))
    if stype == "float":
        return struct.pack("<f", float(value))
    if stype == "double":
        return struct.pack("<d", float(value))
    if stype == "string":
        b = str(value).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    if stype == "bytes":
        return _zigzag_encode(len(value)) + bytes(value)
    if stype == "record":
        out = bytearray()
        for f in schema["fields"]:
            out += _encode_value(value[f["name"]], f["type"])
        return bytes(out)
    if stype == "array":
        if not value:
            return _zigzag_encode(0)
        return (
            _zigzag_encode(len(value))
            + b"".join(_encode_value(v, schema["items"]) for v in value)
            + _zigzag_encode(0)
        )
    if stype == "map":
        if not value:
            return _zigzag_encode(0)
        out = bytearray(_zigzag_encode(len(value)))
        for k, v in value.items():
            kb = str(k).encode("utf-8")
            out += _zigzag_encode(len(kb)) + kb
            out += _encode_value(v, schema["values"])
        return bytes(out) + _zigzag_encode(0)
    if stype == "enum":
        return _zigzag_encode(schema["symbols"].index(value))
    if stype == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed value has the wrong size")
        return bytes(value)
    raise NotImplementedError(f"avro type {stype!r}")


def _matches(value, schema) -> bool:
    stype = schema["type"] if isinstance(schema, dict) else schema
    if stype == "null":
        return value is None
    if value is None:
        return False
    if stype == "boolean":
        return isinstance(value, bool)
    if stype in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if stype in ("float", "double"):
        return isinstance(value, float)
    if stype == "string":
        return isinstance(value, str)
    if stype in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    return True


def _decode_value(data: bytes, pos: int, schema):
    if isinstance(schema, dict) and "logicalType" in schema:
        schema = {k: v for k, v in schema.items() if k != "logicalType"}
        if set(schema) == {"type"}:
            schema = schema["type"]
    if isinstance(schema, list):  # union
        idx, pos = _zigzag_decode(data, pos)
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro union index {idx} out of range")
        return _decode_value(data, pos, schema[idx])
    stype = schema["type"] if isinstance(schema, dict) else schema
    if stype == "null":
        return None, pos
    if stype == "boolean":
        if pos >= len(data):
            raise ValueError("avro boolean truncated")
        return bool(data[pos]), pos + 1
    if stype in ("int", "long"):
        return _zigzag_decode(data, pos)
    if stype == "float":
        if pos + 4 > len(data):
            raise ValueError("avro float truncated")
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if stype == "double":
        if pos + 8 > len(data):
            raise ValueError("avro double truncated")
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if stype in ("string", "bytes"):
        n, pos = _zigzag_decode(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError("avro string/bytes length out of bounds")
        raw = data[pos : pos + n]
        return (raw.decode("utf-8") if stype == "string" else raw), pos + n
    if stype == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], pos = _decode_value(data, pos, f["type"])
        return out, pos
    if stype == "array" or stype == "map":
        out_list: list = []
        out_map: dict = {}
        while True:
            count, pos = _zigzag_decode(data, pos)
            if count == 0:
                break
            if count < 0:  # block-size form: size precedes the items
                _size, pos = _zigzag_decode(data, pos)
                count = -count
            for _ in range(count):
                if stype == "map":
                    klen, pos = _zigzag_decode(data, pos)
                    if klen < 0 or pos + klen > len(data):
                        raise ValueError("avro map key length out of bounds")
                    key = data[pos : pos + klen].decode("utf-8")
                    pos += klen
                    out_map[key], pos = _decode_value(
                        data, pos, schema["values"]
                    )
                else:
                    v, pos = _decode_value(data, pos, schema["items"])
                    out_list.append(v)
        return (out_map if stype == "map" else out_list), pos
    if stype == "enum":
        idx, pos = _zigzag_decode(data, pos)
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise ValueError(f"avro enum index {idx} out of range")
        return symbols[idx], pos
    if stype == "fixed":
        n = schema["size"]
        if pos + n > len(data):
            raise ValueError("avro fixed truncated")
        return data[pos : pos + n], pos + n
    raise NotImplementedError(f"avro type {stype!r}")


# ---------------------------------------------------------- container --


def encode_avro(
    records: list[dict],
    schema: dict,
    codec: str = "null",
    sync: bytes | None = None,
    block_records: int = 0,
    extra_meta: dict[str, bytes] | None = None,
) -> bytes:
    """records + writer schema -> Object Container File bytes.
    ``block_records`` > 0 splits the data into multiple blocks.
    ``extra_meta``: application metadata key/value pairs written into
    the container header (e.g. Iceberg's ``schema`` /
    ``partition-spec`` / ``format-version`` manifest keys); reserved
    ``avro.*`` keys are rejected."""
    if codec not in ("null", "deflate", "snappy", "bzip2", "xz",
                     "zstandard"):
        raise ValueError(
            "codec must be one of null/deflate/snappy/bzip2/xz/zstandard"
        )
    sync = sync or bytes(range(16))
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (extra_meta or {}).items():
        if k.startswith("avro."):
            raise ValueError(f"extra_meta key {k!r} is reserved")
        meta[k] = bytes(v)
    out = bytearray(MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += sync
    n = block_records or max(len(records), 1)
    for at in range(0, max(len(records), 1), n):
        chunk = records[at : at + n]
        if not chunk and records:
            break
        body = b"".join(_encode_value(r, schema) for r in chunk)
        if codec == "deflate":
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = comp.compress(body) + comp.flush()
        elif codec == "snappy":
            # the spec appends a 4-byte big-endian CRC32 of the
            # UNCOMPRESSED data after the compressed block
            from pyiceberg_lakehouse_spark.operators.snappy import (
                compress as _snappy_c,
            )

            crc = zlib.crc32(body) & 0xFFFFFFFF
            body = _snappy_c(body) + crc.to_bytes(4, "big")
        elif codec == "bzip2":
            import bz2 as _bz2

            body = _bz2.compress(body)
        elif codec == "xz":
            import lzma as _lzma

            body = _lzma.compress(body, format=_lzma.FORMAT_XZ)
        elif codec == "zstandard":
            # both directions from scratch: operators/zstd.py's
            # predefined-FSE compressor (libzstd-cross-validated) and
            # its RFC 8878 decoder
            from pyiceberg_lakehouse_spark.operators.zstd import (
                compress as _zstd_c,
            )

            body = _zstd_c(body)
        out += _zigzag_encode(len(chunk))
        out += _zigzag_encode(len(body))
        out += body
        out += sync
        if not records:
            break
    return bytes(out)


def decode_avro(data: bytes) -> dict:
    """Object Container File -> {schema, codec, n_blocks, records}."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container (Obj\\x01 missing)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _zigzag_decode(data, pos)
        if count == 0:
            break
        if count < 0:
            _size, pos = _zigzag_decode(data, pos)
            count = -count
        for _ in range(count):
            klen, pos = _zigzag_decode(data, pos)
            if klen < 0 or pos + klen > len(data):
                raise ValueError("avro metadata key length out of bounds")
            key = data[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _zigzag_decode(data, pos)
            if vlen < 0 or pos + vlen > len(data):
                raise ValueError("avro metadata value length out of bounds")
            meta[key] = data[pos : pos + vlen]
            pos += vlen
    if "avro.schema" not in meta:
        raise ValueError("avro file metadata lacks avro.schema")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy", "bzip2", "xz",
                     "zstandard"):
        raise NotImplementedError(
            f"avro codec {codec!r}"
            " (null/deflate/snappy/bzip2/xz/zstandard supported)"
        )
    sync = data[pos : pos + 16]
    if len(sync) != 16:
        raise ValueError("avro header sync marker truncated")
    pos += 16
    records: list = []
    n_blocks = 0
    while pos < len(data):
        count, pos = _zigzag_decode(data, pos)
        size, pos = _zigzag_decode(data, pos)
        if count < 0 or size < 0 or pos + size + 16 > len(data):
            raise ValueError("avro block extends past the file")
        body = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError("avro block sync marker mismatch")
        pos += 16
        if codec == "deflate":
            d = zlib.decompressobj(-15)
            body = d.decompress(body)
            body += d.flush()
        elif codec == "snappy":
            from pyiceberg_lakehouse_spark.operators.snappy import (
                decompress as _snappy,
            )

            if len(body) < 4:
                raise ValueError("avro snappy block lacks its CRC")
            body, want = _snappy(body[:-4]), int.from_bytes(body[-4:], "big")
            if (zlib.crc32(body) & 0xFFFFFFFF) != want:
                raise ValueError("avro snappy block CRC mismatch")
        elif codec == "bzip2":
            import bz2 as _bz2

            body = _bz2.decompress(body)
        elif codec == "xz":
            import lzma as _lzma

            body = _lzma.decompress(body, format=_lzma.FORMAT_XZ)
        elif codec == "zstandard":
            from pyiceberg_lakehouse_spark.operators.zstd import (
                decompress as _zstd,
            )

            body = _zstd(body)
        at = 0
        for _ in range(count):
            rec, at = _decode_value(body, at, schema)
            records.append(rec)
        if at != len(body):
            raise ValueError("avro block has trailing bytes after its rows")
        n_blocks += 1
    return {
        "schema": schema, "codec": codec,
        "n_blocks": n_blocks, "records": records,
        "meta": {k: v for k, v in meta.items()
                 if not k.startswith("avro.")},
    }
