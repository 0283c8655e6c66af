"""Avro object-container codec tests (operators/avro.py): spec-vector
pins, writer<->reader round trips, container strictness."""

from __future__ import annotations

import pytest

from pyiceberg_lakehouse_spark.operators import avro

SCHEMA = {
    "type": "record", "name": "Doc", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": ["null", "double"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "status", "type": {
            "type": "enum", "name": "S", "symbols": ["NEW", "OK", "BAD"]}},
        {"name": "attrs", "type": {"type": "map", "values": "int"}},
        {"name": "sig", "type": {"type": "fixed", "name": "F", "size": 4}},
        {"name": "flag", "type": "boolean"},
    ],
}


def _records(n=20):
    return [
        {
            "id": i, "name": f"n{i}",
            "score": None if i % 3 == 0 else i * 1.5,
            "tags": [f"t{j}" for j in range(i % 4)],
            "status": ("NEW", "OK", "BAD")[i % 3],
            "attrs": {f"k{j}": j * i for j in range(i % 3)},
            "sig": bytes([i & 0xFF] * 4),
            "flag": i % 2 == 0,
        }
        for i in range(n)
    ]


def test_spec_encoding_vectors():
    # zigzag examples straight from the Avro spec's Binary Encoding table
    assert avro._zigzag_encode(0) == b"\x00"
    assert avro._zigzag_encode(-1) == b"\x01"
    assert avro._zigzag_encode(1) == b"\x02"
    assert avro._zigzag_encode(-2) == b"\x03"
    assert avro._zigzag_encode(64) == b"\x80\x01"
    assert avro._zigzag_encode(-65) == b"\x81\x01"
    # the spec's worked string example: "foo" -> 06 66 6f 6f
    assert avro._encode_value("foo", "string") == b"\x06foo"
    # union null takes branch 0 of ["null","double"]: a single 0x00
    assert avro._encode_value(None, ["null", "double"]) == b"\x00"


@pytest.mark.parametrize(
    "codec", ["null", "deflate", "snappy", "bzip2", "xz", "zstandard"]
)
@pytest.mark.parametrize("block_records", [0, 1, 7])
def test_roundtrip(codec, block_records):
    recs = _records()
    blob = avro.encode_avro(
        recs, SCHEMA, codec=codec, block_records=block_records
    )
    out = avro.decode_avro(blob)
    assert out["codec"] == codec and out["records"] == recs
    if block_records == 1:
        assert out["n_blocks"] == len(recs)


def test_negative_count_block_form():
    # array blocks may carry a NEGATIVE count followed by a byte size
    body = (
        avro._zigzag_encode(-2)
        + avro._zigzag_encode(
            len(avro._encode_value("a", "string") * 2)
        )
        + avro._encode_value("a", "string")
        + avro._encode_value("b", "string")
        + avro._zigzag_encode(0)
    )
    got, at = avro._decode_value(body, 0, {"type": "array", "items": "string"})
    assert got == ["a", "b"] and at == len(body)


def test_empty_file_and_hostiles():
    assert avro.decode_avro(avro.encode_avro([], SCHEMA))["records"] == []
    with pytest.raises(ValueError, match="Obj"):
        avro.decode_avro(b"NOTAVRO")
    good = avro.encode_avro(_records(4), SCHEMA)
    with pytest.raises(ValueError):
        avro.decode_avro(good[:-10])  # truncated sync/block
    # corrupt a sync marker
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        avro.decode_avro(bytes(bad))
    with pytest.raises(NotImplementedError, match="snappy|codec"):
        snap = good.replace(b"deflate", b"snappyy") if b"deflate" in good \
            else bytearray(good)
        # force an unknown codec through the metadata map
        avro.decode_avro(bytes(good).replace(b"null", b"lzo4", 1))
