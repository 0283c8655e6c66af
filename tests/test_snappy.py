"""Raw snappy decoder tests — every frame comes from pyarrow's bundled
reference encoder (the zstd-decoder validation posture)."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from pyiceberg_lakehouse_spark.operators import snappy


def _codec():
    return pa.Codec("snappy")


@pytest.mark.parametrize("kind", ["rand", "text", "zeros", "lowcard", "rep"])
@pytest.mark.parametrize("n", [0, 1, 60, 61, 4096, 120000])
def test_roundtrip_vs_reference(kind, n):
    rng = random.Random(hash((kind, n)) & 0xFFFF)
    data = {
        "rand": lambda: bytes(rng.randrange(256) for _ in range(min(n, 30000))),
        "text": lambda: (b"snappy snappy " * (n // 14 + 1))[:n],
        "zeros": lambda: bytes(n),
        "lowcard": lambda: bytes((rng.randrange(3) * 91) & 0xFF for _ in range(n)),
        "rep": lambda: (bytes(rng.randrange(256) for _ in range(64)) * (n // 64 + 1))[:n],
    }[kind]()
    assert snappy.decompress(_codec().compress(data, asbytes=True)) == data


def test_hostiles():
    good = _codec().compress(b"x" * 1000, asbytes=True)
    with pytest.raises(ValueError):
        snappy.decompress(good[:-3])
    with pytest.raises(ValueError):
        snappy.decompress(b"\x05\x01\xff\xff\xff\xff\x00")  # bad offset
    with pytest.raises(NotImplementedError, match="FRAMING"):
        snappy.decompress(b"\xff\x06\x00\x00sNaPpY rest")


def test_avro_snappy_codec():
    from pyiceberg_lakehouse_spark.operators import avro

    schema = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "long"}, {"name": "s", "type": "string"}]}
    recs = [{"id": i, "s": f"row {i} " * 4} for i in range(200)]
    blob = avro.encode_avro(recs, schema, codec="snappy", block_records=37)
    out = avro.decode_avro(blob)
    assert out["codec"] == "snappy" and out["records"] == recs
    bad = bytearray(blob)
    bad[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|sync|snappy"):
        avro.decode_avro(bytes(bad))
