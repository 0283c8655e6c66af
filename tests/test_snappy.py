"""Raw snappy codec tests — decoder frames come from pyarrow's bundled
reference encoder, and the from-scratch encoder's frames are verified
by BOTH pyarrow's reference decoder and this module's own (no pyarrow
in that loop)."""

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
    # encoder side: own frames read back by ourselves (pyarrow-free
    # loop) AND by the reference decoder
    enc = snappy.compress(data)
    assert snappy.decompress(enc) == data
    if data:
        assert _codec().decompress(enc, len(data)).to_pybytes() == data


def test_encoder_edge_shapes():
    # exact literal-tag boundaries (60/61), copy-length chunking (>68),
    # and the copy-1 short form (offset < 2048, length 4..11)
    for data in (b"", b"a", b"x" * 60, b"x" * 61, b"ab" * 40,
                 b"abcd" + b"q" * 300 + b"abcd", bytes(range(256)) * 1024):
        enc = snappy.compress(data)
        assert snappy.decompress(enc) == data
        if data:
            assert _codec().decompress(enc, len(data)).to_pybytes() == data
    # long runs exercise the 64/60-chunk emission path
    run = b"z" * 200_000
    assert snappy.decompress(snappy.compress(run)) == run


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
