"""RFC 8878 zstd decoder tests.

External validation: every frame is produced by the SYSTEM zstd encoder
(pyarrow's bundled libzstd) — the decoder never sees its own output, so
FSE table builds, Huffman weight decoding (both direct and
FSE-compressed forms), 1- and 4-stream literals, predefined vs encoded
sequence tables and repeat-offset handling are all checked against the
reference implementation's real bitstreams. xxh64 is cross-checked
against Spark's JVM xxhash64 elsewhere (seed-42 vectors in
test_zstd_xxh64_vectors are from that run)."""

from __future__ import annotations

import random
import struct

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyiceberg_lakehouse_spark.operators import zstd
from pyiceberg_lakehouse_spark.operators.archives import decompress_auto


def _codec(level: int = 1) -> pa.Codec:
    return pa.Codec("zstd", compression_level=level)


SHAPES = {
    "zeros": lambda rng, n: bytes(n),
    "rand": lambda rng, n: bytes(rng.randrange(256) for _ in range(n)),
    "text": lambda rng, n: (
        b"the quick brown fox jumps over the lazy dog. " * (n // 45 + 1)
    )[:n],
    "rep16": lambda rng, n: (
        bytes(rng.randrange(256) for _ in range(16)) * (n // 16 + 1)
    )[:n],
    "lowcard": lambda rng, n: bytes(rng.randrange(4) * 17 for _ in range(n)),
}


@pytest.mark.parametrize("shape", sorted(SHAPES))
@pytest.mark.parametrize("n", [0, 1, 7, 64, 300, 5000, 70000])
@pytest.mark.parametrize("level", [1, 3, 19])
def test_roundtrip_vs_libzstd(shape, n, level):
    rng = random.Random(hash((shape, n, level)) & 0xFFFF)
    data = SHAPES[shape](rng, n)
    comp = _codec(level).compress(data, asbytes=True)
    assert zstd.decompress(comp) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=20000), st.sampled_from([1, 5, 12]))
def test_roundtrip_arbitrary(data, level):
    comp = _codec(level).compress(data, asbytes=True)
    assert zstd.decompress(comp) == data


def test_multi_frame_and_skippable():
    a = b"frame one " * 50
    b = b"frame TWO " * 70
    blob = (
        _codec(1).compress(a, asbytes=True)
        + struct.pack("<II", 0x184D2A50, 4)
        + b"skip"
        + _codec(19).compress(b, asbytes=True)
    )
    assert zstd.decompress(blob) == a + b


def test_decompress_auto_routes_zstd():
    payload = b"tar-ish payload " * 30
    frame = _codec(3).compress(payload, asbytes=True)
    assert decompress_auto(frame) == (payload, "zstd")


def test_bad_magic_and_truncation_raise():
    with pytest.raises(ValueError):
        zstd.decompress(b"\x00\x01\x02\x03rest")
    good = _codec(1).compress(b"hello world " * 20, asbytes=True)
    with pytest.raises(ValueError):
        zstd.decompress(good[: len(good) // 2])
    with pytest.raises(ValueError):
        zstd.decompress(b"\x28\xb5\x2f\xfdjunk")


def test_content_size_enforced():
    # corrupt the single-segment frame content size byte
    data = b"abcdefgh" * 4
    comp = bytearray(_codec(1).compress(data, asbytes=True))
    fhd = comp[4]
    if (fhd >> 5) & 1 and (fhd >> 6) == 0:  # single-segment, 1-byte FCS
        comp[5] = (comp[5] + 1) & 0xFF
        with pytest.raises(ValueError, match="content size"):
            zstd.decompress(bytes(comp))


def test_xxh64_vectors():
    # seed-42 values verified against Spark's JVM xxhash64 this session
    assert zstd.xxh64(b"", seed=42) == 0x98B1582B0977E704
    assert zstd.xxh64(b"a", seed=42) == 0x88E4FE59ADF7B0CC
    assert zstd.xxh64(b"abc", seed=42) == 0x13C1D910702770E6
    assert zstd.xxh64(b"0123456789abcdef", seed=42) == 0x021F8722D90141B7
    assert zstd.xxh64(b"abc") == 0x44BC2CF5AD770999  # seed-0 reference


def test_checksum_frame_validates():
    # hand-build a raw-block frame with the content-checksum flag set
    payload = b"checksum me " * 10
    fhd = (1 << 2) | (1 << 5)  # checksum + single-segment, 1-byte FCS
    frame = bytearray(struct.pack("<I", zstd.ZSTD_MAGIC))
    frame.append(fhd)
    frame.append(len(payload))
    frame += bytes(
        [(1 | (0 << 1) | (len(payload) << 3)) & 0xFF,
         (len(payload) >> 5) & 0xFF, (len(payload) >> 13) & 0xFF]
    )
    frame += payload
    frame += struct.pack("<I", zstd.xxh64(payload) & 0xFFFFFFFF)
    assert zstd.decompress(bytes(frame)) == payload
    bad = bytearray(frame)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        zstd.decompress(bytes(bad))


class TestEncoder:
    """The from-scratch compressor (predefined-FSE sequences + raw
    literals): every frame must decode through BOTH this module's
    decoder and libzstd."""

    CASES = [
        b"", b"a", b"abcd" * 200, b"the quick brown fox " * 3000,
        bytes(range(256)) * 600, b"x" * 200_000,
    ]

    def test_roundtrip_own_and_reference(self):
        import pyarrow as pa

        import random

        rng = random.Random(11)
        cases = self.CASES + [
            bytes(rng.randrange(256) for _ in range(50_000)),
            bytes(rng.choice(b"abcdef") for _ in range(120_000)),
        ]
        for data in cases:
            enc = zstd.compress(data)
            assert zstd.decompress(enc) == data
            if data:
                got = pa.Codec("zstd").decompress(
                    enc, len(data)
                ).to_pybytes()
                assert got == data

    def test_multi_block_frames(self):
        data = (b"repeat me " * 5000) + bytes(range(256)) * 100
        enc = zstd.compress(data, block_size=1 << 12)
        assert zstd.decompress(enc) == data

    def test_compresses_redundancy(self):
        run = b"z" * 100_000
        assert len(zstd.compress(run)) < 200

    def test_fse_threading_tiles_every_symbol(self):
        # the backward threading relies on each symbol's state ranges
        # tiling [0, size): verify on all three predefined tables
        for dist, alog in (
            (zstd._LL_DEFAULT_DIST, zstd._LL_DEFAULT_ALOG),
            (zstd._OF_DEFAULT_DIST, zstd._OF_DEFAULT_ALOG),
            (zstd._ML_DEFAULT_DIST, zstd._ML_DEFAULT_ALOG),
        ):
            table = zstd._fse_build_table(list(dist), alog)
            by_sym = {}
            for state, (sym, nb, baseline) in enumerate(table):
                by_sym.setdefault(sym, []).append((nb, baseline))
            size = 1 << alog
            for sym, states in by_sym.items():
                covered = sorted(
                    (baseline, baseline + (1 << nb))
                    for nb, baseline in states
                )
                assert covered[0][0] == 0
                for (a, b), (c, d) in zip(covered, covered[1:]):
                    assert b == c, (sym, covered)
                assert covered[-1][1] == size
