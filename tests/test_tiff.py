"""Baseline TIFF codec (operators/tiff.py): byte orders, IFD
inline-vs-offset values, strips, PackBits, photometric 0 inversion,
honest gates, hostile inputs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 20), w=st.integers(1, 20),
        ch=st.sampled_from([1, 3]), be=st.booleans(),
        comp=st.sampled_from([1, 32773]), rps=st.integers(1, 8),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, ch, be, comp, rps, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        got, meta = decode_tiff(
            encode_tiff(px, big_endian=be, compression=comp,
                        rows_per_strip=rps)
        )
        assert (got == px).all()
        assert meta["n_strips"] == (h + rps - 1) // rps
        assert meta["big_endian"] == be

    check()


def test_packbits_edges():
    # -128 is a noop; runs cap at 128; literals cap at 128
    assert packbits_decode(b"\x80" + packbits_encode(b"abc"), 3) == b"abc"
    run200 = b"\x07" * 200
    assert packbits_decode(packbits_encode(run200), 200) == run200
    lit = bytes(range(150))
    assert packbits_decode(packbits_encode(lit), 150) == lit
    with pytest.raises(ValueError, match="overruns"):
        packbits_decode(b"\x05ab", 6)
    with pytest.raises(ValueError, match="without a byte"):
        packbits_decode(b"\xfe", 3)
    with pytest.raises(ValueError, match="decodes past"):
        packbits_decode(b"\xfdx", 2)  # run of 4 into expected 2
    with pytest.raises(ValueError, match="decoded"):
        packbits_decode(b"\x00x", 2)


def test_photometric_zero_inverts():
    px = np.full((2, 2, 1), 10, dtype=np.uint8)
    raw = bytearray(encode_tiff(px))
    # find the photometric tag (262) and flip value 1 -> 0
    e = "<"
    (ifd_off,) = struct.unpack_from(f"{e}I", raw, 4)
    (n,) = struct.unpack_from(f"{e}H", raw, ifd_off)
    for k in range(n):
        at = ifd_off + 2 + 12 * k
        tid, = struct.unpack_from(f"{e}H", raw, at)
        if tid == 262:
            struct.pack_into(f"{e}H", raw, at + 8, 0)
    got, _ = decode_tiff(bytes(raw))
    assert (got == 245).all()


def test_honest_gates():
    px = np.zeros((2, 2, 1), dtype=np.uint8)
    raw = bytearray(encode_tiff(px))
    e = "<"
    (ifd_off,) = struct.unpack_from(f"{e}I", raw, 4)
    (n,) = struct.unpack_from(f"{e}H", raw, ifd_off)

    def set_tag(tid_want, value):
        for k in range(n):
            at = ifd_off + 2 + 12 * k
            (tid,) = struct.unpack_from(f"{e}H", raw, at)
            if tid == tid_want:
                struct.pack_into(f"{e}H", raw, at + 8, value)

    set_tag(259, 5)  # LZW
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_tiff(bytes(raw))
    set_tag(259, 1)
    set_tag(284, 2)
    with pytest.raises(NotImplementedError, match="planar"):
        decode_tiff(bytes(raw))
    set_tag(284, 1)
    set_tag(258, 4)
    with pytest.raises(NotImplementedError, match="BitsPerSample"):
        decode_tiff(bytes(raw))
    with pytest.raises(ValueError, match="compression must be"):
        encode_tiff(px, compression=5)


def test_hostile_inputs():
    px = np.arange(4, dtype=np.uint8).reshape(2, 2, 1)
    enc = encode_tiff(px)
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + enc[2:])
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(enc[:2] + b"\x00\x00" + enc[4:])
    raw = bytearray(enc)
    struct.pack_into("<I", raw, 4, len(enc) + 50)
    with pytest.raises(ValueError, match="IFD offset"):
        decode_tiff(bytes(raw))
    # strip offset past EOF
    raw = bytearray(enc)
    (ifd_off,) = struct.unpack_from("<I", raw, 4)
    (n,) = struct.unpack_from("<H", raw, ifd_off)
    for k in range(n):
        at = ifd_off + 2 + 12 * k
        (tid,) = struct.unpack_from("<H", raw, at)
        if tid == 273:
            struct.pack_into("<I", raw, at + 8, len(enc) + 1000)
    with pytest.raises(ValueError, match="out of file bounds"):
        decode_tiff(bytes(raw))


def test_multipage_exposes_next_ifd():
    """First page decodes; next_ifd is surfaced so callers can see the
    file continues (multi-page stays a visible, not silent, cut)."""
    px = np.arange(4, dtype=np.uint8).reshape(2, 2, 1)
    raw = bytearray(encode_tiff(px))
    (ifd_off,) = struct.unpack_from("<I", raw, 4)
    (n,) = struct.unpack_from("<H", raw, ifd_off)
    struct.pack_into("<I", raw, ifd_off + 2 + 12 * n, 12345)
    _, meta = decode_tiff(bytes(raw))
    assert meta["next_ifd"] == 12345
