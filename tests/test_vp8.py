"""Lossy WebP (VP8) key-frame codec tests.

Three independent evidence lines:
  1. property tests of the boolean arithmetic coder (encoder<->decoder
     round trip over random bit/probability sequences);
  2. exact-transform identities (IDCT/IWHT on impulse inputs);
  3. a REAL libwebp-encoded file (CPython's test-suite python.webp,
     present in every pyenv under lib/pythonX.Y/test): the decode must
     consume both bitstream partitions to within bool-decoder lookahead
     — a single wrong entry in the transcribed RFC 6386 probability
     tables desynchronizes the arithmetic decoder and breaks this — and
     the decoded chroma must reproduce the Python logo's blue/yellow
     split, while the ALPH plane (decoded by the VP8L machinery) must
     reproduce the logo silhouette exactly.
"""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyiceberg_lakehouse_spark.operators import vp8, vp8l


def _find_real_webp() -> bytes | None:
    for pat in (
        "/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.webp",
        "/root/.pyenv/versions/*/lib/python*/test/imghdrdata/python.webp",
    ):
        hits = sorted(glob.glob(pat))
        if hits:
            with open(hits[0], "rb") as f:
                return f.read()
    return None


def _chunks(data: bytes) -> dict[bytes, bytes]:
    out = {}
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        out[fourcc] = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    return out


# ------------------------------------------------------------ bool coder --


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 254)),
        min_size=1,
        max_size=300,
    )
)
def test_bool_coder_roundtrip(seq):
    enc = vp8.BoolEncoder()
    for bit, prob in seq:
        enc.write_bool(bit, prob)
    buf = enc.getvalue()
    dec = vp8.BoolDecoder(buf)
    for bit, prob in seq:
        assert dec.read_bool(prob) == bit


def test_bool_literals_and_trees():
    enc = vp8.BoolEncoder()
    enc.write_literal(0x5A, 8)
    enc.write_signed(-13, 6)
    enc.write_tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB, vp8.TM_PRED)
    enc.write_tree(vp8.TOKEN_TREE, vp8.DEFAULT_COEFF_PROBS[1][0][0], vp8.CAT3)
    dec = vp8.BoolDecoder(enc.getvalue())
    assert dec.read_literal(8) == 0x5A
    assert dec.read_signed(6) == -13
    assert dec.read_tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB) == vp8.TM_PRED
    assert dec.read_tree(vp8.TOKEN_TREE, vp8.DEFAULT_COEFF_PROBS[1][0][0]) == vp8.CAT3


# ------------------------------------------------------------ transforms --


def test_idct_dc_only():
    # DC-only block: every output pixel is (dc + 4) >> 3
    for dc in (-512, -64, 0, 8, 100, 516):
        out = vp8.idct4x4([dc] + [0] * 15)
        assert out == [(dc + 4) >> 3] * 16


def test_iwht_dc_only():
    for dc in (-129, 0, 64, 517):
        out = vp8.iwht4x4([dc] + [0] * 15)
        assert out == [(dc + 3) >> 3] * 16


def test_dequant_factors_bounds():
    f = vp8.dequant_factors(0)
    assert f["y1"] == (4, 4) and f["y2"] == (8, 8)  # y2ac floor of 8
    f = vp8.dequant_factors(127)
    assert f["y1"] == (157, 284)
    assert f["uv"][0] == 132  # uv dc cap
    assert f["y2"] == (314, 440)


# ---------------------------------------------------------- real libwebp --


@pytest.fixture(scope="module")
def real_webp():
    data = _find_real_webp()
    if data is None:
        pytest.skip("no pyenv python.webp available")
    return _chunks(data)


def test_real_file_exact_consumption(real_webp):
    """Both partitions decode to within bool-decoder lookahead of their
    exact byte size — the empirical pin on every transcribed table."""
    out = vp8.decode_vp8_frame(real_webp[b"VP8 "])
    d = out["diag"]
    assert d["part1_size"] - d["part1_consumed"] <= 3
    assert d["part1_consumed"] <= d["part1_size"]
    for used, size in zip(d["token_consumed"], d["token_sizes"]):
        assert size - used <= 3
        assert used <= size
    assert out["width"] == 16 and out["height"] == 16


def test_real_file_logo_colors(real_webp):
    """Opaque pixels in the top half are Python-blue (b > r), bottom
    rows Python-yellow (r,g >> b) — decoded pixels, real encoder."""
    out = vp8.decode_vp8_frame(real_webp[b"VP8 "])
    rgb = vp8.yuv_to_rgb(out["y"], out["u"], out["v"]).astype(np.int32)
    alpha = vp8l.decode_alph(real_webp[b"ALPH"], 16, 16)
    top = [(rgb[y, x]) for y in range(4) for x in range(16) if alpha[y, x] > 128]
    bot = [(rgb[y, x]) for y in (10, 11) for x in range(4, 12) if alpha[y, x] > 128]
    assert top and bot
    assert all(px[2] > px[0] for px in top), "top snake must be blue"
    assert all(px[0] > 200 and px[1] > 180 and px[2] < 190 for px in bot), (
        "bottom snake must be yellow"
    )


def test_real_file_alpha_silhouette(real_webp):
    """The lossless ALPH plane is bit-exact; pin the logo silhouette."""
    alpha = vp8l.decode_alph(real_webp[b"ALPH"], 16, 16)
    mask = (alpha > 128).astype(int)
    # fully transparent corners, opaque center
    assert mask[0, 0] == 0 and mask[15, 15] == 0
    assert mask[5, 2] == 1 and mask[10, 8] == 1
    assert 120 <= int(mask.sum()) <= 200
    # reproducible exact plane
    assert int(alpha.astype(np.int64).sum()) == 38971


def test_inter_frame_gated():
    # frame tag with the keyframe bit SET (=> inter frame)
    payload = bytes([0x01, 0x00, 0x00]) + b"\x9d\x01\x2a" + bytes(10)
    with pytest.raises(NotImplementedError):
        vp8.decode_vp8_frame(payload)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        vp8.decode_vp8_frame(b"\x00\x00\x00garbage....")
    with pytest.raises(ValueError):
        vp8.decode_vp8_frame(b"")


def test_real_file_full_rgba_pin(real_webp):
    """End-to-end decode_webp (VP8 luma/chroma + ALPH alpha) of the real
    libwebp file, pinned byte-for-byte as a regression anchor."""
    import hashlib

    from pyiceberg_lakehouse_spark.operators import vp8l as _vp8l

    # reassemble the original container from its chunks
    payload = bytearray(b"RIFF\x00\x00\x00\x00WEBP")
    for fourcc in (b"VP8X", b"ALPH", b"VP8 "):
        body = real_webp[fourcc]
        payload += fourcc + len(body).to_bytes(4, "little") + body
        if len(body) % 2:
            payload += b"\x00"
    payload[4:8] = (len(payload) - 8).to_bytes(4, "little")
    rgba, meta = _vp8l.decode_webp(bytes(payload))
    assert meta["codec"] == "vp8" and meta["has_alpha"]
    assert rgba.shape == (16, 16, 4)
    assert int(rgba.astype(np.int64).sum()) == 136321
    assert (
        hashlib.sha256(rgba.tobytes()).hexdigest()
        == "6ff03dc3e61e55927fca7958a4a7f0e9ca52e07692be44298b4431ff78576f78"
    )


def test_real_file_structural_coverage(real_webp):
    """Document what the real-encoder pin exercises: a B_PRED macroblock
    (kf_bmode probability table + six distinct 4x4 sub-modes),
    coefficient-probability updates (the COEFF_UPDATE_PROBS read path),
    and a live level-12 normal loop filter."""
    dec = vp8.VP8Decoder(real_webp[b"VP8 "])
    dec.decode()
    assert dec.ymodes == [[vp8.B_PRED]]
    sub = set(dec.bmodes[0][0])
    assert {vp8.B_DC_PRED, vp8.B_VE_PRED, vp8.B_HD_PRED} <= sub
    assert len(sub) >= 5
    assert dec.header["filter_level"] == 12
    assert dec.header["filter_type"] == 0  # normal filter ran
    n_upd = sum(
        1
        for t in range(4)
        for b in range(8)
        for c in range(3)
        for n in range(11)
        if dec.coeff_probs[t][b][c][n] != vp8.DEFAULT_COEFF_PROBS[t][b][c][n]
    )
    assert n_upd == 3
