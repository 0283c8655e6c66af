"""GIF codec (operators/gif.py): variable-width LZW, container walk,
interlacing, palettes, extensions, hostile inputs.

Self-validation strategy (no Pillow/giflib in this container): the LZW
layer is pinned with hand-assembled streams whose codes are derivable on
paper, the width-bump off-by-one is exercised by corpora large enough to
cross 9->10->11->12 bits and the 4095-entry CLEAR, and the container
walk is checked against hand-spliced foreign shapes (extensions between
frames, local color tables, animation)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators.gif import (
    _interlace_order,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def test_lzw_hand_assembled_stream():
    """Paper-checkable: min code size 2 -> clear=4, end=5, width starts 3.
    Input 0,0,0,1 emits CLEAR, 0 (dict 0,0->6), 6? no — 0,0 is new at the
    second 0, so emit 0, add (0,0)=6; third 0 extends (0,0) -> (0,0,0)
    new, emit 6, add=7; then 1: emit 1? prefix was (0) after emit 6 ...
    verify against the decoder instead of hand-tracking, plus a pinned
    byte string so the packing itself (LSB-first) is regression-locked."""
    seq = np.array([0, 0, 0, 1])
    enc = lzw_encode(seq, 2)
    assert list(lzw_decode(enc, 2, 4)) == [0, 0, 0, 1]
    # LSB-first packing: codes 4(clear),0,6,1,5(end) at width 3:
    # bits 100 000 110 001 101 -> bytes LSB-first
    acc = 0
    nbits = 0
    out = bytearray()
    for c in (4, 0, 6, 1, 5):
        acc |= c << nbits
        nbits += 3
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    assert enc == bytes(out)


def test_lzw_kwkwk_case():
    """aaaa...: the decoder hits code == next_code (string defined by the
    very code being read)."""
    seq = np.zeros(40, dtype=np.int64)
    assert list(lzw_decode(lzw_encode(seq, 2), 2, 40)) == [0] * 40


def test_lzw_width_growth_and_table_reset():
    """Random 256-color corpora large enough to march the width through
    9/10/11/12 bits and force CLEAR-and-rebuild at 4095 entries."""
    rng = np.random.default_rng(61)
    for n in (600, 5000, 60000):
        seq = rng.integers(0, 256, size=n, dtype=np.int64)
        assert (lzw_decode(lzw_encode(seq, 8), 8, n) == seq).all()


def test_lzw_rejects_hostile_streams():
    with pytest.raises(ValueError, match="code size"):
        lzw_encode(np.array([0]), 1)
    with pytest.raises(ValueError, match="exceeds"):
        lzw_encode(np.array([4]), 2)
    enc = lzw_encode(np.array([0, 1, 2, 3]), 2)
    with pytest.raises(ValueError):
        lzw_decode(enc, 2, 3)  # declared extent too small
    with pytest.raises(ValueError):
        lzw_decode(enc, 2, 5)  # declared extent too large
    with pytest.raises(ValueError, match="truncated"):
        lzw_decode(enc[:1], 2, 4)


def test_gif_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=20),
        w=st.integers(min_value=1, max_value=20),
        nc=st.sampled_from([4, 8, 16, 64, 256]),
        interlace=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(h, w, nc, interlace, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, nc, size=(h, w), dtype=np.int64)
        f = decode_gif(encode_gif(px, interlace=interlace))["frames"][0]
        assert (f["indices"] == px).all()
        assert f["interlace"] == interlace
        assert f["width"] == w and f["height"] == h

    check()


def test_gif_interlace_order_is_appendix_e():
    """Rows land in pass order 0/8/16..., 4/12..., 2/6/10..., 1/3/5..."""
    assert list(_interlace_order(10)) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert list(_interlace_order(1)) == [0]
    # a permutation for any height
    for h in (2, 3, 5, 17, 64):
        assert sorted(_interlace_order(h)) == list(range(h))


def test_gif_extensions_skipped_and_animation_raw_frames():
    """GCE/comment extensions between frames are skipped; both frames of
    an animated stream decode raw with their geometry."""
    px1 = np.arange(12).reshape(3, 4) % 4
    px2 = (np.arange(12).reshape(3, 4) + 1) % 4
    g1, g2 = encode_gif(px1), encode_gif(px2)
    hdr = g1[: 13 + 4 * 3]
    f1, f2 = g1[13 + 4 * 3 : -1], g2[13 + 4 * 3 : -1]
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    com = b"\x21\xfe\x05hello\x00"
    d = decode_gif(hdr + gce + f1 + com + f2 + b"\x3b")
    assert len(d["frames"]) == 2
    assert (d["frames"][0]["indices"] == px1).all()
    assert (d["frames"][1]["indices"] == px2).all()


def test_gif_local_color_table_overrides_global():
    px = np.arange(12).reshape(3, 4) % 4
    raw = bytearray(encode_gif(px))
    lct = np.full((4, 3), 7, dtype=np.uint8)
    i = raw.index(0x2C, 13)
    raw[i + 9] |= 0x80 | 0x01  # LCT flag, size bits -> 4 entries
    spliced = bytes(raw[: i + 10]) + lct.tobytes() + bytes(raw[i + 10 :])
    f = decode_gif(spliced)["frames"][0]
    assert (f["palette"] == lct).all()
    assert (f["indices"] == px).all()


def test_gif_hostile_inputs_rejected():
    px = np.arange(6).reshape(2, 3) % 4
    g = encode_gif(px)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + bytes(20))
    with pytest.raises(ValueError):
        decode_gif(g[:-5])  # lost trailer/sub-blocks
    with pytest.raises(ValueError, match="unknown GIF block"):
        decode_gif(g[: 13 + 12] + b"\x99" + g[13 + 12 :])
    with pytest.raises(ValueError, match="power of two"):
        encode_gif(px, palette=np.zeros((5, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="exceeds the palette"):
        encode_gif(px, palette=np.zeros((2, 3), dtype=np.uint8))
    # zero-extent frame
    raw = bytearray(g)
    i = raw.index(0x2C, 13)
    raw[i + 5 : i + 7] = struct.pack("<H", 0)
    with pytest.raises(ValueError, match="zero-extent"):
        decode_gif(bytes(raw))


def test_gif_mime_route_decodes_to_rgb():
    """image/gif routes through the shared decode_stub: palette lookup to
    RGB bytes."""
    from pyiceberg_lakehouse_spark.operators.multimodal import (
        decode_image_codec,
        decode_stub,
    )

    px = np.arange(20).reshape(4, 5) % 4
    pal = np.stack(
        [np.arange(4) * 10, np.arange(4) * 20, np.arange(4) * 30], axis=1
    ).astype(np.uint8)
    g = encode_gif(px, palette=pal)
    rgb = np.frombuffer(decode_stub(g, "image/gif"), dtype=np.uint8)
    assert (rgb.reshape(4, 5, 3) == pal[px]).all()
    assert decode_image_codec(g) == (5, 4, "P")
