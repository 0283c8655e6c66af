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


# ----------------------------------------------------------- animation ---


from pyiceberg_lakehouse_spark.operators.gif import (  # noqa: E402
    compose_frames,
    encode_gif_animation,
)


def _reference_compose(decoded):
    """Independent per-pixel simulation of the GIF89a model (pure Python
    loops, no numpy slicing) to cross-check compose_frames."""
    sw, sh = decoded["width"], decoded["height"]
    canvas = [[-1] * sw for _ in range(sh)]
    out = []
    for f in decoded["frames"]:
        saved = [row[:] for row in canvas] if f["disposal"] == 3 else None
        for i in range(f["height"]):
            for j in range(f["width"]):
                v = int(f["indices"][i][j])
                if f["transparent_index"] is not None and v == f[
                    "transparent_index"
                ]:
                    continue
                canvas[f["top"] + i][f["left"] + j] = v
        out.append([row[:] for row in canvas])
        if f["disposal"] == 2:
            for i in range(f["height"]):
                for j in range(f["width"]):
                    canvas[f["top"] + i][f["left"] + j] = -1
        elif f["disposal"] == 3:
            canvas = saved
    return out


def test_gce_and_netscape_loop_parse():
    px = np.arange(6).reshape(2, 3) % 4
    enc = encode_gif_animation(
        [
            {
                "indices": px,
                "disposal": 2,
                "delay_cs": 123,
                "transparent_index": 3,
            }
        ],
        loop_count=7,
    )
    d = decode_gif(enc)
    assert d["loop_count"] == 7
    f = d["frames"][0]
    assert f["disposal"] == 2
    assert f["delay_cs"] == 123
    assert f["transparent_index"] == 3
    # no GCE -> defaults, no loop extension -> None
    d2 = decode_gif(encode_gif(px))
    assert d2["loop_count"] is None
    assert d2["frames"][0]["disposal"] == 0
    assert d2["frames"][0]["transparent_index"] is None


def test_compose_disposal_semantics_hand_pinned():
    """4x4 canvas: base of 1s; frame2 paints 2 at (0,0) 2x2 disposal 2;
    frame3 paints 3 at (2,2) 2x2 disposal 3; frame4 paints a single 0 at
    (0,0) 1x1. Rendered canvases are checkable on paper."""
    base = np.ones((4, 4), dtype=np.int64)
    fr = [
        {"indices": base, "disposal": 1},
        {
            "indices": np.full((2, 2), 2),
            "left": 0,
            "top": 0,
            "disposal": 2,
        },
        {
            "indices": np.full((2, 2), 3),
            "left": 2,
            "top": 2,
            "disposal": 3,
        },
        {"indices": np.zeros((1, 1), dtype=np.int64), "left": 0, "top": 0},
    ]
    out = compose_frames(decode_gif(encode_gif_animation(fr)))
    c1, c2, c3, c4 = (r["canvas"] for r in out)
    assert (c1 == 1).all()
    assert (c2[:2, :2] == 2).all() and (c2[2:, :] == 1).all()
    # frame 2's rect vacated to transparent; frame 3 painted
    assert (c3[:2, :2] == -1).all() and (c3[2:, 2:] == 3).all()
    assert (c3[2:, :2] == 1).all() and (c3[:2, 2:] == 1).all()
    # frame 3's disposal=previous restored its rect to base
    assert (c4[2:, 2:] == 1).all()
    assert c4[0, 0] == 0
    assert (c4[:2, 1:2] == -1).all()  # rest of the vacated rect stays


def test_compose_transparency_punches_through():
    base = np.full((3, 3), 5, dtype=np.int64)
    patch = np.array([[7, 6], [6, 7]])
    fr = [
        {"indices": base},
        {
            "indices": patch,
            "left": 1,
            "top": 1,
            "transparent_index": 6,
        },
    ]
    out = compose_frames(decode_gif(encode_gif_animation(fr)))
    c = out[1]["canvas"]
    assert c[1, 1] == 7 and c[2, 2] == 7
    assert c[1, 2] == 5 and c[2, 1] == 5  # transparent -> base shows


def test_compose_matches_reference_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frame = st.fixed_dictionaries(
        {
            "w": st.integers(1, 5),
            "h": st.integers(1, 5),
            "left": st.integers(0, 5),
            "top": st.integers(0, 5),
            "disposal": st.integers(0, 3),
            "transparent": st.booleans(),
            "seed": st.integers(0, 2**31 - 1),
        }
    )

    @settings(max_examples=40, deadline=None)
    @given(frames=st.lists(frame, min_size=1, max_size=6))
    def check(frames):
        fr = []
        for f in frames:
            rng = np.random.default_rng(f["seed"])
            fr.append(
                {
                    "indices": rng.integers(
                        0, 8, size=(f["h"], f["w"]), dtype=np.int64
                    ),
                    "left": f["left"],
                    "top": f["top"],
                    "disposal": f["disposal"],
                    "transparent_index": 7 if f["transparent"] else None,
                }
            )
        dec = decode_gif(encode_gif_animation(fr, screen=(10, 10)))
        got = compose_frames(dec)
        want = _reference_compose(dec)
        for g, wv in zip(got, want):
            assert (g["canvas"] == np.array(wv)).all()

    check()


def test_compose_hostile_inputs():
    px = np.arange(6).reshape(2, 3) % 4
    # frame past the logical screen
    with pytest.raises(ValueError, match="past the logical screen"):
        encode_gif_animation([{"indices": px, "left": 9}], screen=(4, 4))
    # spliced oversized frame rejected at compose time too
    enc = bytearray(encode_gif_animation([{"indices": px}]))
    enc[6:8] = struct.pack("<H", 2)  # shrink declared screen under frame
    with pytest.raises(ValueError, match="past the logical screen"):
        compose_frames(decode_gif(bytes(enc)))
    # local color table -> honest composition gate
    g = bytearray(encode_gif(px))
    lct = np.zeros((4, 3), dtype=np.uint8)
    i = g.index(0x2C, 13)
    g[i + 9] |= 0x80 | 0x01
    spliced = bytes(g[: i + 10]) + lct.tobytes() + bytes(g[i + 10 :])
    with pytest.raises(NotImplementedError, match="local color table"):
        compose_frames(decode_gif(spliced))
    # malformed GCE length
    hdr = encode_gif(px)
    j = hdr.index(0x2C, 13)
    bad = hdr[:j] + b"\x21\xf9\x03\x00\x00\x00\x00" + hdr[j:]
    with pytest.raises(ValueError, match="GCE"):
        decode_gif(bad)
    # bad loop count at encode
    with pytest.raises(ValueError, match="loop count"):
        encode_gif_animation([{"indices": px}], loop_count=1 << 16)
