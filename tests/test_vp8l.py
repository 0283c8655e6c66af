"""WebP VP8L lossless codec (operators/vp8l.py — VERDICT r13 task #1):
per-transform property tests, wire-form pins, hostile inputs."""

from __future__ import annotations

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators.vp8l import (
    BitReader,
    BitWriter,
    PrefixDecoder,
    _lz77_read_value,
    _lz77_split_value,
    _predict,
    build_lengths,
    canonical_codes,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
    read_prefix_code,
    wrap_webp_lossless,
    write_prefix_code,
)


def _rt(px, **kw):
    got, meta = decode_vp8l(encode_vp8l(px, **kw))
    want = (
        px
        if px.shape[2] == 4
        else np.dstack([px, np.full(px.shape[:2], 255, np.uint8)])
    )
    assert (got == want).all()
    return meta


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 12), w=st.integers(1, 12),
        ch=st.sampled_from([3, 4]),
        tf=st.sampled_from(
            [(), ("subtract-green",), ("predictor",), ("color",),
             ("subtract-green", "predictor"),
             ("subtract-green", "predictor", "color")]
        ),
        cache=st.sampled_from([0, 3, 8]),
        mode=st.integers(0, 13),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, ch, tf, cache, mode, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        _rt(px, transforms=tf, predictor_mode=mode, cache_bits=cache)

    check()


def test_every_predictor_mode():
    """Each of the 14 modes roundtrips on pixels chosen to make a wrong
    neighbor/clamp visible (gradients + noise), at a block size small
    enough that border rules fire on interior blocks too."""
    rng = np.random.default_rng(2)
    x = np.arange(13)[None, :, None]
    y = np.arange(9)[:, None, None]
    px = ((x * 31 + y * 17 + rng.integers(0, 64, (9, 13, 4))) % 256).astype(
        np.uint8
    )
    for mode in range(14):
        _rt(px, transforms=("predictor",), predictor_mode=mode,
            predictor_bits=2)


def test_predictor_border_rules():
    """(0,0) uses mode 0 (opaque black), the top row L, the left column
    T, and the TR of a rightmost-column pixel is the LEFTMOST pixel of
    the SAME row — mode 3 (TR) on a 2-column image hits that rule on
    every row."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (6, 2, 4), dtype=np.uint8)
    _rt(px, transforms=("predictor",), predictor_mode=3, predictor_bits=2)
    # 1-pixel-wide: every pixel is both left AND right border
    _rt(rng.integers(0, 256, (5, 1, 3), dtype=np.uint8),
        transforms=("predictor",), predictor_mode=13)


def test_palette_bundling_all_widths():
    rng = np.random.default_rng(4)
    for nc, xbits in ((2, 3), (4, 2), (16, 1), (100, 0)):
        pal = rng.integers(0, 256, (nc, 4), dtype=np.uint8)
        px = pal[rng.integers(0, nc, (7, 13))]
        meta = _rt(px, transforms=("palette",))
        assert meta["transforms"] == ["palette"]


def test_lz77_and_cache_paths():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    runny = np.repeat(base, 5, axis=1)  # distance-1 runs everywhere
    for cache in (0, 6):
        _rt(runny, cache_bits=cache)
    # alternating A B A B rows: cache hits without runs
    a, b = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    px = np.stack([a, b] * 8).reshape(16, 1, 3)
    _rt(px, cache_bits=4, use_lz77=False)


def test_meta_prefix_groups():
    rng = np.random.default_rng(6)
    # left half dark, right half bright: the two groups carry genuinely
    # different statistics and the entropy image routes between them
    px = np.concatenate(
        [
            rng.integers(0, 40, (8, 6, 3), dtype=np.uint8),
            rng.integers(200, 256, (8, 7, 3), dtype=np.uint8),
        ],
        axis=1,
    )
    _rt(px, meta_split=True)
    _rt(px, transforms=("subtract-green",), meta_split=True)


def test_lz77_prefix_scheme_pinned():
    """Length/distance prefix coding: split -> read roundtrip across the
    full range, plus the spec's fixed small values."""
    for v in list(range(1, 300)) + [4096, 1 << 20]:
        code, eb, ev = _lz77_split_value(v)
        bw = BitWriter()
        if eb:
            bw.write(ev, eb)
        assert _lz77_read_value(code, BitReader(bw.getvalue())) == v
    assert _lz77_split_value(1) == (0, 0, 0)
    assert _lz77_split_value(4) == (3, 0, 0)
    assert _lz77_split_value(5) == (4, 1, 0)


def test_code_length_repeat_16_handassembled():
    """Repeat code 16 (copy the PREVIOUS nonzero length) — the encoder
    prefers 17/18 zero runs, so pin 16 with a hand-packed normal
    header: lengths [3] * 8 over an 8-symbol alphabet arrive as one
    literal 3 + repeat16(x7)."""
    bw = BitWriter()
    bw.write(0, 1)  # normal form
    # cl code uses only symbols {3, 16}, both at depth 1 (complete);
    # ORDER = 17,18,0,1,2,3,4,5,16 -> 9 transmitted slots
    bw.write(9 - 4, 4)
    for sym_len in (0, 0, 0, 0, 0, 1, 0, 0, 1):
        bw.write(sym_len, 3)
    bw.write(0, 1)  # no token-count cut
    cl_lengths = [0] * 19
    cl_lengths[3] = cl_lengths[16] = 1
    cl_codes = canonical_codes(cl_lengths)

    def put(sym):
        code, ln = cl_codes[sym]
        for k in range(ln - 1, -1, -1):
            bw.write((code >> k) & 1, 1)

    put(3)          # lengths[0] = 3
    put(16)
    bw.write(1, 2)  # repeat previous (3) x (3 + 1) -> lengths[1..4]
    put(16)
    bw.write(0, 2)  # x3 more -> lengths[5..7]; 8 symbols at depth 3
    stream = bw.getvalue()
    dec = read_prefix_code(BitReader(stream), 8)
    ref = canonical_codes([3] * 8)
    for want in range(8):
        w2 = BitWriter()
        code, ln = ref[want]
        for k in range(ln - 1, -1, -1):
            w2.write((code >> k) & 1, 1)
        assert dec.read(BitReader(w2.getvalue())) == want


def test_hostile_inputs():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    good = encode_vp8l(px)
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x00" + good[1:])
    with pytest.raises(ValueError, match="version"):
        # set the 3 version bits (bits 29..31 of the header word)
        raw = bytearray(good)
        raw[4] |= 0x80
        decode_vp8l(bytes(raw))
    with pytest.raises(ValueError, match="exhausted"):
        decode_vp8l(good[: len(good) // 2])
    # incomplete prefix code: depth-2 code with 3 symbols
    with pytest.raises(ValueError, match="incomplete|oversubscribed"):
        canonical_codes([2, 2, 2])
    # oversubscribed
    with pytest.raises(ValueError, match="incomplete|oversubscribed"):
        canonical_codes([1, 1, 1])
    with pytest.raises(NotImplementedError, match="palette combines"):
        encode_vp8l(px, transforms=("palette", "predictor"))
    # r15: lossy VP8 key frames now DECODE (operators/vp8.py); the
    # header-accurate stub's zeroed payload is a legal all-default
    # bitstream, so it yields a 4x4 frame instead of a gate
    from pyiceberg_lakehouse_spark.operators.multimodal import make_webp

    rgba, meta = decode_webp(make_webp(4, 4, "VP8 "))
    assert meta["codec"] == "vp8" and rgba.shape == (4, 4, 4)


def test_clamp_half_truncates_toward_zero():
    """Predictor 13's (a - b) / 2 is C truncation, not Python floor —
    a floor version diverges on negative halves."""
    L, T, TL = (0, 10, 10, 10), (0, 20, 20, 20), (0, 255, 255, 255)
    got = _predict(13, L, T, TL, (0, 0, 0, 0))
    # ave = 15; 15 + trunc((15 - 255)/2) = 15 + (-120) = -105 -> clamp 0
    assert got == (0, 0, 0, 0)
    L2, TL2 = (0, 10, 10, 10), (0, 13, 13, 13)
    got2 = _predict(13, L2, (0, 20, 20, 20), TL2, (0, 0, 0, 0))
    # ave = 15; (15-13)/2 = 1 -> 16
    assert got2 == (0, 16, 16, 16)


def test_container_and_probe_agree():
    from pyiceberg_lakehouse_spark.operators.multimodal import (
        decode_stub,
        probe_webp,
    )

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    payload = wrap_webp_lossless(
        encode_vp8l(px, transforms=("subtract-green",))
    )
    info = probe_webp(payload)
    assert (info["width"], info["height"], info["variant"]) == (9, 6, "VP8L")
    assert not info["has_alpha"]
    raw = decode_stub(payload, "image/webp")
    assert np.frombuffer(raw, np.uint8).reshape(6, 9, 3).tolist() == px.tolist()
    # alpha hint bit follows the pixels
    px4 = rng.integers(0, 255, (3, 3, 4), dtype=np.uint8)
    assert probe_webp(wrap_webp_lossless(encode_vp8l(px4)))["has_alpha"]
