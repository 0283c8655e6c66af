"""Animated WebP (VP8X/ANIM/ANMF over VP8L frames): container
roundtrips, the composition model vs a float reference, hostile
inputs, honest gates."""

from __future__ import annotations

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators.vp8l import (
    compose_webp_animation,
    decode_webp_animation,
    encode_webp_animation,
)


def _anim(frames, w, h, **kw):
    return decode_webp_animation(encode_webp_animation(frames, w, h, **kw))


def test_container_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        n=st.integers(1, 4),
        loop=st.integers(0, 9),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(n, loop, seed):
        rng = np.random.default_rng(seed)
        cw, ch = 12, 10
        frames = []
        for k in range(n):
            w = int(rng.integers(1, 5))
            h = int(rng.integers(1, 5))
            x = int(rng.integers(0, (cw - w) // 2 + 1)) * 2
            y = int(rng.integers(0, (ch - h) // 2 + 1)) * 2
            frames.append(
                {
                    "x": x, "y": y,
                    "pixels": rng.integers(0, 256, (h, w, 4), np.uint8),
                    "duration_ms": int(rng.integers(0, 1000)),
                    "blend": ["over", "source"][int(rng.integers(0, 2))],
                    "dispose": ["none", "background"][int(rng.integers(0, 2))],
                }
            )
        dec = _anim(frames, cw, ch, loop_count=loop)
        assert dec["loop_count"] == loop
        assert len(dec["frames"]) == n
        for f, want in zip(dec["frames"], frames):
            assert (f["pixels"] == want["pixels"]).all()
            assert (f["x"], f["y"]) == (want["x"], want["y"])
            assert f["duration_ms"] == want["duration_ms"]
            assert f["blend"] == want["blend"]
            assert f["dispose"] == want["dispose"]

    check()


def test_composition_matches_float_reference():
    """The exact-integer OVER must round-match the spec's float formula
    on every pixel, and disposal must refill with the ANIM background."""
    rng = np.random.default_rng(1)
    cw, ch = 9, 7
    bg = (20, 30, 40, 255)
    frames = [
        {"x": 0, "y": 0,
         "pixels": rng.integers(0, 256, (ch, cw, 4), np.uint8),
         "duration_ms": 10, "blend": "source"},
        {"x": 2, "y": 2,
         "pixels": rng.integers(0, 256, (4, 5, 4), np.uint8),
         "duration_ms": 20, "blend": "over", "dispose": "background"},
        {"x": 4, "y": 0,
         "pixels": rng.integers(0, 256, (3, 3, 4), np.uint8),
         "duration_ms": 30, "blend": "over"},
    ]
    dec = _anim(frames, cw, ch, background=bg)
    got = compose_webp_animation(dec)

    canvas = np.tile(np.array(bg, float), (ch, cw, 1))
    for i, f in enumerate(dec["frames"]):
        x, y, w, h = f["x"], f["y"], f["width"], f["height"]
        src = f["pixels"].astype(float)
        reg = canvas[y : y + h, x : x + w]
        if f["blend"] == "source":
            reg[:] = src
        else:
            sa = src[:, :, 3:4] / 255.0
            da = reg[:, :, 3:4] / 255.0
            oa = sa + da * (1 - sa)
            rgb = np.where(
                oa > 0,
                (src[:, :, :3] * sa + reg[:, :, :3] * da * (1 - sa))
                / np.maximum(oa, 1e-12),
                0,
            )
            reg[:, :, :3] = rgb
            reg[:, :, 3] = (oa * 255)[:, :, 0]
        diff = np.abs(got[i]["canvas"].astype(float) - np.round(canvas))
        assert diff.max() <= 1, (i, diff.max())  # integer port: off-by-<=1
        if f["dispose"] == "background":
            canvas[y : y + h, x : x + w] = np.array(bg, float)
    # exact checks where no fractional alpha is involved
    assert (got[0]["canvas"] == dec["frames"][0]["pixels"]).all()


def test_opaque_and_transparent_over_are_exact():
    """sa in {0, 255} must be EXACT (replace / keep) — the branch the
    driver row's closed-form oracle relies on."""
    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, (6, 8, 4), np.uint8)
    base[:, :, 3] = 255
    patch = rng.integers(0, 256, (3, 4, 4), np.uint8)
    patch[:, :, 3] = np.where(
        (np.arange(4)[None, :] + np.arange(3)[:, None]) % 2 == 0, 255, 0
    )
    dec = _anim(
        [
            {"x": 0, "y": 0, "pixels": base, "duration_ms": 1,
             "blend": "source"},
            {"x": 2, "y": 2, "pixels": patch, "duration_ms": 1,
             "blend": "over"},
        ],
        8, 6,
    )
    c = compose_webp_animation(dec)[1]["canvas"]
    want = base.copy()
    reg = want[2:5, 2:6]
    m = patch[:, :, 3] == 255
    reg[m] = patch[m]
    assert (c == want).all()


def test_dispose_refills_with_background():
    bg = (7, 11, 13, 255)
    px = np.full((2, 2, 4), 200, np.uint8)
    dec = _anim(
        [
            {"x": 2, "y": 2, "pixels": px, "duration_ms": 1,
             "blend": "source", "dispose": "background"},
            {"x": 0, "y": 0, "pixels": np.full((1, 1, 4), 5, np.uint8),
             "duration_ms": 1, "blend": "source"},
        ],
        6, 6, background=bg,
    )
    frames = compose_webp_animation(dec)
    assert (frames[0]["canvas"][2:4, 2:4] == 200).all()
    assert (frames[1]["canvas"][2:4, 2:4] == np.array(bg)).all()
    # untouched cells always carry the background
    assert (frames[0]["canvas"][5, 5] == np.array(bg)).all()


def test_hostile_and_gates():
    px = np.zeros((2, 2, 4), np.uint8)
    with pytest.raises(ValueError, match="must be even"):
        encode_webp_animation(
            [{"x": 1, "y": 0, "pixels": px, "duration_ms": 1}], 6, 6
        )
    with pytest.raises(ValueError, match="exceeds the canvas"):
        encode_webp_animation(
            [{"x": 4, "y": 4, "pixels": np.zeros((4, 4, 4), np.uint8),
              "duration_ms": 1}], 6, 6
        )
    good = encode_webp_animation(
        [{"x": 0, "y": 0, "pixels": px, "duration_ms": 1}], 2, 2
    )
    # VP8X without the animation flag
    raw = bytearray(good)
    at = raw.index(b"VP8X") + 8
    raw[at] &= ~0x02
    with pytest.raises(ValueError, match="animation flag"):
        decode_webp_animation(bytes(raw))
    # ANMF frame dims disagreeing with its VP8L header
    raw = bytearray(good)
    at = raw.index(b"ANMF") + 8
    raw[at + 6 : at + 9] = (5 - 1).to_bytes(3, "little")  # width lie
    with pytest.raises(ValueError, match="exceeds the canvas|disagree"):
        decode_webp_animation(bytes(raw))
    # a still (non-animated) file has no frames
    from pyiceberg_lakehouse_spark.operators.vp8l import (
        encode_vp8l,
        wrap_webp_lossless,
    )

    with pytest.raises(ValueError, match="animation flag|no animation"):
        decode_webp_animation(wrap_webp_lossless(encode_vp8l(px)))
