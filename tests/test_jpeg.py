"""Baseline JPEG codec (operators/jpeg.py).

No reference codec ships in this container, so the tests are built to
catch MATCHED encoder/decoder bugs, not just round-trip consistency: the
stages where a shared mistake could hide are pinned independently
(orthonormal DCT, generated-vs-constant zigzag, hand-computed BT.601
constants, Kraft-valid Huffman tables), and the round-trip error bounds
derive from the known quantization step (a flat block keeps only its DC
coefficient, whose quantizer divisor is table position 0).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators import jpeg, multimodal


def test_dct_matrix_orthonormal():
    D = jpeg._dct_matrix()
    assert np.allclose(D @ D.T, np.eye(8), atol=1e-12)
    # Parseval: energy preserved through the transform
    rng = np.random.default_rng(1)
    B = rng.normal(size=(8, 8))
    F = D @ B @ D.T
    assert np.isclose((B * B).sum(), (F * F).sum())


def test_zigzag_against_generated_spiral():
    """Regenerate the zigzag order from the diagonal-walk definition and
    compare to the constant table (a transposed or mirrored table would
    still round-trip, so this must be independent)."""
    order = []
    for s in range(15):  # anti-diagonals
        rng_ = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(s - j, j) for j in rng_]  # bottom-left -> top-right
        if s % 2 == 1:
            diag = diag[::-1]  # odd diagonals walk top-right -> bottom-left
        order.extend(r * 8 + c for r, c in diag)
    assert order == list(jpeg.ZIGZAG)


def test_ycbcr_constants_hand_computed():
    # pure red (255,0,0): Y = .299*255 = 76.245; Cr = .5*255+128 = 255.5
    ycc = jpeg.rgb_to_ycbcr(np.array([[[255, 0, 0]]], dtype=np.uint8))
    assert np.isclose(ycc[0, 0, 0], 76.245, atol=1e-9)
    assert np.isclose(ycc[0, 0, 1], -0.168736 * 255 + 128.0)
    assert np.isclose(ycc[0, 0, 2], 0.5 * 255 + 128.0)
    # gray is a fixed point: (g, g, g) -> Y=g, Cb=Cr=128
    ycc = jpeg.rgb_to_ycbcr(np.full((1, 1, 3), 77, dtype=np.uint8))
    assert np.allclose(ycc[0, 0], [77.0, 128.0, 128.0])
    # inverse really inverts (before quantization)
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    back = jpeg.ycbcr_to_rgb(jpeg.rgb_to_ycbcr(px))
    # the published 4-digit inverse constants are rounded, not the exact
    # matrix inverse of the forward transform — sub-ULP-of-a-pixel error
    assert np.abs(back - px).max() < 0.05


def test_huffman_tables_kraft_valid_and_canonical():
    for syms in (jpeg._DC_SYMBOLS, jpeg._AC_SYMBOLS):
        bits, vals = jpeg._flat_table(syms)
        assert sum(bits) == len(syms)
        codes = jpeg._codes_from_table(bits, vals)
        # Kraft inequality and prefix-freeness at a single length = all
        # codes distinct and below 2^len
        lens = {ln for _, ln in codes.values()}
        assert lens == {8}
        cs = [c for c, _ in codes.values()]
        assert len(set(cs)) == len(cs) and max(cs) < 0xFF  # no all-ones code


def test_flat_block_roundtrip_exact():
    """A uniform block has only a DC coefficient; with DC quantizer
    table[0][0] the reconstruction must be exact for any level."""
    for level in (0, 17, 128, 131, 255):
        img = np.full((8, 8), level, dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        assert out.shape == (8, 8)
        assert int(np.abs(out.astype(int) - level).max()) <= 1, level


def test_roundtrip_error_bounds_and_shapes():
    rng = np.random.default_rng(7)
    # smooth content: tight bound at high quality
    x = np.linspace(0, 255, 40)
    smooth = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(smooth, quality=95))
    assert np.abs(out.astype(int) - smooth.astype(int)).mean() < 2.0
    # random RGB with odd (non-multiple-of-8) dims survives edge padding
    img = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert out.shape == (21, 13, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 16.0
    # lower quality degrades monotonically-ish but still decodes
    out50 = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=30))
    assert out50.shape == (21, 13, 3)


def test_quality_dial_changes_tables():
    l90, c90 = jpeg.quality_tables(90)
    l10, c10 = jpeg.quality_tables(10)
    assert (l10 >= l90).all() and l10.sum() > l90.sum()
    assert l90.min() >= 1 and l10.max() <= 255


def test_header_parse_and_dispatch():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (10, 17, 3), dtype=np.uint8)
    payload = jpeg.encode_jpeg(img, quality=85)
    assert jpeg.jpeg_header(payload) == (17, 10, 3)
    assert multimodal.decode_image_codec(payload) == (17, 10, "RGB")
    raw = multimodal.decode_stub(payload, "image/jpeg")
    assert len(raw) == 10 * 17 * 3
    gray = jpeg.encode_jpeg(img[:, :, 0], quality=85)
    assert multimodal.decode_image_codec(gray) == (17, 10, "L")
    assert len(multimodal.decode_stub(gray, "image/jpeg")) == 10 * 17 * 3


def test_rejects_unsupported_honestly():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    good = bytearray(jpeg.encode_jpeg(img))
    # SOF3 now DISPATCHES to the lossless decoder; a baseline frame
    # relabeled SOF3 is malformed (its SOS Ss=0 is no lossless
    # predictor), not "unsupported"
    i = bytes(good).find(b"\xff\xc0")
    lossless = bytes(good[:i]) + b"\xff\xc3" + bytes(good[i + 2 :])
    with pytest.raises(ValueError, match="predictor"):
        jpeg.decode_jpeg(lossless)
    # SOF5 (differential sequential) stays honestly gated
    sof5 = bytes(good[:i]) + b"\xff\xc5" + bytes(good[i + 2 :])
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(sof5)
    # SOF2 now DISPATCHES to the progressive decoder; a baseline scan
    # header inside a progressive frame is malformed, not "unsupported"
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2 :])
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(prog)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        jpeg.jpeg_header(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF
    # truncated entropy stream fails loudly
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(good[: len(good) // 2]))


@pytest.mark.skipif(not multimodal.HAS_PIL, reason="Pillow not installed")
def test_cross_check_against_pillow():
    """When a reference codec IS available, our decoder must read its
    output and Pillow must read ours."""
    import io

    from PIL import Image

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    ours = jpeg.encode_jpeg(img, quality=90)
    theirs_px = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert np.abs(theirs_px.astype(int) - img.astype(int)).mean() < 16.0
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90, subsampling=0)
    ours_px = jpeg.decode_jpeg(buf.getvalue())
    assert np.abs(ours_px.astype(int) - img.astype(int)).mean() < 16.0


# ------------------------------------------------- chroma subsampling ----


def _smooth_rgb(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            128 + 70 * np.sin((y + seed) / 9.0) * np.cos(x / 7.0),
            128 + 55 * np.cos((x + seed) / 8.0),
            128 + 60 * np.sin((y + x) / 11.0),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("ss", ["4:2:0", "4:2:2"])
@pytest.mark.parametrize("shape", [(16, 16), (37, 29), (8, 50), (50, 9)])
def test_subsampled_roundtrip_error_bounds(ss, shape):
    """Odd dims and multi-MCU grids round-trip within a quantization +
    chroma-averaging error bound on smooth content."""
    px = _smooth_rgb(*shape, seed=shape[0])
    payload = jpeg.encode_jpeg(px, quality=92, subsampling=ss)
    out = jpeg.decode_jpeg(payload)
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 8.0
    assert jpeg.jpeg_sampling(payload) == ss
    assert jpeg.jpeg_header(payload) == (shape[1], shape[0], 3)


def test_flat_color_exact_at_420_and_channel_mapping():
    """A flat color image is DC-only in every plane: the 4:2:0 round-trip
    must reproduce the exact color — catching any Cb/Cr swap or
    upsample misalignment at the source."""
    for color in [(200, 50, 100), (30, 180, 220)]:
        px = np.full((16, 16, 3), color, np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=90, subsampling="4:2:0"))
        assert np.abs(out.astype(int) - np.array(color)).max() <= 2


def test_chroma_constant_image_matches_444():
    """When chroma is constant, downsampling loses nothing: the 4:2:0
    decode must track the 4:4:4 decode within a couple of quant levels."""
    y, x = np.mgrid[0:24, 0:21]
    # luma-only variation (equal RGB -> Cb=Cr=128 exactly)
    g = ((y * 5 + x * 3) % 200 + 20).astype(np.uint8)
    px = np.stack([g, g, g], axis=-1)
    d444 = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=95)).astype(int)
    d420 = jpeg.decode_jpeg(
        jpeg.encode_jpeg(px, quality=95, subsampling="4:2:0")
    ).astype(int)
    assert np.abs(d444 - d420).max() <= 2


def test_422_direction_of_subsampling():
    """4:2:2 halves chroma HORIZONTALLY only: per-pixel chroma
    alternation along x is destroyed (box mean flattens it) while the
    same alternation along y survives untouched — pinning that the Hi/Vi
    factors are not transposed. 4:2:0 destroys both directions."""
    y, x = np.mgrid[0:32, 0:32]
    lum = np.full((32, 32), 128.0)

    def mk(cb):
        ycc = np.stack([lum, cb, np.full((32, 32), 128.0)], -1)
        return jpeg.ycbcr_to_rgb(ycc).astype(np.uint8)

    xvar = mk(128 + 40.0 * ((x % 2) * 2 - 1))  # chroma alternates along x
    yvar = mk(128 + 40.0 * ((y % 2) * 2 - 1))  # chroma alternates along y

    def err(px, ss):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=95, subsampling=ss))
        return np.abs(out.astype(int) - px.astype(int)).mean()

    # measured: 4:2:2 xvar=28.0 yvar=0.33; 4:2:0 xvar=yvar=28.0
    assert err(xvar, "4:2:2") > 10.0 > err(yvar, "4:2:2")
    assert err(xvar, "4:2:0") > 10.0 and err(yvar, "4:2:0") > 10.0
    assert err(xvar, "4:4:4") < 2.0 and err(yvar, "4:4:4") < 2.0


def test_444_encoder_output_unchanged():
    """subsampling='4:4:4' must be bit-identical to the historical
    default encoder output (no regression for existing streams)."""
    px = _smooth_rgb(19, 23, seed=7)
    assert jpeg.encode_jpeg(px, quality=85) == jpeg.encode_jpeg(
        px, quality=85, subsampling="4:4:4"
    )
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(px, quality=85, subsampling="4:1:1")


def test_sampling_probe_gray_and_444():
    g = np.zeros((8, 8), np.uint8)
    assert jpeg.jpeg_sampling(jpeg.encode_jpeg(g)) == "gray"
    px = _smooth_rgb(8, 8)
    assert jpeg.jpeg_sampling(jpeg.encode_jpeg(px)) == "4:4:4"


@pytest.mark.skipif(not multimodal.HAS_PIL, reason="Pillow not installed")
def test_subsampled_cross_check_against_pillow():
    """Our 4:2:0 output must decode in Pillow, and Pillow's 4:2:0 output
    (the real-world default) must decode natively in ours."""
    import io

    from PIL import Image

    px = _smooth_rgb(24, 24, seed=3)
    theirs = np.asarray(
        Image.open(io.BytesIO(jpeg.encode_jpeg(px, quality=90, subsampling="4:2:0"))).convert("RGB")
    )
    assert np.abs(theirs.astype(int) - px.astype(int)).mean() < 10.0
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="JPEG", quality=90, subsampling=2)
    ours = jpeg.decode_jpeg(buf.getvalue())
    assert jpeg.jpeg_sampling(buf.getvalue()) == "4:2:0"
    assert np.abs(ours.astype(int) - px.astype(int)).mean() < 10.0


# -------------------------------------------------- restart intervals ----


def test_restart_interval_roundtrip_identical_pixels():
    """RSTm markers byte-align the stream and reset DC predictors; the
    decoded pixels must be IDENTICAL to the restart-free encoding of the
    same image (restarts change framing, never values)."""
    px = _smooth_rgb(40, 33, seed=5)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=90))
    for ri in (1, 2, 5):
        enc = jpeg.encode_jpeg(px, quality=90, restart_interval=ri)
        assert any(bytes([0xFF, 0xD0 + k]) in enc for k in range(8))
        assert np.array_equal(jpeg.decode_jpeg(enc), base)
    # subsampled + restarts compose
    enc = jpeg.encode_jpeg(px, quality=90, subsampling="4:2:0", restart_interval=2)
    b420 = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=90, subsampling="4:2:0"))
    assert np.array_equal(jpeg.decode_jpeg(enc), b420)
    # grayscale too
    g = _smooth_rgb(25, 19, seed=9)[..., 0]
    assert np.array_equal(
        jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90, restart_interval=3)),
        jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90)),
    )


def test_restart_marker_mismatch_fails_loudly():
    """A corrupted RSTm sequence number must raise, not desync silently."""
    px = _smooth_rgb(24, 24, seed=2)
    enc = bytearray(jpeg.encode_jpeg(px, quality=90, restart_interval=1))
    i = bytes(enc).find(b"\xff\xd0")
    assert i > 0
    enc[i + 1] = 0xD3  # wrong modulo-8 sequence
    with pytest.raises(ValueError, match="restart"):
        jpeg.decode_jpeg(bytes(enc))


@pytest.mark.skipif(not multimodal.HAS_PIL, reason="Pillow not installed")
def test_restart_cross_check_against_pillow():
    """Pillow must decode our restart-interval streams, and our decoder
    must read Pillow's (restart_marker_blocks) when that save option
    exists in the installed Pillow."""
    import io

    from PIL import Image

    px = _smooth_rgb(24, 24, seed=4)
    ours = jpeg.encode_jpeg(px, quality=90, restart_interval=2)
    theirs_px = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert np.abs(theirs_px.astype(int) - px.astype(int)).mean() < 10.0
    buf = io.BytesIO()
    try:
        Image.fromarray(px).save(
            buf, format="JPEG", quality=90, subsampling=0, restart_marker_blocks=2
        )
    except TypeError:
        pytest.skip("Pillow too old for restart_marker_blocks")
    if not any(bytes([0xFF, 0xD0 + k]) in buf.getvalue() for k in range(8)):
        pytest.skip("Pillow ignored restart_marker_blocks")
    ours_px = jpeg.decode_jpeg(buf.getvalue())
    assert np.abs(ours_px.astype(int) - px.astype(int)).mean() < 10.0


# ------------------------------------------------- multi-scan baseline ----


def _encode_multiscan_baseline(px, quality=90, subsampling="4:4:4"):
    """Foreign-style fixture: baseline JPEG delivered as THREE
    single-component full-band scans (T.81 allows up to 4 components per
    scan but some encoders emit one per scan); our encoder never
    produces this shape."""
    import struct

    from pyiceberg_lakehouse_spark.operators.jpeg import (
        _AC_SYMBOLS,
        _amplitude_bits,
        _BitWriter,
        _blocks_grid,
        _box_downsample,
        _category,
        _codes_from_table,
        _D,
        _DC_SYMBOLS,
        _flat_table,
        _Geometry,
        _SUBSAMPLING,
        quality_tables,
        rgb_to_ycbcr,
        ZIGZAG,
    )

    h, w, _ = px.shape
    qt_l, qt_c = quality_tables(quality)
    hv = _SUBSAMPLING[subsampling]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    ycc = rgb_to_ycbcr(px)
    planes = [
        _box_downsample(ycc[..., i], vmax // vi, hmax // hi)
        for i, (hi, vi) in enumerate(hv)
    ]
    qts, qt_ids = [qt_l, qt_c, qt_c], [0, 1, 1]
    geom = _Geometry(h, w, [(hi << 4) | vi for hi, vi in hv])
    coeffs = []
    for i, (plane, qt) in enumerate(zip(planes, qts)):
        blocks = _blocks_grid(plane, geom.bym[i], geom.bxm[i])
        dct = np.einsum("ux,ybxc,vc->ybuv", _D, blocks - 128.0, _D, optimize=True)
        coeffs.append(np.round(dct / qt).astype(np.int64).reshape(-1, 64)[:, ZIGZAG])
    dc_bits, dc_vals = _flat_table(_DC_SYMBOLS)
    ac_bits, ac_vals = _flat_table(_AC_SYMBOLS)
    dc_codes = _codes_from_table(dc_bits, dc_vals)
    ac_codes = _codes_from_table(ac_bits, ac_vals)
    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, qt_l), (1, qt_c)):
        body = bytes([tid]) + bytes(int(qt.reshape(64)[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci in range(3):
        hi, vi = hv[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qt_ids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    for ci in range(3):
        wtr = _BitWriter()
        pred = 0
        for b in geom.noninterleaved_blocks(ci):
            zz = coeffs[ci][b]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size = _category(diff)
            c, ln = dc_codes[size]
            wtr.write(c, ln)
            if size:
                wtr.write(_amplitude_bits(diff, size), size)
            run = 0
            last = int(np.max(np.nonzero(zz[1:])[0])) + 1 if np.any(zz[1:]) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    wtr.write(c, ln)
                    run -= 16
                size = _category(v)
                c, ln = ac_codes[(run << 4) | size]
                wtr.write(c, ln)
                wtr.write(_amplitude_bits(v, size), size)
                run = 0
            if last < 63:
                c, ln = ac_codes[0x00]
                wtr.write(c, ln)
        hdr = bytes([1, ci + 1, 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr + wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("ss", ["4:4:4", "4:2:0"])
def test_multiscan_baseline_decode_equals_interleaved(ss):
    """A baseline file delivered as three single-component scans must
    decode BIT-EQUAL to the interleaved single-scan encoding of the same
    pixels (same quantized coefficients, different scan framing) —
    subsampled components' non-interleaved scans walk their OWN block
    grid, skipping MCU-padding blocks per T.81 A.2.2."""
    px = _smooth_rgb(37, 29, seed=6)
    ms = jpeg.decode_jpeg(_encode_multiscan_baseline(px, 90, ss))
    il = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=90, subsampling=ss))
    assert np.array_equal(ms, il)


# ----------------------------------------------- lossless JPEG (SOF3) -----

from pyiceberg_lakehouse_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg_lossless,
    encode_jpeg_lossless,
)


def test_lossless_exact_roundtrip_all_predictors():
    rng = np.random.default_rng(11)
    for predictor in range(1, 8):
        for shape in ((7, 9), (5, 4, 3), (1, 1), (1, 6), (6, 1)):
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            dec = decode_jpeg_lossless(encode_jpeg_lossless(px, predictor))
            assert dec.shape == px.shape and (dec == px).all(), (
                predictor, shape,
            )


def test_lossless_dispatch_via_decode_jpeg():
    px = (np.arange(60, dtype=np.uint8).reshape(6, 10) * 4) % 256
    enc = encode_jpeg_lossless(px.astype(np.uint8), predictor=7)
    assert (jpeg.decode_jpeg(enc) == px).all()  # SOF3 dispatch, bit-exact


def test_lossless_rejects_gated_features_and_corruption():
    px = np.zeros((4, 4), dtype=np.uint8)
    enc = encode_jpeg_lossless(px)
    with pytest.raises(ValueError):
        decode_jpeg_lossless(enc[:20])  # truncated segment
    with pytest.raises(ValueError):
        encode_jpeg_lossless(px, predictor=0)
    # a point transform >= the sample precision is impossible
    doctored = bytearray(enc)
    i = doctored.find(b"\xff\xda")
    seglen = int.from_bytes(doctored[i + 2 : i + 4], "big")
    doctored[i + 2 + seglen - 1] = 0x08  # Al = 8 on an 8-bit stream
    with pytest.raises(ValueError, match="point transform"):
        decode_jpeg_lossless(bytes(doctored))
    # impossible precision rejected (2-16 is the T.81 lossless range)
    doctored = bytearray(enc)
    j = doctored.find(b"\xff\xc3")
    doctored[j + 4] = 17
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg_lossless(bytes(doctored))


def test_lossless_high_precision_roundtrip():
    rng = np.random.default_rng(5)
    for precision in (12, 16):
        px = rng.integers(0, 1 << precision, size=(8, 6), dtype=np.uint16)
        dec = decode_jpeg_lossless(
            encode_jpeg_lossless(px, predictor=4, precision=precision)
        )
        assert dec.dtype == np.uint16 and (dec == px).all()
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless(
            np.array([[5000]], dtype=np.uint16), precision=12
        )


def test_lossless_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=12),
        w=st.integers(min_value=1, max_value=12),
        nc=st.sampled_from([1, 3]),
        predictor=st.integers(min_value=1, max_value=7),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(h, w, nc, predictor, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if nc == 1 else (h, w, nc)
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = decode_jpeg_lossless(encode_jpeg_lossless(px, predictor))
        assert dec.shape == px.shape and (dec == px).all()

    check()


def test_lossless_point_transform_near_lossless():
    """Al > 0 drops that many low bits (T.81 H.2.1); the decoder restores
    the shift, so the roundtrip is exact on the kept bits."""
    rng = np.random.default_rng(17)
    for pt in (1, 2, 4):
        px = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
        dec = decode_jpeg_lossless(
            encode_jpeg_lossless(px, predictor=5, point_transform=pt)
        )
        assert (dec == (px >> pt) << pt).all()
    with pytest.raises(ValueError, match="point transform"):
        encode_jpeg_lossless(px, point_transform=8)


def test_lossless_multiscan_per_component():
    """Non-interleaved lossless: one scan per component (the foreign-
    encoder multi-scan shape) must decode bit-exactly, compose with
    point transforms and 12-bit precision, and reject a stream whose
    scans cover a component twice."""
    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    enc = encode_jpeg_lossless(px, predictor=4, interleaved=False)
    assert (decode_jpeg_lossless(enc) == px).all()
    px12 = rng.integers(0, 4096, size=(5, 7, 3), dtype=np.uint16)
    enc12 = encode_jpeg_lossless(
        px12, predictor=6, precision=12, point_transform=2, interleaved=False
    )
    assert (decode_jpeg_lossless(enc12) == (px12 >> 2) << 2).all()
    i = enc.find(b"\xff\xda")
    j = enc.find(b"\xff\xda", i + 2)
    with pytest.raises(ValueError, match="exactly once"):
        decode_jpeg_lossless(enc[:j] + enc[i:j] + enc[j:])


def test_lossless_restart_interval_roundtrip_property():
    """DRI/RSTm in lossless streams (T.81 H.2.4): arbitrary intervals —
    including mid-row boundaries (ri coprime with w) and intervals larger
    than the image — roundtrip bit-exactly across predictors, component
    counts, scan shapes and point transforms."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=10),
        w=st.integers(min_value=1, max_value=10),
        nc=st.sampled_from([1, 3]),
        predictor=st.integers(min_value=1, max_value=7),
        ri=st.integers(min_value=1, max_value=40),
        pt=st.sampled_from([0, 2]),
        interleaved=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(h, w, nc, predictor, ri, pt, interleaved, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if nc == 1 else (h, w, nc)
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = decode_jpeg_lossless(
            encode_jpeg_lossless(
                px,
                predictor=predictor,
                point_transform=pt,
                interleaved=interleaved,
                restart_interval=ri,
            )
        )
        assert dec.shape == px.shape and (dec == (px >> pt) << pt).all()

    check()


def test_lossless_restart_prediction_actually_resets():
    """A decoder that ignores the H.1.2.2 prediction reset (but still
    consumes the RSTm bytes) would mis-decode: verify by corrupting the
    restart semantics — decode with the markers stripped and the scan
    re-joined must NOT equal the correct pixels for a corpus where the
    interval origin prediction differs from the running prediction."""
    rng = np.random.default_rng(41)
    px = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    enc = encode_jpeg_lossless(px, predictor=4, restart_interval=7)
    assert (decode_jpeg_lossless(enc) == px).all()
    # 6*5 = 30 MCUs, ri=7 -> restarts mid-row at MCUs 7/14/21/28
    assert b"\xff\xd0" in enc


def test_lossless_restart_sequence_validated():
    """An out-of-order RSTm marker raises (T.81 E.2.4 modulo-8 sequence),
    it never silently resynchronizes."""
    rng = np.random.default_rng(43)
    px = rng.integers(0, 256, size=(4, 8), dtype=np.uint8)
    enc = bytearray(encode_jpeg_lossless(px, predictor=2, restart_interval=8))
    i = enc.find(b"\xff\xd0")
    assert i > 0
    enc[i + 1] = 0xD3  # RST0 -> RST3
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg_lossless(bytes(enc))


def test_lossless_restart_missing_marker_raises():
    """DRI promises a marker every ri MCUs; a stream that omits it (DRI
    patched larger than the encoder used) must fail loudly."""
    rng = np.random.default_rng(47)
    px = rng.integers(0, 256, size=(4, 8), dtype=np.uint8)
    enc = bytearray(encode_jpeg_lossless(px, predictor=1, restart_interval=8))
    i = enc.find(b"\xff\xdd")
    # encoder emitted RST every 8 MCUs; tell the decoder every 16
    enc[i + 4 : i + 6] = (16).to_bytes(2, "big")
    with pytest.raises(ValueError):
        decode_jpeg_lossless(bytes(enc))


def test_lossless_restart_with_multiscan_and_high_precision():
    rng = np.random.default_rng(53)
    px = rng.integers(0, 4096, size=(7, 6, 2), dtype=np.uint16)
    enc = encode_jpeg_lossless(
        px, predictor=7, precision=12, interleaved=False, restart_interval=5
    )
    assert (decode_jpeg_lossless(enc) == px).all()
