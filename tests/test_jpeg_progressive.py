"""Progressive JPEG codec (operators/jpeg_progressive.py).

The strongest self-check available without a reference codec in the
container: a progressive stream carries the SAME quantized coefficients
as the baseline stream, so progressive decode must equal baseline decode
BIT-FOR-BIT on every image — two independent entropy-delivery paths
(single sequential scan vs DC-approximation + refinement + per-band AC +
AC-refinement) converging on identical output. Foreign-stream features
the in-repo encoder never emits (EOB runs spanning blocks) are pinned
with hand-assembled bitstreams.
"""

import struct

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators import jpeg
from pyiceberg_lakehouse_spark.operators.jpeg_progressive import (
    decode_progressive,
    encode_progressive,
    progressive_header,
)


def _noise(shape, seed):
    return np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize(
    "shape,seed,quality",
    [
        ((8, 8), 1, 90),
        ((24, 17), 2, 75),  # non-multiple-of-8 edges
        ((16, 16, 3), 3, 85),
        ((33, 41, 3), 4, 50),  # all four scan types under heavy content
        ((64, 64, 3), 5, 95),
    ],
)
def test_progressive_decode_equals_baseline_decode(shape, seed, quality):
    px = _noise(shape, seed)  # uniform noise = worst-case coefficients
    prog = decode_progressive(encode_progressive(px, quality=quality))
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=quality))
    assert np.array_equal(prog, base)


def test_decode_jpeg_dispatches_sof2():
    px = _noise((12, 20, 3), 6)
    payload = encode_progressive(px, quality=85)
    assert np.array_equal(jpeg.decode_jpeg(payload), decode_progressive(payload))
    # and the header probe accepts SOF2 now
    assert jpeg.jpeg_header(payload) == (20, 12, 3)
    assert progressive_header(payload) == (20, 12, 3)


def test_flat_image_near_lossless():
    px = np.full((16, 24), 130, dtype=np.uint8)
    out = decode_progressive(encode_progressive(px, quality=90))
    assert int(np.max(np.abs(out.astype(int) - 130))) <= 1


def test_foreign_eobrun_spanning_blocks():
    """EOB runs covering multiple blocks (emitted by libjpeg-style
    encoders, never by ours): hand-assemble an AC-first scan whose single
    EOB symbol (r=1 + 1 appended bit = EOBRUN 2) covers both blocks of a
    16x8 flat image; the decode must equal the solid color."""
    from pyiceberg_lakehouse_spark.operators.jpeg import (
        _AC_SYMBOLS,
        _BitWriter,
        _category,
        _amplitude_bits,
        _codes_from_table,
        _DC_SYMBOLS,
        _flat_table,
        quality_tables,
    )

    qt, _ = quality_tables(90)
    dc_bits, dc_vals = _flat_table(_DC_SYMBOLS)
    # EOB-with-run symbols (r>0, s=0) exist only in foreign tables — the
    # in-repo flat table never carries them, which is the point: this DHT
    # is hand-built the way a libjpeg-optimized file's would be
    ac_syms = [0x00, 0x10] + list(_AC_SYMBOLS[1:])
    ac_bits, ac_vals = _flat_table(ac_syms)
    dc_codes = _codes_from_table(dc_bits, dc_vals)
    ac_codes = _codes_from_table(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    from pyiceberg_lakehouse_spark.operators.jpeg import ZIGZAG

    body = bytes([0]) + bytes(int(qt.reshape(64)[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        b2 = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(b2) + 2) + b2

    # value 77 everywhere: DC coef = round((77-128)*8 / qt[0,0])
    dc = int(round((77.0 - 128.0) * 8.0 / qt[0, 0]))

    # scan 1: DC first, Al=0 (no refinement scan needed)
    w = _BitWriter()
    pred = 0
    for _b in range(2):
        diff = dc - pred
        pred = dc
        size = _category(diff)
        c, ln = dc_codes[size]
        w.write(c, ln)
        if size:
            w.write(_amplitude_bits(diff, size), size)
    hdr = bytes([1, 1, 0x00, 0, 0, 0x00])
    out += b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr + w.flush()

    # scan 2: AC band 1..63, Al=0, ONE symbol: EOB with r=1 and appended
    # bit 0 -> EOBRUN = (1<<1) - 1 + 0 = 1 more block beyond the current
    w = _BitWriter()
    c, ln = ac_codes[0x10]  # (r=1)<<4 | s=0
    w.write(c, ln)
    w.write(0, 1)
    hdr = bytes([1, 1, 0x00, 1, 63, 0x00])
    out += b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr + w.flush()
    out += b"\xff\xd9"

    decoded = decode_progressive(bytes(out))
    assert decoded.shape == (8, 16)
    assert int(np.max(np.abs(decoded.astype(int) - 77))) <= 1


def test_honest_gates():
    px = _noise((8, 8, 3), 9)
    payload = bytearray(encode_progressive(px, quality=90))
    # subsampled progressive now DECODES; the remaining sampling gate is
    # fractional ratios (Hmax not a multiple of a component's Hi)
    i = payload.find(b"\xff\xc2")
    assert i > 0
    patched = bytearray(payload)
    base = i + 2 + 2 + 1 + 4 + 1  # first component triple
    patched[base + 1] = 0x31  # comp 0: 3x1
    patched[base + 4] = 0x21  # comp 1: 2x1 -> 3 % 2 != 0
    with pytest.raises(NotImplementedError, match="fractional"):
        decode_progressive(bytes(patched))
    # sequential stream rejected by the progressive entry point
    seq = jpeg.encode_jpeg(px[..., 0], quality=90)
    with pytest.raises(ValueError, match="not a progressive"):
        decode_progressive(seq)
    with pytest.raises(ValueError, match="missing SOI"):
        decode_progressive(b"nope")


@pytest.mark.parametrize("ss", ["4:2:0", "4:2:2"])
@pytest.mark.parametrize("shape", [(16, 16), (37, 29), (9, 50)])
def test_progressive_subsampled_bitequal_to_baseline(ss, shape):
    """The strongest cross-check available: the progressive and baseline
    encoders quantize the SAME subsampled coefficients, so decoding the
    progressive multi-scan delivery must reproduce the baseline decode
    BIT-FOR-BIT at every subsampling scheme and geometry (incl. MCU
    padding rows/cols that only interleaved DC scans cover)."""
    h, w = shape
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [
            128 + 70 * np.sin(y / 9.0) * np.cos(x / 7.0),
            128 + 55 * np.cos(x / 8.0),
            128 + 60 * np.sin((y + x) / 11.0),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    prog = decode_progressive(encode_progressive(px, quality=90, subsampling=ss))
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=90, subsampling=ss))
    assert np.array_equal(prog, base)


def test_progressive_subsampled_flat_color_exact():
    px = np.full((16, 16, 3), (60, 190, 120), np.uint8)
    out = decode_progressive(encode_progressive(px, quality=90, subsampling="4:2:0"))
    assert np.abs(out.astype(int) - np.array((60, 190, 120))).max() <= 2


@pytest.mark.parametrize("ss", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("ri", [1, 2, 5])
def test_progressive_restart_intervals_bitequal(ss, ri):
    """Restart markers in EVERY progressive scan type (interleaved DC,
    DC refinement, AC first, AC refinement) must not change a single
    pixel: decode equals the baseline codec bit-for-bit, as without
    restarts. EOB runs and DC predictors reset at each boundary."""
    y, x = np.mgrid[0:40, 0:33]
    px = np.stack(
        [
            128 + 70 * np.sin(y / 9.0) * np.cos(x / 7.0),
            128 + 55 * np.cos(x / 8.0),
            128 + 60 * np.sin((y + x) / 11.0),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    enc = encode_progressive(px, quality=90, subsampling=ss, restart_interval=ri)
    assert any(bytes([0xFF, 0xD0 + k]) in enc for k in range(8))
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=90, subsampling=ss))
    assert np.array_equal(decode_progressive(enc), base)


def test_progressive_restart_mismatch_fails_loudly():
    px = _noise((24, 24), 3)
    enc = bytearray(encode_progressive(px, quality=90, restart_interval=1))
    i = bytes(enc).find(b"\xff\xd0")
    assert i > 0
    enc[i + 1] = 0xD5
    with pytest.raises(ValueError, match="restart"):
        decode_progressive(bytes(enc))
