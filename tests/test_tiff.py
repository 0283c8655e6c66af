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
        comp=st.sampled_from([1, 5, 8, 32773]), rps=st.integers(1, 8),
        pred=st.sampled_from([1, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, ch, be, comp, rps, pred, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        got, meta = decode_tiff(
            encode_tiff(px, big_endian=be, compression=comp,
                        rows_per_strip=rps, predictor=pred)
        )
        assert (got == px).all()
        assert meta["predictor"] == pred
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

    set_tag(259, 7)  # JPEG-in-TIFF
    with pytest.raises(NotImplementedError, match="compression 7"):
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
        encode_tiff(px, compression=7)
    with pytest.raises(ValueError, match="predictor must be"):
        encode_tiff(px, predictor=3)


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


def _msb_pack(codes_widths):
    acc, nbits, out = 0, 0, bytearray()
    for code, width in codes_widths:
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_early_change_pinned_bit_for_bit():
    """Pin the Aldus 'early change' against a hand-packed bitstream: with
    255 distinct-pair literals, the decoder adds table slot 510 while
    processing the 254th code and must read the 255th AT 10 BITS — one
    code earlier than textbook LZW. The encoder must emit the identical
    stream (CLEAR + 254 nine-bit codes + two ten-bit codes)."""
    from pyiceberg_lakehouse_spark.operators.tiff import (
        lzw_decode,
        lzw_encode,
    )

    data = bytes(range(255))  # every (prev, next) pair is a table miss
    hand = _msb_pack(
        [(256, 9)]
        + [(k, 9) for k in range(254)]  # codes c1..c254
        + [(254, 10), (257, 10)]  # c255 and EOI at the bumped width
    )
    assert lzw_encode(data) == hand
    assert lzw_decode(hand, 255) == data


def test_lzw_edges_and_hostile():
    from pyiceberg_lakehouse_spark.operators.tiff import (
        lzw_decode,
        lzw_encode,
    )

    # KwKwK: run of one symbol forces code-one-past-table immediately
    run = b"\x07" * 50
    assert lzw_decode(lzw_encode(run), 50) == run
    # empty strip is just CLEAR + EOI
    assert lzw_decode(lzw_encode(b""), 0) == b""
    # table clear at slot 4094: high-entropy input crossing 3836 codes
    rng = np.random.default_rng(3)
    big = rng.integers(0, 256, 30000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(big), len(big)) == big
    with pytest.raises(ValueError, match="without an EOI"):
        lzw_decode(_msb_pack([(256, 9), (65, 9)]), 1)
    with pytest.raises(ValueError, match="non-literal"):
        lzw_decode(_msb_pack([(256, 9), (300, 9), (257, 9)]), 1)
    with pytest.raises(ValueError, match="beyond the string table"):
        lzw_decode(_msb_pack([(256, 9), (65, 9), (400, 9), (257, 9)]), 5)
    with pytest.raises(ValueError, match="decoded 1 of 3"):
        lzw_decode(_msb_pack([(256, 9), (65, 9), (257, 9)]), 3)
    with pytest.raises(ValueError, match="decodes past"):
        lzw_decode(_msb_pack([(256, 9), (65, 9), (66, 9), (257, 9)]), 1)


def test_lzw_predictor_shrinks_gradients():
    """Predictor 2 turns smooth gradients into near-constant diffs; the
    LZW output must get much smaller — the reason every real scan pairs
    tag 317=2 with Compression 5."""
    x = np.arange(64, dtype=np.int64)[None, :, None]
    y = np.arange(48, dtype=np.int64)[:, None, None]
    px = ((3 * x + 5 * y) % 256).astype(np.uint8)
    plain = encode_tiff(px, compression=5, predictor=1)
    predicted = encode_tiff(px, compression=5, predictor=2)
    assert len(predicted) < len(plain) // 2
    got, meta = decode_tiff(predicted)
    assert (got == px).all() and meta["predictor"] == 2


def test_deflate_old_tag_and_strictness():
    """Compression 32946 (the pre-Adobe deflate tag) decodes like 8; a
    strip inflating to the wrong size raises."""
    import struct as _st
    import zlib as _zl

    px = np.arange(60, dtype=np.uint8).reshape(4, 15, 1)
    raw = bytearray(encode_tiff(px, compression=8, rows_per_strip=4))
    (ifd_off,) = _st.unpack_from("<I", raw, 4)
    (n,) = _st.unpack_from("<H", raw, ifd_off)
    for k in range(n):
        at = ifd_off + 2 + 12 * k
        if _st.unpack_from("<H", raw, at)[0] == 259:
            _st.pack_into("<H", raw, at + 8, 32946)
    got, meta = decode_tiff(bytes(raw))
    assert (got == px).all() and meta["compression"] == 32946
    # corrupted deflate payload -> strict error, not partial pixels
    enc = bytearray(encode_tiff(px, compression=8, rows_per_strip=4))
    strip = _zl.compress(px.tobytes(), 6)
    at = enc.index(strip)
    enc[at + len(strip) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="Deflate strip|corrupt Deflate"):
        decode_tiff(bytes(enc))


def test_tiled_layout_roundtrip_all_compressions():
    """Tiles (§15): grid split, edge padding clipped on read, predictor
    restarting per tile row, every compression."""
    y, x = np.ogrid[0:37, 0:41]
    px = ((3 * x + 5 * y) % 256).astype(np.uint8)[:, :, None].repeat(3, 2)
    for comp in (1, 5, 8, 32773):
        for pred in (1, 2):
            for tile in ((16, 16), (32, 16), (16, 32)):
                enc = encode_tiff(
                    px, compression=comp, predictor=pred, tile=tile
                )
                got, meta = decode_tiff(enc)
                assert (got == px).all(), (comp, pred, tile)
                assert meta["tiled"] and meta["n_strips"] == 0
                ta = (41 + tile[0] - 1) // tile[0]
                td = (37 + tile[1] - 1) // tile[1]
                assert meta["n_tiles"] == ta * td


def test_tiled_predictor_differs_from_strip_predictor():
    """Predictor 2 must restart at tile boundaries: decoding tiled
    bytes with the strip predictor layout would corrupt pixels, so the
    two encodings differ while both roundtrip."""
    y, x = np.ogrid[0:16, 0:32]
    px = ((7 * x + y) % 256).astype(np.uint8)
    tiled = encode_tiff(px, predictor=2, tile=(16, 16))
    strip = encode_tiff(px, predictor=2)
    assert (decode_tiff(tiled)[0] == decode_tiff(strip)[0]).all()
    assert tiled != strip


def test_tile_dimensions_must_be_multiples_of_16():
    px = np.zeros((20, 20), dtype=np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(px, tile=(20, 16))


def test_tile_grid_count_mismatch_raises():
    px = np.arange(256, dtype=np.uint8).reshape(16, 16)
    enc = bytearray(encode_tiff(px, tile=(16, 16)))
    # lie about the width so the grid implies 2 tiles
    import struct as _st

    (ifd_off,) = _st.unpack_from("<I", enc, 4)
    (n,) = _st.unpack_from("<H", enc, ifd_off)
    for k in range(n):
        at = ifd_off + 2 + 12 * k
        if _st.unpack_from("<H", enc, at)[0] == 256:
            _st.pack_into("<I", enc, at + 8, 30)
    with pytest.raises(ValueError, match="tile count"):
        decode_tiff(bytes(enc))


def test_bilevel_roundtrip_both_photometrics_both_layouts():
    """BitsPerSample 1: rows bit-packed MSB-first with per-row byte
    padding; photometric 0 stores inverted bits; logical black-is-zero
    values roundtrip exactly in strip and tile layouts."""
    y, x = np.ogrid[0:21, 0:27]
    px = (((3 * x + 5 * y) % 2) * 255).astype(np.uint8)[:, :, None]
    for comp in (1, 5, 8, 32773):
        for pm in (0, 1):
            for kw in ({"rows_per_strip": 4}, {"tile": (16, 16)}):
                enc = encode_tiff(
                    px, compression=comp, bits=1, photometric=pm, **kw
                )
                got, meta = decode_tiff(enc)
                assert (got == px).all(), (comp, pm, kw)
                assert meta["bits"] == 1 and meta["photometric"] == pm


def test_bilevel_stored_bits_actually_invert():
    """The two photometrics must differ on the WIRE (same logical
    image, inverted stored bits), not just in the tag."""
    px = np.array([[255, 0, 255, 0]], dtype=np.uint8)[:, :, None]
    a = encode_tiff(px, bits=1, photometric=1)
    b = encode_tiff(px, bits=1, photometric=0)
    assert a != b
    assert (decode_tiff(a)[0] == decode_tiff(b)[0]).all()


def test_bilevel_rejects_predictor_and_rgb():
    px = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="predictor 2 requires 8-bit"):
        encode_tiff(px, bits=1, predictor=2)
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="single-sample"):
        encode_tiff(rgb, bits=1)


def test_non_1_or_8_bit_depth_still_gated():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    enc = bytearray(encode_tiff(px))
    import struct as _st

    (ifd_off,) = _st.unpack_from("<I", enc, 4)
    (n,) = _st.unpack_from("<H", enc, ifd_off)
    for k in range(n):
        at = ifd_off + 2 + 12 * k
        if _st.unpack_from("<H", enc, at)[0] == 258:
            _st.pack_into("<H", enc, at + 8, 4)
    with pytest.raises(NotImplementedError, match="BitsPerSample"):
        decode_tiff(bytes(enc))
