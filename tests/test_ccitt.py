"""CCITT Group 4 (T.6) codec tests: table consistency, round-trip
properties, and TIFF Compression 4 integration."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyiceberg_lakehouse_spark.operators import ccitt, tiff


def test_code_tables_complete_and_prefix_free():
    # _check at import already asserts: re-run explicitly for the record
    for codes in (ccitt.WHITE_CODES, ccitt.BLACK_CODES):
        assert all(r in codes for r in range(64))
        assert all(r in codes for r in range(64, 1729, 64))
        ccitt._build_trie({**codes, **{k + 10000: v for k, v in ccitt.EXT_CODES.items()}})
    ccitt._build_trie(ccitt.MODE_CODES)


def _roundtrip(bits: np.ndarray) -> None:
    h, w = bits.shape
    packed = np.packbits(bits, axis=1).tobytes()
    enc = ccitt.g4_encode(packed, w, h)
    assert ccitt.g4_decode(enc, w, h) == packed


def test_solid_and_stripes():
    _roundtrip(np.zeros((5, 40), dtype=np.uint8))
    _roundtrip(np.ones((5, 40), dtype=np.uint8))
    _roundtrip((np.arange(64)[None, :] % 2).repeat(7, axis=0).astype(np.uint8))
    _roundtrip((np.arange(9)[:, None] % 2).repeat(31, axis=1).astype(np.uint8))


def test_single_column_and_row():
    _roundtrip(np.array([[1]], dtype=np.uint8))
    _roundtrip(np.array([[0]], dtype=np.uint8))
    _roundtrip(np.array([[1, 0, 0, 1, 1, 1, 0]], dtype=np.uint8))
    _roundtrip(np.array([[1], [0], [1]], dtype=np.uint8))


def test_long_runs_use_makeups():
    # runs > 2560 force chained extended makeup codes
    row = np.zeros((2, 6000), dtype=np.uint8)
    row[0, 100:5900] = 1
    row[1, :] = 1
    _roundtrip(row)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 80),
    st.integers(1, 16),
    st.integers(0, 2**32 - 1),
)
def test_random_rasters_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    # blocky structure (fax-like) plus pure noise rows
    bits = (rng.random((h, w)) > 0.5).astype(np.uint8)
    bits[:, : w // 2] = (rng.random() > 0.5)
    _roundtrip(bits)


def test_truncated_stream_raises():
    bits = (np.arange(40)[None, :] % 3 == 0).astype(np.uint8).repeat(4, axis=0)
    packed = np.packbits(bits, axis=1).tobytes()
    enc = ccitt.g4_encode(packed, 40, 4)
    with pytest.raises(ValueError):
        ccitt.g4_decode(enc[: max(1, len(enc) // 3)], 40, 4)


def test_tiff_g4_integration():
    rng = np.random.default_rng(11)
    for photo in (0, 1):
        for tile in (None, (16, 16)):
            px = ((rng.random((21, 37)) > 0.6) * 255).astype(np.uint8)
            enc = tiff.encode_tiff(
                px, compression=4, bits=1, photometric=photo, tile=tile
            )
            got, meta = tiff.decode_tiff(enc)
            assert meta["compression"] == 4
            assert (got[:, :, 0] == px).all()


def test_tiff_g4_rejects_8bit():
    px = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError):
        tiff.encode_tiff(px, compression=4, bits=8)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 70), st.integers(1, 10), st.integers(0, 2**32 - 1),
       st.booleans())
def test_g3_1d_random_roundtrip(w, h, seed, eol):
    rng = np.random.default_rng(seed)
    bits = (rng.random((h, w)) > 0.5).astype(np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    enc = ccitt.g3_1d_encode(packed, w, h, byte_align=not eol, with_eol=eol)
    assert ccitt.g3_1d_decode(
        enc, w, h, byte_align=not eol, with_eol=eol
    ) == packed


def test_g3_missing_eol_raises():
    bits = np.ones((2, 16), dtype=np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    enc = ccitt.g3_1d_encode(packed, 16, 2, byte_align=True, with_eol=False)
    with pytest.raises(ValueError, match="EOL"):
        ccitt.g3_1d_decode(enc, 16, 2, byte_align=False, with_eol=True)


def test_tiff_g3_integration_and_2d_gate():
    rng = np.random.default_rng(13)
    px = ((rng.random((9, 33)) > 0.5) * 255).astype(np.uint8)
    for comp in (2, 3):
        enc = tiff.encode_tiff(px, compression=comp, bits=1, photometric=0)
        got, meta = tiff.decode_tiff(enc)
        assert meta["compression"] == comp and (got[:, :, 0] == px).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 64), st.integers(1, 12), st.integers(1, 4),
       st.integers(0, 2**32 - 1))
def test_g3_2d_random_roundtrip(w, h, k, seed):
    rng = np.random.default_rng(seed)
    bits = (rng.random((h, w)) > 0.5).astype(np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    enc = ccitt.g3_2d_encode(packed, w, h, k=k)
    assert ccitt.g3_2d_decode(enc, w, h) == packed


def test_tiff_t4_2d_integration():
    rng = np.random.default_rng(17)
    px = ((rng.random((18, 41)) > 0.5) * 255).astype(np.uint8)
    for tile in (None, (16, 16)):
        enc = tiff.encode_tiff(
            px, compression=3, bits=1, photometric=0, tile=tile,
            t4_two_d=True,
        )
        got, meta = tiff.decode_tiff(enc)
        assert meta["compression"] == 3 and (got[:, :, 0] == px).all()


def test_pdf_ccitt_k_positive():
    from pyiceberg_lakehouse_spark.operators import pdf as _pdf

    rng = np.random.default_rng(12)
    bits = (rng.random((12, 27)) > 0.5).astype(np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    for b1 in (True, False):
        b = _pdf.encode_pdf(
            [["x"]], compress=False,
            images={0: [{"width": 27, "height": 12, "codec": "g3_2d",
                         "data": packed, "blackis1": b1}]},
        )
        im = _pdf.extract_pdf_images(b)[0]
        rb = (27 + 7) // 8
        got = np.unpackbits(
            np.frombuffer(im["pixels"], dtype=np.uint8).reshape(12, rb),
            axis=1,
        )[:, :27]
        assert (got == bits).all()
