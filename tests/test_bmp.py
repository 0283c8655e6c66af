"""BMP / ICO codec tests (operators/bmp.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators import bmp


@pytest.mark.parametrize("bpp", [8, 24, 32])
@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip(bpp, top_down):
    rng = np.random.default_rng(hash((bpp, top_down)) & 0xFFFF)
    px = rng.integers(0, 256, size=(7, 11, 4), dtype=np.uint8)
    if bpp == 8:
        px[:, :, 0] = px[:, :, 2] = px[:, :, 1]
    enc = bmp.encode_bmp(px, bpp=bpp, top_down=top_down)
    got, meta = bmp.decode_bmp(enc)
    assert (meta["bpp"], meta["top_down"]) == (bpp, top_down)
    assert (got[:, :, :3] == px[:, :, :3]).all()
    if bpp == 32:
        assert (got[:, :, 3] == px[:, :, 3]).all()
    else:
        assert (got[:, :, 3] == 255).all()


def test_bmp_row_padding_is_exercised():
    # width 5 at 24bpp -> 15-byte rows padded to 16
    px = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    enc = bmp.encode_bmp(px, bpp=24)
    got, _ = bmp.decode_bmp(enc)
    assert (got[:, :, :3] == px).all()


def test_ico_mixed_members_roundtrip():
    rng = np.random.default_rng(6)
    px1 = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    px2 = rng.integers(0, 256, size=(5, 9, 4), dtype=np.uint8)
    ico = bmp.encode_ico(
        [{"rgba": px1, "form": "dib"}, {"rgba": px2, "form": "png"}]
    )
    ms = bmp.decode_ico(ico)
    assert [m["form"] for m in ms] == ["dib", "png"]
    assert (ms[0]["rgba"] == px1).all()
    assert (ms[1]["rgba"] == px2).all()


def test_hostile_inputs():
    with pytest.raises(ValueError, match="BM magic"):
        bmp.decode_bmp(b"XX" + bytes(60))
    with pytest.raises(ValueError, match="truncated"):
        good = bmp.encode_bmp(np.zeros((4, 4, 3), np.uint8))
        bmp.decode_bmp(good[:-8])
    with pytest.raises(NotImplementedError, match="compression"):
        bad = bytearray(bmp.encode_bmp(np.zeros((4, 4, 3), np.uint8)))
        bad[30] = 1  # BI_RLE8
        bmp.decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="reserved"):
        bmp.decode_ico(b"\x01\x00\x01\x00\x01\x00" + bytes(16))
    with pytest.raises(ValueError, match="zero"):
        bmp.decode_ico(b"\x00\x00\x01\x00\x00\x00")
    with pytest.raises(ValueError, match="out of bounds"):
        px = np.zeros((4, 4, 4), np.uint8)
        ico = bmp.encode_ico([{"rgba": px, "form": "dib"}])
        bmp.decode_ico(ico[:-10])
