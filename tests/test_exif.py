"""EXIF APP1 (operators/exif.py): both byte orders, tag types, marker
walk, hostile segments, and the no-breakage contract with the pixel
decoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators import jpeg
from pyiceberg_lakehouse_spark.operators.exif import (
    build_exif_app1,
    insert_app1,
    parse_exif,
)


def _jpeg():
    px = (np.arange(64).reshape(8, 8) * 5 % 256).astype(np.uint8)
    return jpeg.encode_jpeg(px)


@pytest.mark.parametrize("be", [False, True])
def test_full_roundtrip(be):
    tagged = insert_app1(
        _jpeg(),
        build_exif_app1(
            orientation=3, make="Mk", model="Md",
            datetime="2022:02:02 02:02:02", iso=800,
            exposure=(1, 250), pixel_xy=(8, 8), big_endian=be,
        ),
    )
    m = parse_exif(tagged)
    assert m == {
        "big_endian": be, "orientation": 3, "make": "Mk", "model": "Md",
        "datetime": "2022:02:02 02:02:02", "iso": 800,
        "exposure": (1, 250), "pixel_x": 8, "pixel_y": 8,
    }
    # pixel decode unaffected by the splice
    assert jpeg.decode_jpeg(tagged).shape == (8, 8)


def test_minimal_and_missing_fields():
    tagged = insert_app1(_jpeg(), build_exif_app1(orientation=1))
    m = parse_exif(tagged)
    assert m["orientation"] == 1
    assert "iso" not in m and "make" not in m
    assert parse_exif(_jpeg()) == {}


def test_app1_must_precede_sos():
    """An APP1 spliced after SOS is entropy data, not metadata — the
    walk must stop at SOS rather than misread compressed bytes."""
    j = _jpeg()
    app1 = build_exif_app1(orientation=5)
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    assert parse_exif(j[:2] + j[2:] + seg) == {}


def test_hostile_inputs():
    with pytest.raises(ValueError, match="missing SOI"):
        parse_exif(b"nope")
    with pytest.raises(ValueError, match="missing SOI"):
        insert_app1(b"nope", b"Exif\x00\x00")
    j = _jpeg()
    # truncated segment length
    bad = j[:2] + b"\xff\xe1\x00\x99Exif\x00\x00" + j[2:4]
    with pytest.raises(ValueError, match="exceeds the file"):
        parse_exif(bad)
    # APP1 with a corrupt TIFF header
    tagged = insert_app1(j, b"Exif\x00\x00XXXXXXXX")
    with pytest.raises(ValueError, match="byte-order"):
        parse_exif(tagged)
    # IFD pointer past the segment
    app1 = bytearray(build_exif_app1(orientation=1))
    struct.pack_into("<I", app1, 10, 9999)
    with pytest.raises(ValueError, match="out of bounds"):
        parse_exif(insert_app1(j, bytes(app1)))
    # oversized APP1 refused at build time
    with pytest.raises(ValueError, match="too large"):
        insert_app1(j, b"Exif\x00\x00" + b"x" * 70000)


def test_non_exif_app1_skipped():
    """XMP also rides in APP1 — a non-Exif APP1 must not be misread."""
    j = _jpeg()
    xmp = b"http://ns.adobe.com/xap/1.0/\x00<x:xmpmeta/>"
    seg = b"\xff\xe1" + struct.pack(">H", len(xmp) + 2) + xmp
    both = j[:2] + seg + j[2:]
    assert parse_exif(both) == {}
    tagged = insert_app1(both, build_exif_app1(orientation=7))
    assert parse_exif(tagged)["orientation"] == 7
