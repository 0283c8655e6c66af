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


class TestGps:
    """r14: GPS IFD coordinate extraction — the geo-curation fields."""

    def _tagged(self, gps):
        import numpy as np

        from pyiceberg_lakehouse_spark.operators import jpeg as _jpeg
        from pyiceberg_lakehouse_spark.operators.exif import (
            build_exif_app1,
            insert_app1,
        )

        px = np.zeros((8, 8), dtype=np.uint8)
        return insert_app1(
            _jpeg.encode_jpeg(px), build_exif_app1(gps=gps)
        )

    def test_signed_decimal_degrees(self):
        from pyiceberg_lakehouse_spark.operators.exif import parse_exif

        m = parse_exif(
            self._tagged(
                {
                    "lat": (48, 51, 2400, "N"),
                    "lon": (2, 17, 4000, "W"),
                    "alt": (355, 10),
                }
            )
        )
        assert m["gps_lat"] == 48 + 51 / 60 + 24 / 3600
        assert m["gps_lon"] == -(2 + 17 / 60 + 40 / 3600)
        assert m["gps_alt"] == 35.5

    def test_south_is_negative_and_alt_optional(self):
        from pyiceberg_lakehouse_spark.operators.exif import parse_exif

        m = parse_exif(
            self._tagged(
                {"lat": (10, 0, 0, "S"), "lon": (20, 30, 0, "E")}
            )
        )
        assert m["gps_lat"] == -10.0 and m["gps_lon"] == 20.5
        assert "gps_alt" not in m

    def test_zero_denominator_raises(self):
        import struct as _st

        from pyiceberg_lakehouse_spark.operators.exif import parse_exif

        blob = bytearray(
            self._tagged({"lat": (1, 2, 3, "N"), "lon": (4, 5, 6, "E")})
        )
        # zero out the first latitude denominator (value 1, LE)
        at = blob.index(_st.pack("<II", 1, 1) + _st.pack("<II", 2, 1))
        _st.pack_into("<I", blob, at + 4, 0)
        import pytest as _pt

        with _pt.raises(ValueError, match="zero denominator"):
            parse_exif(bytes(blob))

    def test_untagged_file_has_no_gps_keys(self):
        from pyiceberg_lakehouse_spark.operators.exif import parse_exif

        m = parse_exif(self._tagged(None))
        assert "gps_lat" not in m and "gps_tags" not in m
