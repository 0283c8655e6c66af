"""EXIF metadata — the camera-JPEG APP1 segment, which is a TIFF IFD
chain by construction (reuses operators/tiff.py's IFD walk for both
byte orders).

A curation pipeline filters on EXIF constantly: orientation (to
normalize rotation before any vision model), capture time (dedup
bursts, time-split leakage), camera make/model (device stratification),
ISO/exposure (quality priors). This layer extracts exactly those
fields; the GPS IFD is parsed when present but maker notes stay opaque
(vendor-proprietary, honestly skipped).
"""

from __future__ import annotations

import struct

from pyiceberg_lakehouse_spark.operators.tiff import build_ifds, parse_ifd

_TAG_MAKE = 271
_TAG_MODEL = 272
_TAG_ORIENTATION = 274
_TAG_DATETIME = 306
_TAG_EXIF_IFD = 34665
_TAG_GPS_IFD = 34853
_TAG_EXPOSURE = 33434
_TAG_FNUMBER = 33437
_TAG_ISO = 34855
_TAG_DT_ORIGINAL = 36867
_TAG_PIXEL_X = 40962
_TAG_PIXEL_Y = 40963


def build_exif_app1(
    orientation: int = 1,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    iso: int | None = None,
    exposure: tuple[int, int] | None = None,
    pixel_xy: tuple[int, int] | None = None,
    big_endian: bool = False,
    gps: dict | None = None,
) -> bytes:
    """-> the APP1 segment PAYLOAD (starts ``Exif\\x00\\x00``).

    ``gps`` (geotagged cameras): {'lat': (deg, minute, sec100, 'N'|'S'),
    'lon': (deg, minute, sec100, 'E'|'W'), 'alt': (num, den)?} — the
    deg/min/sec rationals write with denominators (1, 1, 100), the
    wire shape phones actually emit."""
    ifd0: list[tuple[int, int, object]] = [
        (_TAG_ORIENTATION, 3, [int(orientation)])
    ]
    if make is not None:
        ifd0.append((_TAG_MAKE, 2, make))
    if model is not None:
        ifd0.append((_TAG_MODEL, 2, model))
    if datetime is not None:
        ifd0.append((_TAG_DATETIME, 2, datetime))
    exif: list[tuple[int, int, object]] = []
    if iso is not None:
        exif.append((_TAG_ISO, 3, [int(iso)]))
    if exposure is not None:
        exif.append((_TAG_EXPOSURE, 5, [exposure]))
    if pixel_xy is not None:
        exif.append((_TAG_PIXEL_X, 4, [pixel_xy[0]]))
        exif.append((_TAG_PIXEL_Y, 4, [pixel_xy[1]]))
    ifds = [ifd0]
    if exif:
        ifd0.append((_TAG_EXIF_IFD, 4, ("ifd", 1)))
        ifds.append(exif)
    if gps is not None:
        glat, glon = gps["lat"], gps["lon"]
        gtags: list[tuple[int, int, object]] = [
            (1, 2, glat[3]),
            (2, 5, [(glat[0], 1), (glat[1], 1), (glat[2], 100)]),
            (3, 2, glon[3]),
            (4, 5, [(glon[0], 1), (glon[1], 1), (glon[2], 100)]),
        ]
        if gps.get("alt") is not None:
            gtags.append((6, 5, [tuple(gps["alt"])]))
        ifd0.append((_TAG_GPS_IFD, 4, ("ifd", len(ifds))))
        ifds.append(gtags)
    return b"Exif\x00\x00" + build_ifds(ifds, ">" if big_endian else "<")


def insert_app1(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (where cameras put it)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    if len(app1_payload) + 2 > 0xFFFF:
        raise ValueError("APP1 segment too large")
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_payload) + 2)
    return jpeg[:2] + seg + app1_payload + jpeg[2:]


def parse_exif(jpeg: bytes) -> dict:
    """Walk the JPEG marker stream for APP1/Exif -> flat dict:
    {orientation, make, model, datetime, datetime_original, iso,
    exposure (num, den), pixel_x, pixel_y, big_endian} — keys present
    only when the file carries them; {} when there is no Exif APP1.
    Raises on a structurally corrupt APP1 (bad TIFF header, IFD out of
    bounds) — silent partial metadata corrupts curation filters."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    tiff = None
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("lost JPEG marker sync")
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", jpeg, pos + 2)
        if seg_len < 2 or pos + 2 + seg_len > len(jpeg):
            raise ValueError("JPEG segment exceeds the file")
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = jpeg[pos + 10 : pos + 2 + seg_len]
            break
        if marker == 0xDA:  # entropy data follows; no APP1 past SOS
            break
        pos += 2 + seg_len
    if tiff is None:
        return {}
    if tiff[:2] == b"II":
        e = "<"
    elif tiff[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("EXIF TIFF header has a bad byte-order mark")
    magic, ifd0_off = struct.unpack_from(f"{e}HI", tiff, 2)
    if magic != 42:
        raise ValueError("EXIF TIFF header has a bad magic")
    ifd0, _next = parse_ifd(tiff, ifd0_off, e)
    out: dict = {"big_endian": e == ">"}

    def put(key, tag, src, first=True):
        v = src.get(tag)
        if v is not None:
            out[key] = v[0] if first and isinstance(v, list) else v

    put("orientation", _TAG_ORIENTATION, ifd0)
    put("make", _TAG_MAKE, ifd0, first=False)
    put("model", _TAG_MODEL, ifd0, first=False)
    put("datetime", _TAG_DATETIME, ifd0, first=False)
    if _TAG_EXIF_IFD in ifd0:
        sub, _ = parse_ifd(tiff, ifd0[_TAG_EXIF_IFD][0], e)
        put("iso", _TAG_ISO, sub)
        put("exposure", _TAG_EXPOSURE, sub)
        put("datetime_original", _TAG_DT_ORIGINAL, sub, first=False)
        put("pixel_x", _TAG_PIXEL_X, sub)
        put("pixel_y", _TAG_PIXEL_Y, sub)
    if _TAG_GPS_IFD in ifd0:
        gps, _ = parse_ifd(tiff, ifd0[_TAG_GPS_IFD][0], e)
        out["gps_tags"] = len(gps)

        def dms_to_degrees(triplet, ref, neg_refs) -> float | None:
            if not (isinstance(triplet, list) and len(triplet) == 3):
                return None
            (n1, d1), (n2, d2), (n3, d3) = triplet
            if 0 in (d1, d2, d3):
                raise ValueError("GPS rational with a zero denominator")
            dd = (n1 / d1) + (n2 / d2) / 60 + (n3 / d3) / 3600
            return -dd if ref in neg_refs else dd

        if 2 in gps:
            out["gps_lat"] = dms_to_degrees(
                gps[2], gps.get(1), ("S", "S\x00")
            )
        if 4 in gps:
            out["gps_lon"] = dms_to_degrees(
                gps[4], gps.get(3), ("W", "W\x00")
            )
        if 6 in gps and gps[6]:
            num, den = gps[6][0]
            if den == 0:
                raise ValueError("GPS altitude with a zero denominator")
            out["gps_alt"] = num / den
    return out
