"""BMP and ICO (favicon) codecs — stdlib/numpy only.

The web's legacy raster pair: BMP (BITMAPINFOHEADER form — bottom-up
and top-down rows, 4-byte row padding, BI_RGB 8-bit palettized /
24-bit BGR / 32-bit BGRA) and ICO, whose members are either embedded
PNG (the modern favicon layout, decoded through the engine's own PNG
codec) or header-less DIBs with the DOUBLED-height convention carrying
a 1-bit AND transparency mask after the XOR pixels.

Encoders exist for planted fixtures; decoders are strict (bad magic,
short pixel arrays, unsupported compressions raise). Reference parity:
ashkangoleh/pyiceberg-lakehouse ingests binaries opaquely
(main-daft.py:68); favicon/bitmap decode serves the crawl-curation
surface of the task brief.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(rgba: np.ndarray, bpp: int = 24, top_down: bool = False) -> bytes:
    """(h, w, 3|4) uint8 -> BMP bytes at 8 (palettized gray), 24, 32 bpp."""
    px = np.asarray(rgba, dtype=np.uint8)
    h, w = px.shape[:2]
    if bpp == 8:
        # grayscale palette; index = luma-ish green channel
        pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
        idx = px[:, :, 1]
        rowbytes = (w + 3) & ~3
        rows = []
        for y in range(h):
            src = y if top_down else h - 1 - y
            rows.append(idx[src].tobytes().ljust(rowbytes, b"\x00"))
        body = b"".join(rows)
        off = 14 + 40 + len(pal)
        info = struct.pack(
            "<IiihhIIiiII", 40, w, -h if top_down else h, 1, 8, 0,
            len(body), 2835, 2835, 256, 0,
        )
        head = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        return head + info + pal + body
    if bpp not in (24, 32):
        raise ValueError("bpp must be 8, 24 or 32")
    nch = bpp // 8
    rowbytes = (w * nch + 3) & ~3
    rows = []
    for y in range(h):
        src = y if top_down else h - 1 - y
        row = bytearray()
        for x in range(w):
            r, g, b = int(px[src, x, 0]), int(px[src, x, 1]), int(px[src, x, 2])
            a = int(px[src, x, 3]) if px.shape[2] == 4 else 255
            row += bytes([b, g, r] + ([a] if nch == 4 else []))
        rows.append(bytes(row).ljust(rowbytes, b"\x00"))
    body = b"".join(rows)
    off = 14 + 40
    info = struct.pack(
        "<IiihhIIiiII", 40, w, -h if top_down else h, 1, bpp, 0,
        len(body), 2835, 2835, 0, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return head + info + body


def decode_bmp(data: bytes) -> tuple[np.ndarray, dict]:
    """BMP bytes -> ((h, w, 4) RGBA, meta)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP (BM magic missing)")
    _sig, _fsize, _r1, _r2, off = struct.unpack_from("<2sIHHI", data, 0)
    isize, w, h_raw = struct.unpack_from("<Iii", data, 14)
    if isize < 40:
        raise NotImplementedError(f"BMP header size {isize} (core headers)")
    planes, bpp, comp = struct.unpack_from("<hhI", data, 26)
    n_colors = struct.unpack_from("<I", data, 46)[0]
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        raise ValueError("implausible BMP dimensions")
    pal = None
    if bpp == 8:
        n = n_colors or 256
        pal_off = 14 + isize
        raw = data[pal_off : pal_off + 4 * n]
        if len(raw) < 4 * n:
            raise ValueError("BMP palette truncated")
        pal = np.frombuffer(raw, np.uint8).reshape(n, 4)  # BGRX
    nch = bpp // 8
    rowbytes = (w * nch + 3) & ~3
    need = rowbytes * h
    body = data[off : off + need]
    if len(body) < need:
        raise ValueError("BMP pixel array truncated")
    arr = np.frombuffer(body, np.uint8).reshape(h, rowbytes)
    out = np.zeros((h, w, 4), np.uint8)
    out[:, :, 3] = 255
    for y in range(h):
        dst = y if top_down else h - 1 - y
        row = arr[y]
        if bpp == 8:
            idx = row[:w]
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("BMP palette index out of range")
            out[dst, :, 0] = pal[idx, 2]
            out[dst, :, 1] = pal[idx, 1]
            out[dst, :, 2] = pal[idx, 0]
        else:
            pxr = row[: w * nch].reshape(w, nch)
            out[dst, :, 0] = pxr[:, 2]
            out[dst, :, 1] = pxr[:, 1]
            out[dst, :, 2] = pxr[:, 0]
            if nch == 4:
                out[dst, :, 3] = pxr[:, 3]
    meta = {
        "width": w, "height": h, "bpp": bpp,
        "top_down": top_down, "palette": bpp == 8,
    }
    return out, meta


def encode_ico(members: list[dict]) -> bytes:
    """members: [{"rgba": (h,w,4) array, "form": "png"|"dib"}] -> ICO."""
    blobs = []
    for m in members:
        px = np.asarray(m["rgba"], np.uint8)
        h, w = px.shape[:2]
        if w > 256 or h > 256:
            raise ValueError("ICO members are at most 256x256")
        if m["form"] == "png":
            from pyiceberg_lakehouse_spark.operators.multimodal import (
                encode_png,
            )

            blobs.append((w, h, 32, encode_png(px)))
        else:  # header-less DIB, doubled height, AND mask from alpha
            nch = 4
            rowbytes = w * nch
            rows = []
            for y in range(h - 1, -1, -1):
                row = bytearray()
                for x in range(w):
                    r, g, b, a = (int(v) for v in px[y, x])
                    row += bytes([b, g, r, a])
                rows.append(bytes(row))
            xor = b"".join(rows)
            maskrow = (w + 31) // 32 * 4
            mrows = []
            for y in range(h - 1, -1, -1):
                bits = bytearray(maskrow)
                for x in range(w):
                    if px[y, x, 3] < 128:  # transparent -> mask bit set
                        bits[x >> 3] |= 0x80 >> (x & 7)
                mrows.append(bytes(bits))
            mask = b"".join(mrows)
            info = struct.pack(
                "<IiihhIIiiII", 40, w, h * 2, 1, 32, 0,
                len(xor) + len(mask), 0, 0, 0, 0,
            )
            blobs.append((w, h, 32, info + xor + mask))
    out = bytearray(struct.pack("<HHH", 0, 1, len(blobs)))
    off = 6 + 16 * len(blobs)
    for w, h, bpp, blob in blobs:
        out += struct.pack(
            "<BBBBHHII",
            w & 0xFF, h & 0xFF, 0, 0, 1, bpp, len(blob), off,
        )
        off += len(blob)
    for _w, _h, _bpp, blob in blobs:
        out += blob
    return bytes(out)


def decode_ico(data: bytes) -> list[dict]:
    """ICO -> [{width, height, form ('png'|'dib'), rgba}] per member."""
    if len(data) < 6:
        raise ValueError("ICO too short for its header")
    reserved, typ, count = struct.unpack_from("<HHH", data, 0)
    if reserved != 0 or typ != 1:
        raise ValueError("not an ICO (bad reserved/type fields)")
    if count == 0:
        raise ValueError("ICO with zero images")
    out = []
    for i in range(count):
        at = 6 + 16 * i
        if at + 16 > len(data):
            raise ValueError("ICO directory truncated")
        wb, hb, _colors, _r, _planes, _bpp, size, off = struct.unpack_from(
            "<BBBBHHII", data, at
        )
        blob = data[off : off + size]
        if len(blob) != size:
            raise ValueError("ICO member bytes out of bounds")
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            from pyiceberg_lakehouse_spark.operators.multimodal import decode_png

            arr = decode_png(blob)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            if arr.shape[2] == 3:
                alpha = np.full(arr.shape[:2] + (1,), 255, arr.dtype)
                arr = np.concatenate([arr, alpha], axis=2)
            out.append(
                {
                    "width": arr.shape[1], "height": arr.shape[0],
                    "form": "png", "rgba": arr.astype(np.uint8),
                }
            )
            continue
        # header-less DIB with doubled height
        isize, w, h2 = struct.unpack_from("<Iii", blob, 0)
        if isize != 40:
            raise NotImplementedError(f"ICO DIB header size {isize}")
        planes, bpp, comp = struct.unpack_from("<hhI", blob, 12)
        if comp != 0 or bpp != 32:
            raise NotImplementedError(
                f"ICO DIB bpp {bpp} / compression {comp} (32-bit BI_RGB only)"
            )
        h = h2 // 2
        if h2 != 2 * h or w <= 0 or h <= 0:
            raise ValueError("ICO DIB height is not doubled")
        xor_bytes = w * 4 * h
        arr = np.frombuffer(blob[40 : 40 + xor_bytes], np.uint8)
        if arr.size < xor_bytes:
            raise ValueError("ICO DIB pixel array truncated")
        arr = arr.reshape(h, w, 4)
        rgba = np.zeros((h, w, 4), np.uint8)
        for y in range(h):
            rgba[h - 1 - y, :, 0] = arr[y, :, 2]
            rgba[h - 1 - y, :, 1] = arr[y, :, 1]
            rgba[h - 1 - y, :, 2] = arr[y, :, 0]
            rgba[h - 1 - y, :, 3] = arr[y, :, 3]
        out.append({"width": w, "height": h, "form": "dib", "rgba": rgba})
    return out
