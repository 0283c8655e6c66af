"""Baseline TIFF 6.0 codec in pure numpy + stdlib — the scanned-document
format OCR/document corpora arrive in.

Implements the baseline spec: both byte orders (II little-endian and
MM big-endian — a TIFF parser that assumes one silently misreads every
tag of the other), the IFD tag walk with inline-vs-offset value
resolution (values <= 4 bytes live INSIDE the tag's value field),
strip-based layout (RowsPerStrip / StripOffsets / StripByteCounts),
grayscale (PhotometricInterpretation 1) and RGB (2) at 8 bits per
sample, and Compression 1 (none) + 32773 (PackBits RLE, with the
-128 noop control byte).

Compression 5 (LZW, §14) is implemented with the quirks every real
reader/writer shares (they follow Aldus' implementation, not the spec's
pseudo-code): MSB-first code packing (the GIF codec's exact opposite),
9..12-bit codes with the "early change" width bump one code before the
power of two, CLEAR at table slot 4094, and the decoder running one
table entry behind the encoder. Predictor 2 (tag 317, horizontal
differencing) composes with it, as in virtually every LZW scan.

Compression 8 / 32946 (Adobe + old-tag Deflate) decodes via stdlib
zlib with strict strip extents.

Tiled layout (§15, tags 322..325 — the GeoTIFF/scanned-atlas shape)
decodes and encodes: a tw x tl grid (multiples of 16), edge tiles
padded to full size and clipped on read, each tile compressed
independently, Predictor 2 restarting per tile row.

Bilevel data (BitsPerSample 1 — the fax/scanned-page depth) encodes
and decodes: rows bit-packed MSB-first padded to a byte per row, both
photometrics (0 WhiteIsZero stores inverted bits, 1 BlackIsZero),
strip and tile layouts, all four compressions; logical values
normalize to black-is-zero 0/255.

Honest gates (raise, never guess): other compressions (CCITT,
JPEG-in-TIFF), planar configuration 2, bit
depths other than 1 and 8, palette color, multi-IFD (multi-page)
files return the FIRST page and expose next_ifd so callers see there
are more.

Reference parity: ashkangoleh/pyiceberg-lakehouse ingests scans as
opaque binary (main-daft.py:68); this engine decodes them.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits: runs of >= 3 become repeat packets (control
    1-n in [-127, -1]), everything else literal packets of <= 128."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # measure the run at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)  # two's complement of 1 - run
            out.append(data[i])
            i = j + 1
            continue
        # literal: scan until a >= 3 run starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if (
                k + 2 < n
                and data[k] == data[k + 1] == data[k + 2]
            ):
                break
            k += 1
        out.append(k - i - 1)
        out += data[i:k]
        i = k
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Strict: the output must be exactly ``expected`` bytes."""
    out = bytearray()
    i = 0
    while i < len(data):
        c = data[i]
        i += 1
        if c == 128:  # noop
            continue
        if c < 128:  # literal of c+1 bytes
            if i + c + 1 > len(data):
                raise ValueError("PackBits literal overruns its strip")
            out += data[i : i + c + 1]
            i += c + 1
        else:  # repeat next byte 257-c times
            if i >= len(data):
                raise ValueError("PackBits run without a byte to repeat")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        if len(out) > expected:
            raise ValueError("PackBits decodes past the strip extent")
    if len(out) != expected:
        raise ValueError(
            f"PackBits strip decoded {len(out)} of {expected} bytes"
        )
    return bytes(out)


_LZW_CLEAR = 256
_LZW_EOI = 257
_LZW_FIRST = 258


def lzw_encode(data: bytes) -> bytes:
    """TIFF §14 LZW, Aldus-compatible (what libtiff writes): codes pack
    MSB-first, width starts at 9, the width bump is ONE CODE EARLY
    relative to textbook LZW (encoder bumps when free_ent exceeds
    2^width - 1 right after adding an entry — the decoder, one entry
    behind, bumps at 2^width - 1 itself, landing on the same code
    index), the table clears at slot 4094, and the final prefix code
    phantom-increments free_ent so EOI is written at the width the
    decoder will read it with."""
    out = bytearray()
    acc = 0
    acc_bits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << width) | code
        acc_bits += width
        while acc_bits >= 8:
            out.append((acc >> (acc_bits - 8)) & 0xFF)
            acc_bits -= 8

    emit(_LZW_CLEAR)
    table: dict[tuple[int, int], int] = {}
    free = _LZW_FIRST
    prefix = -1
    for b in data:
        if prefix < 0:
            prefix = b
            continue
        nxt = table.get((prefix, b))
        if nxt is not None:
            prefix = nxt
            continue
        emit(prefix)
        table[(prefix, b)] = free
        free += 1
        prefix = b
        if free == 4094:  # libtiff: CLEAR at CODE_MAX - 1
            emit(_LZW_CLEAR)
            table.clear()
            free = _LZW_FIRST
            width = 9
        elif free > (1 << width) - 1:
            width += 1
    if prefix >= 0:
        emit(prefix)
        # the decoder adds one more entry after this code, before EOI
        free += 1
        if free > (1 << width) - 1 and width < 12:
            width += 1
    emit(_LZW_EOI)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    """Strict TIFF LZW decode: the output must be exactly ``expected``
    bytes; unknown codes, missing EOI, or overruns raise. Handles the
    KwKwK corner (code one past the table end), CLEAR anywhere, and the
    early-change width bump (see lzw_encode)."""
    out = bytearray()
    acc = 0
    acc_bits = 0
    pos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None
    while True:
        while acc_bits < width:
            if pos >= len(data):
                raise ValueError("LZW strip ends without an EOI code")
            acc = (acc << 8) | data[pos]
            pos += 1
            acc_bits += 8
        code = (acc >> (acc_bits - width)) & ((1 << width) - 1)
        acc_bits -= width
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            width = 9
            table.clear()
            prev = None
            continue
        if prev is None:  # first code after CLEAR must be a literal
            if code > 255:
                raise ValueError("LZW stream starts with a non-literal")
            prev = bytes([code])
            out += prev
            continue
        if code < 256:
            s = bytes([code])
        elif _LZW_FIRST <= code < _LZW_FIRST + len(table):
            s = table[code - _LZW_FIRST]
        elif code == _LZW_FIRST + len(table):  # KwKwK
            s = prev + prev[:1]
        else:
            raise ValueError(f"LZW code {code} beyond the string table")
        out += s
        table.append(prev + s[:1])
        if _LZW_FIRST + len(table) >= (1 << width) - 1 and width < 12:
            width += 1
        prev = s
        if len(out) > expected:
            raise ValueError("LZW decodes past the strip extent")
    if len(out) != expected:
        raise ValueError(f"LZW strip decoded {len(out)} of {expected} bytes")
    return bytes(out)


def _predict2_encode(px: "np.ndarray") -> "np.ndarray":
    """Predictor 2 (horizontal differencing), per row per channel,
    modulo-256: what LZW compresses in virtually every real scan."""
    d = px.astype(np.int16)
    d[:, 1:, :] -= d[:, :-1, :].copy()
    return (d % 256).astype(np.uint8)


def _predict2_decode(px: "np.ndarray") -> "np.ndarray":
    return (px.astype(np.int64).cumsum(axis=1) % 256).astype(np.uint8)


def encode_tiff(
    pixels,
    big_endian: bool = False,
    compression: int = 1,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    bits: int = 8,
    photometric: int | None = None,
    t4_two_d: bool = False,
) -> bytes:
    """(h, w) or (h, w, 1|3) uint8 -> baseline TIFF bytes.

    ``tile=(tw, tl)`` writes the TILED layout (tags 322..325, §15):
    the image splits into a grid of tw x tl tiles (both multiples of
    16 per spec), edge tiles zero-padded to full size, each tile
    compressed independently with the predictor restarting per tile
    row — the GeoTIFF/scanned-atlas shape.

    ``bits=1`` writes BILEVEL data (the fax/scan depth): input pixels
    are in black-is-zero space (0/255; >127 counts as set), rows pack
    MSB-first padded to a byte boundary per row, and
    ``photometric=0`` (WhiteIsZero, the fax default) stores the
    INVERTED bits so logical values roundtrip."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in (1, 3):
        raise ValueError("1 (gray) or 3 (RGB) samples per pixel")
    if compression not in (1, 2, 3, 4, 5, 8, 32773):
        raise ValueError(
            "compression must be 1 (none), 2/3 (CCITT G3), 4 (CCITT G4),"
            " 5 (LZW), 8 (Deflate) or 32773 (PackBits)"
        )
    if compression in (2, 3, 4) and bits != 1:
        raise ValueError("CCITT compressions apply to bilevel data only")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    if bits not in (1, 8):
        raise ValueError("bits must be 1 (bilevel) or 8")
    if bits == 1:
        if ch != 1:
            raise ValueError("bilevel TIFF is single-sample")
        if predictor == 2:
            raise ValueError("predictor 2 requires 8-bit samples")
        if photometric not in (None, 0, 1):
            raise ValueError("bilevel photometric must be 0 or 1")
    elif photometric is not None:
        raise ValueError("explicit photometric is for bilevel writes")

    def pack(raw: bytes, dims: tuple[int, int]) -> bytes:
        if compression in (2, 3, 4):
            from pyiceberg_lakehouse_spark.operators import ccitt as _ccitt

            if compression == 4:
                return _ccitt.g4_encode(raw, dims[0], dims[1])
            if t4_two_d:
                return _ccitt.g3_2d_encode(raw, dims[0], dims[1], k=2)
            return _ccitt.g3_1d_encode(
                raw, dims[0], dims[1],
                byte_align=compression == 2,
                with_eol=compression == 3,
            )
        if compression == 32773:
            return packbits_encode(raw)
        if compression == 5:
            return lzw_encode(raw)
        if compression == 8:
            return zlib.compress(raw, 6)
        return raw

    if bits == 1 and photometric == 0:
        px = 255 - px  # WhiteIsZero stores inverted bits

    def rows_bytes(block: "np.ndarray") -> bytes:
        """Serialize rows: 8-bit raw, 1-bit packed MSB-first per row."""
        if bits == 8:
            return block.tobytes()
        return np.packbits(block[:, :, 0] > 127, axis=1).tobytes()

    e = ">" if big_endian else "<"
    if tile is not None:
        tw, tl = tile
        if tw % 16 or tl % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        ta = (w + tw - 1) // tw
        td = (h + tl - 1) // tl
        padded = np.zeros((td * tl, ta * tw, ch), dtype=np.uint8)
        padded[:h, :w] = px
        strips = []
        for r in range(td):
            for c in range(ta):
                block = padded[r * tl : (r + 1) * tl, c * tw : (c + 1) * tw]
                if predictor == 2:
                    block = _predict2_encode(block.copy())
                strips.append(pack(rows_bytes(block), (tw, tl)))
        n_strips = len(strips)
    else:
        if predictor == 2:
            px = _predict2_encode(px)
        if rows_per_strip is None:
            rows_per_strip = h
        n_strips = (h + rows_per_strip - 1) // rows_per_strip
        strips = []
        for s in range(n_strips):
            block = px[s * rows_per_strip : (s + 1) * rows_per_strip]
            strips.append(pack(rows_bytes(block), (w, block.shape[0])))

    def tag(tid: int, ttype: int, values: list[int], data_off: int) -> tuple[bytes, bytes]:
        size = _TYPE_SIZES[ttype] * len(values)
        fmt = {3: "H", 4: "I"}[ttype]
        packed = struct.pack(f"{e}{len(values)}{fmt}", *values)
        if size <= 4:
            return (
                struct.pack(f"{e}HHI", tid, ttype, len(values))
                + packed.ljust(4, b"\x00"),
                b"",
            )
        return (
            struct.pack(f"{e}HHII", tid, ttype, len(values), data_off),
            packed,
        )

    # layout: header(8) + strips + [IFD] + overflow values
    header = struct.pack(f"{e}2sHI", b"MM" if big_endian else b"II", 42, 0)
    strip_offsets = []
    pos = 8
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    ifd_off = pos
    entries = [
        (_TAG_WIDTH, 4, [w]),
        (_TAG_HEIGHT, 4, [h]),
        (_TAG_BITS, 3, [bits] * ch),
        (_TAG_COMPRESSION, 3, [compression]),
        (
            _TAG_PHOTOMETRIC,
            3,
            [
                photometric
                if photometric is not None
                else (1 if ch == 1 else 2)
            ],
        ),
        (_TAG_SPP, 3, [ch]),
        (_TAG_PLANAR, 3, [1]),
    ]
    if tile is None:
        entries.insert(5, (_TAG_STRIP_OFFSETS, 4, strip_offsets))
        entries.insert(7, (_TAG_ROWS_PER_STRIP, 4, [rows_per_strip]))
        entries.insert(
            8, (_TAG_STRIP_COUNTS, 4, [len(s) for s in strips])
        )
    if compression == 3:  # T4Options (292) sorts between 284 and 317
        entries.append((292, 4, [1 if t4_two_d else 0]))
    if predictor == 2:  # tags must stay in ascending order (284 < 317)
        entries.append((_TAG_PREDICTOR, 3, [2]))
    if tile is not None:  # 322..325 sort after 317
        entries.append((_TAG_TILE_WIDTH, 3, [tile[0]]))
        entries.append((_TAG_TILE_LENGTH, 3, [tile[1]]))
        entries.append((_TAG_TILE_OFFSETS, 4, strip_offsets))
        entries.append((_TAG_TILE_COUNTS, 4, [len(s) for s in strips]))
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    ifd = struct.pack(f"{e}H", len(entries))
    overflow = b""
    for tid, ttype, values in entries:
        entry, extra = tag(tid, ttype, values, overflow_off + len(overflow))
        ifd += entry
        overflow += extra
    ifd += struct.pack(f"{e}I", 0)  # no next IFD
    out = bytearray(header)
    struct.pack_into(f"{e}I", out, 4, ifd_off)
    for s in strips:
        out += s
    out += ifd + overflow
    return bytes(out)


def decode_tiff(payload: bytes):
    """TIFF -> ((h, w, ch) uint8 array, meta dict). meta: {width,
    height, channels, compression, big_endian, n_strips, next_ifd}."""
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    if payload[:2] == b"II":
        e = "<"
    elif payload[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(f"{e}HI", payload, 2)
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    if ifd_off + 2 > len(payload):
        raise ValueError("IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(f"{e}H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(payload):
        raise ValueError("IFD exceeds the file")
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        at = ifd_off + 2 + 12 * k
        tid, ttype, count = struct.unpack_from(f"{e}HHI", payload, at)
        if ttype not in _TYPE_SIZES:
            continue  # private/unknown type: skip per spec
        size = _TYPE_SIZES[ttype] * count
        if size <= 4:
            src = at + 8
        else:
            (src,) = struct.unpack_from(f"{e}I", payload, at + 8)
            if src + size > len(payload):
                raise ValueError(f"tag {tid} values out of bounds")
        if ttype == 3:
            tags[tid] = list(
                struct.unpack_from(f"{e}{count}H", payload, src)
            )
        elif ttype == 4:
            tags[tid] = list(
                struct.unpack_from(f"{e}{count}I", payload, src)
            )
        # other types (rational, ascii...) are metadata we don't need
    (next_ifd,) = struct.unpack_from(
        f"{e}I", payload, ifd_off + 2 + 12 * n_entries
    )

    def one(tid: int, default: int | None = None) -> int:
        v = tags.get(tid)
        if v is None:
            if default is None:
                raise ValueError(f"required TIFF tag {tid} missing")
            return default
        return v[0]

    w, h = one(_TAG_WIDTH), one(_TAG_HEIGHT)
    ch = one(_TAG_SPP, 1)
    compression = one(_TAG_COMPRESSION, 1)
    photometric = one(_TAG_PHOTOMETRIC)
    bits_list = tags.get(_TAG_BITS, [8])
    bits = bits_list[0]
    if any(b != bits for b in bits_list) or bits not in (1, 8):
        raise NotImplementedError(
            f"BitsPerSample {bits_list}: 1 (bilevel) or uniform 8 supported"
        )
    if bits == 1 and ch != 1:
        raise NotImplementedError("multi-sample bilevel TIFF not supported")
    if compression not in (1, 2, 3, 4, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {compression}: none/CCITT G3/G4/LZW/"
            "Deflate/PackBits supported"
        )
    if compression in (2, 3, 4) and bits != 1:
        raise ValueError("CCITT compressions apply to bilevel data only")
    t4_two_d = bool(compression == 3 and one(292, 0) & 1)
    predictor = one(_TAG_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if predictor == 2 and bits == 1:
        raise ValueError("predictor 2 on bilevel data is invalid")
    if one(_TAG_PLANAR, 1) != 1:
        raise NotImplementedError("planar configuration 2 not supported")
    if photometric not in (0, 1, 2):
        raise NotImplementedError(
            f"photometric {photometric}: gray/RGB supported"
        )
    if photometric == 2 and ch != 3:
        raise ValueError("RGB photometric with SamplesPerPixel != 3")
    def unpack(raw: bytes, expected: int, g4_dims: tuple[int, int] | None = None) -> bytes:
        if compression in (2, 3, 4):
            from pyiceberg_lakehouse_spark.operators import ccitt as _ccitt

            gw, gh = g4_dims
            if compression == 4:
                out = _ccitt.g4_decode(raw, gw, gh)
            elif t4_two_d:
                out = _ccitt.g3_2d_decode(raw, gw, gh)
            else:
                out = _ccitt.g3_1d_decode(
                    raw, gw, gh,
                    byte_align=compression == 2,
                    with_eol=compression == 3,
                )
            if len(out) != expected:
                raise ValueError(
                    f"CCITT segment decoded {len(out)} of {expected} bytes"
                )
            return out
        if compression == 32773:
            return packbits_decode(raw, expected)
        if compression == 5:
            return lzw_decode(raw, expected)
        if compression in (8, 32946):  # Adobe deflate + the old tag
            try:
                d = zlib.decompressobj()
                out = d.decompress(raw, expected)
                if len(out) != expected or d.decompress(b"", 1):
                    raise ValueError(
                        f"Deflate segment decoded {len(out)} of {expected}"
                        " bytes"
                    )
                return out
            except zlib.error as exc:
                raise ValueError(f"corrupt Deflate segment: {exc}") from exc
        if len(raw) != expected:
            raise ValueError("uncompressed segment size mismatch")
        return raw

    tiled = _TAG_TILE_WIDTH in tags or _TAG_TILE_LENGTH in tags
    if tiled:
        tw = one(_TAG_TILE_WIDTH)
        tl = one(_TAG_TILE_LENGTH)
        if tw % 16 or tl % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        offsets = tags.get(_TAG_TILE_OFFSETS)
        counts = tags.get(_TAG_TILE_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("tile offsets/counts missing or inconsistent")
        ta = (w + tw - 1) // tw
        td = (h + tl - 1) // tl
        if ta * td != len(offsets):
            raise ValueError("tile count disagrees with the tile grid")
        px = np.zeros((h, w, ch), dtype=np.uint8)
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(payload):
                raise ValueError("tile bytes out of file bounds")
            if bits == 1:
                raw = unpack(
                    payload[off : off + cnt], tl * (tw // 8), (tw, tl)
                )
                packed = np.frombuffer(raw, dtype=np.uint8)
                block = (
                    np.unpackbits(packed.reshape(tl, tw // 8), axis=1)
                    .astype(np.uint8)[:, :, None]
                    * 255
                )
            else:
                raw = unpack(payload[off : off + cnt], tl * tw * ch)
                block = np.frombuffer(raw, dtype=np.uint8).reshape(
                    tl, tw, ch
                )
            if predictor == 2:  # predictor restarts per tile row
                block = _predict2_decode(block)
            r, c = divmod(i, ta)
            rows = min(tl, h - r * tl)
            colw = min(tw, w - c * tw)
            px[r * tl : r * tl + rows, c * tw : c * tw + colw] = block[
                :rows, :colw
            ]
        n_strips = 0
        n_tiles = len(offsets)
    else:
        offsets = tags.get(_TAG_STRIP_OFFSETS)
        counts = tags.get(_TAG_STRIP_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("strip offsets/counts missing or inconsistent")
        rps = one(_TAG_ROWS_PER_STRIP, h)
        if rps == 0:
            raise ValueError("RowsPerStrip of zero")
        if (h + rps - 1) // rps != len(offsets):
            raise ValueError("strip count disagrees with RowsPerStrip")
        rowbytes = (w + 7) // 8 if bits == 1 else w * ch
        out = bytearray()
        for s, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(payload):
                raise ValueError("strip bytes out of file bounds")
            rows = min(rps, h - s * rps)
            out += unpack(
                payload[off : off + cnt], rows * rowbytes, (w, rows)
            )
        if bits == 1:
            packed = np.frombuffer(bytes(out), dtype=np.uint8)
            px = (
                np.unpackbits(packed.reshape(h, rowbytes), axis=1)[:, :w]
                .astype(np.uint8)[:, :, None]
                * 255
            )
        else:
            px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, ch)
        if predictor == 2:  # undo horizontal differencing, per row
            px = _predict2_decode(px)
        n_strips = len(offsets)
        n_tiles = 0
    if photometric == 0:  # white-is-zero: invert to black-is-zero
        px = 255 - px
    meta = {
        "width": w, "height": h, "channels": ch,
        "compression": compression, "big_endian": e == ">",
        "predictor": predictor, "bits": bits,
        "photometric": photometric,
        "n_strips": n_strips, "n_tiles": n_tiles,
        "tiled": tiled, "next_ifd": next_ifd,
    }
    return px, meta


def parse_ifd(payload: bytes, ifd_off: int, e: str) -> tuple[dict, int]:
    """General IFD walk (shared with the EXIF reader): -> ({tag: value},
    next_ifd_offset). SHORT/LONG -> list[int], ASCII -> str (NUL
    stripped), RATIONAL -> list[(num, den)]; other types are skipped.
    All offsets are relative to ``payload``'s start (the TIFF header),
    which is exactly the EXIF APP1 contract."""
    if ifd_off + 2 > len(payload):
        raise ValueError("IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(f"{e}H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(payload):
        raise ValueError("IFD exceeds the file")
    tags: dict[int, object] = {}
    for k in range(n_entries):
        at = ifd_off + 2 + 12 * k
        tid, ttype, count = struct.unpack_from(f"{e}HHI", payload, at)
        if ttype not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[ttype] * count
        if size <= 4:
            src = at + 8
        else:
            (src,) = struct.unpack_from(f"{e}I", payload, at + 8)
            if src + size > len(payload):
                raise ValueError(f"tag {tid} values out of bounds")
        if ttype == 2:
            tags[tid] = (
                payload[src : src + count].split(b"\x00", 1)[0].decode(
                    "latin-1"
                )
            )
        elif ttype == 3:
            tags[tid] = list(struct.unpack_from(f"{e}{count}H", payload, src))
        elif ttype == 4:
            tags[tid] = list(struct.unpack_from(f"{e}{count}I", payload, src))
        elif ttype == 5:
            vals = struct.unpack_from(f"{e}{2 * count}I", payload, src)
            tags[tid] = [
                (vals[2 * i], vals[2 * i + 1]) for i in range(count)
            ]
    (next_ifd,) = struct.unpack_from(
        f"{e}I", payload, ifd_off + 2 + 12 * n_entries
    )
    return tags, next_ifd


def build_ifds(ifds: list[list[tuple[int, int, object]]], e: str) -> bytes:
    """Emit a TIFF stream of chained value-only IFDs (no strips) — the
    EXIF APP1 shape. ``ifds[i]`` is a list of (tag, type, value) with
    value str for ASCII, list[int] for SHORT/LONG, list[(num, den)] for
    RATIONAL, and ('ifd', i) for a pointer to another IFD in the list.
    IFD 0 is the root; returns header + IFDs + overflow values."""
    # first pass: measure each IFD (entries are fixed 12 bytes)
    sizes = [2 + 12 * len(entries) + 4 for entries in ifds]
    ifd_offsets = []
    pos = 8
    for s in sizes:
        ifd_offsets.append(pos)
        pos += s
    overflow_base = pos

    def pack_value(ttype: int, value) -> bytes:
        if ttype == 2:
            return value.encode("latin-1") + b"\x00"
        if ttype == 3:
            return struct.pack(f"{e}{len(value)}H", *value)
        if ttype == 4:
            return struct.pack(f"{e}{len(value)}I", *value)
        if ttype == 5:
            flat = [x for pair in value for x in pair]
            return struct.pack(f"{e}{len(flat)}I", *flat)
        raise ValueError(f"unsupported IFD type {ttype}")

    overflow = bytearray()
    chunks = []
    for entries in ifds:
        body = struct.pack(f"{e}H", len(entries))
        for tid, ttype, value in sorted(entries):
            if isinstance(value, tuple) and value[0] == "ifd":
                body += struct.pack(
                    f"{e}HHII", tid, 4, 1, ifd_offsets[value[1]]
                )
                continue
            packed = pack_value(ttype, value)
            count = (
                len(value)
                if ttype != 2
                else len(packed)
            )
            if len(packed) <= 4:
                body += struct.pack(f"{e}HHI", tid, ttype, count)
                body += packed.ljust(4, b"\x00")
            else:
                body += struct.pack(
                    f"{e}HHII", tid, ttype, count,
                    overflow_base + len(overflow),
                )
                overflow += packed
        body += struct.pack(f"{e}I", 0)
        chunks.append(body)
    header = struct.pack(
        f"{e}2sHI", b"MM" if e == ">" else b"II", 42, ifd_offsets[0]
    )
    return header + b"".join(chunks) + bytes(overflow)
