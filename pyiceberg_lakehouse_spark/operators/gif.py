"""GIF (GIF87a/89a) codec in pure numpy + stdlib — variable-width LZW.

The first DICTIONARY compression codec in the engine (PNG is zlib/
DEFLATE via stdlib; JPEG is transform coding): GIF's LZW variant is
implemented from the spec — 9..12-bit codes packed LSB-first, CLEAR and
END codes, dictionary growth with the code-width bump at 2^width, the
KwKwK corner case, and the 4095-entry cap with CLEAR-and-rebuild.

Scope (honest gates, same stance as the PNG/JPEG codecs):
- decode: any GIF87a/89a with a global and/or per-frame local color
  table, interlaced or sequential. Graphic Control Extensions attach
  disposal/delay/transparency to their frame; the NETSCAPE2.0 loop
  extension sets loop_count; other extensions (comment, plain text,
  foreign application) are skipped.
- composition (compose_frames): the full GIF89a animation model —
  draw with transparency punch-through, disposal 0/1 (leave),
  2 (restore to background, rendered as transparent per every modern
  renderer), 3 (restore previous). Gated honestly: frames with a
  LOCAL color table differing from the global one raise
  NotImplementedError (index-plane composition would silently blend
  across palettes).
- encode: single frame via encode_gif (global color table, optional
  interlace); animations via encode_gif_animation (per-frame
  geometry/GCE, shared global palette, NETSCAPE loop).

Reference parity: ashkangoleh/pyiceberg-lakehouse treats images as
opaque binary columns (main-daft.py:68); this engine decodes them. The
closed-form roundtrip oracle pattern follows the PNG codec
(operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> "np.ndarray":
    """GIF Appendix E row order: passes start at 0/4/2/1 stepping
    8/8/4/2."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


# ------------------------------------------------------------------ LZW ---


def lzw_encode(indices: "np.ndarray", min_code_size: int) -> bytes:
    """GIF-variant LZW: emit CLEAR first, grow the string table from
    2^min+2, bump the code width when the NEXT code would not fit, CLEAR
    and rebuild at 4095. Codes pack LSB-first."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("LZW minimum code size must be 2-8")
    clear = 1 << min_code_size
    end = clear + 1
    data = indices.astype(np.int64).ravel()
    if data.size and int(data.max()) >= clear:
        raise ValueError("pixel index exceeds the color-table size")

    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {}

    def reset_table() -> int:
        table.clear()
        return end + 1

    next_code = reset_table()
    emit(clear)
    prefix: tuple[int, ...] = ()
    for v in data:
        v = int(v)
        cand = prefix + (v,)
        if len(cand) == 1 or cand in table:
            prefix = cand
            continue
        emit(prefix[0] if len(prefix) == 1 else table[prefix])
        table[cand] = next_code
        next_code += 1
        # the ENCODER bumps width when the next assignable code needs it
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear)
            width = min_code_size + 1
            next_code = reset_table()
        prefix = (v,)
    if prefix:
        emit(prefix[0] if len(prefix) == 1 else table[prefix])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> "np.ndarray":
    """Inverse of lzw_encode, spec-general: handles the KwKwK case (a
    code one past the table end), CLEAR anywhere, and streams that end
    without an explicit END code (tolerated by every real decoder)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("LZW minimum code size must be 2-8")
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.int64)
    n_out = 0

    acc = 0
    nbits = 0
    pos = 0

    width = min_code_size + 1
    # table as first-symbol/back-pointer arrays: entry k is (prefix
    # entry, appended symbol); roots are k < clear
    prefix_of = np.full(4096, -1, dtype=np.int64)
    symbol_of = np.arange(4096, dtype=np.int64)
    symbol_of[clear:] = -1
    next_code = end + 1
    prev = -1

    def expand(code: int, at: int) -> int:
        """Write entry ``code``'s string at out[at:], return its length."""
        chain = []
        k = code
        while k >= clear:
            chain.append(int(symbol_of[k]))
            k = int(prefix_of[k])
        chain.append(k)
        n = len(chain)
        if at + n > n_pixels:
            raise ValueError("LZW stream decodes past the declared extent")
        out[at : at + n] = chain[::-1]
        return n

    while True:
        while nbits < width:
            if pos >= len(data):
                # no END code: accept iff the raster is complete
                if n_out != n_pixels:
                    raise ValueError("truncated LZW stream")
                return out
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            symbol_of[clear:] = -1
            next_code = end + 1
            prev = -1
            continue
        if code == end:
            if n_out != n_pixels:
                raise ValueError(
                    f"LZW END after {n_out} of {n_pixels} pixels"
                )
            return out
        if code > next_code or (code == next_code and prev < 0):
            raise ValueError("corrupt LZW stream (code beyond table)")
        if code < clear or symbol_of[code] >= 0:
            n = expand(code, n_out)
            first = int(out[n_out])
            n_out += n
        elif code == next_code:
            # KwKwK: the entry being defined — prev's string + its first
            n = expand(prev, n_out)
            first = int(out[n_out])
            if n_out + n + 1 > n_pixels:
                raise ValueError("LZW stream decodes past the declared extent")
            out[n_out + n] = first
            n_out += n + 1
        else:
            raise ValueError("corrupt LZW stream (undefined code)")
        if prev >= 0 and next_code <= 4095:
            prefix_of[next_code] = prev
            symbol_of[next_code] = first
            next_code += 1
            # GIF "early change": the decoder's table lags the encoder's
            # by one add (the encoder defines entry k right after
            # emitting code k; the decoder only after reading code k+1),
            # so the decoder bumps at next_code == 2^width while the
            # encoder bumps at 2^width + 1 — the classic off-by-one
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code


# ------------------------------------------------------------ container ---


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap payload into <=255-byte counted sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("truncated GIF sub-block sequence")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(buf):
            raise ValueError("truncated GIF sub-block")
        out += buf[pos : pos + n]
        pos += n


def encode_gif(
    indices: "np.ndarray",
    palette: "np.ndarray | None" = None,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a from an (h, w) palette-index array. ``palette``
    is (n, 3) uint8 RGB (default: identity grayscale sized to the next
    power of two >= max index + 1, min 4)."""
    arr = np.asarray(indices)
    if arr.ndim != 2:
        raise ValueError("indices must be (h, w)")
    h, w = arr.shape
    mx = int(arr.max(initial=0))
    if palette is None:
        n = 4
        while n < mx + 1:
            n *= 2
        palette = np.repeat(
            np.arange(n, dtype=np.uint8)[:, None], 3, axis=1
        )
    palette = np.asarray(palette, dtype=np.uint8)
    n = palette.shape[0]
    if n & (n - 1) or not 2 <= n <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    if mx >= n:
        raise ValueError("pixel index exceeds the palette")
    depth = max(n.bit_length() - 1, 1)  # 2^depth = n
    out = bytearray(b"GIF89a")
    packed = 0x80 | ((depth - 1) << 4) | (depth - 1)  # GCT flag + sizes
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += palette.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    rows = arr[_interlace_order(h)] if interlace else arr
    mcs = max(depth, 2)  # LZW minimum code size (spec: >= 2)
    out.append(mcs)
    out += _sub_blocks(lzw_encode(rows, mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """Decode a GIF87a/89a stream -> {width, height, loop_count,
    frames: [...]}.

    Each frame: {left, top, width, height, interlace, indices (h, w)
    int64, palette (n, 3) uint8 (local if present, else global),
    has_local_palette, disposal, delay_cs, transparent_index (None
    when the GCE transparency flag is clear)}. Frames decode RAW with
    their geometry; compose_frames applies the animation model.
    loop_count is the NETSCAPE2.0 iteration count (None if absent,
    0 = loop forever per the de-facto standard)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        gct = gct.reshape(n, 3).copy()
        pos += 3 * n
    frames = []
    loop_count = None
    pending_gce = None
    while True:
        if pos >= len(payload):
            raise ValueError("GIF stream ends without trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_sub_blocks(payload, pos)
            if label == 0xF9:  # Graphic Control Extension
                if len(data) != 4:
                    raise ValueError("GCE block must be 4 bytes")
                gpacked, delay_cs = data[0], struct.unpack("<H", data[1:3])[0]
                pending_gce = {
                    "disposal": (gpacked >> 2) & 0x07,
                    "delay_cs": delay_cs,
                    "transparent_index": data[3] if gpacked & 0x01 else None,
                }
            elif label == 0xFF and data[:11] == b"NETSCAPE2.0":
                # sub-block id 1 carries the 16-bit iteration count
                if len(data) >= 14 and data[11] == 0x01:
                    loop_count = struct.unpack("<H", data[12:14])[0]
            # comment / plain-text / foreign application: skipped
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated local color table")
            pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
            pal = pal.reshape(n, 3).copy()
            pos += 3 * n
        if pal is None:
            raise ValueError("frame has no color table (no GCT, no LCT)")
        if w == 0 or h == 0:
            raise ValueError("zero-extent GIF frame")
        if pos >= len(payload):
            raise ValueError("truncated image data")
        mcs = payload[pos]
        pos += 1
        data, pos = _read_sub_blocks(payload, pos)
        flat = lzw_decode(data, mcs, w * h)
        if int(flat.max(initial=0)) >= pal.shape[0]:
            raise ValueError("decoded index exceeds the color table")
        px = flat.reshape(h, w)
        interlaced = bool(ipacked & 0x40)
        if interlaced:
            rows = _interlace_order(h)
            de = np.empty_like(px)
            de[rows] = px
            px = de
        gce = pending_gce or {
            "disposal": 0, "delay_cs": 0, "transparent_index": None
        }
        pending_gce = None  # a GCE governs exactly one rendering block
        frames.append(
            {
                "left": left,
                "top": top,
                "width": w,
                "height": h,
                "interlace": interlaced,
                "indices": px,
                "palette": pal,
                "has_local_palette": bool(ipacked & 0x80),
                **gce,
            }
        )
    if not frames:
        raise ValueError("GIF has no image frames")
    return {
        "width": sw, "height": sh, "loop_count": loop_count, "frames": frames
    }


# ------------------------------------------------------------ animation ---


def encode_gif_animation(
    frames: list[dict],
    screen: tuple[int, int] | None = None,
    palette: "np.ndarray | None" = None,
    loop_count: int | None = None,
) -> bytes:
    """Multi-frame GIF89a with one shared GLOBAL color table.

    Each frame dict: ``indices`` (h, w), optional ``left``/``top``
    (default 0), ``disposal`` (0-3, default 0), ``delay_cs`` (default
    0), ``transparent_index`` (default None), ``interlace`` (default
    False). ``screen`` is the logical canvas (w, h); defaults to the
    tightest box covering every frame. ``loop_count`` emits the
    NETSCAPE2.0 application extension (0 = forever)."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    norm = []
    mx = 0
    for f in frames:
        arr = np.asarray(f["indices"])
        if arr.ndim != 2:
            raise ValueError("indices must be (h, w)")
        g = {
            "indices": arr,
            "left": int(f.get("left", 0)),
            "top": int(f.get("top", 0)),
            "disposal": int(f.get("disposal", 0)),
            "delay_cs": int(f.get("delay_cs", 0)),
            "transparent_index": f.get("transparent_index"),
            "interlace": bool(f.get("interlace", False)),
        }
        if not 0 <= g["disposal"] <= 3:
            raise ValueError("disposal method must be 0-3")
        mx = max(mx, int(arr.max(initial=0)))
        if g["transparent_index"] is not None:
            mx = max(mx, int(g["transparent_index"]))
        norm.append(g)
    if palette is None:
        n = 4
        while n < mx + 1:
            n *= 2
        palette = np.repeat(np.arange(n, dtype=np.uint8)[:, None], 3, axis=1)
    palette = np.asarray(palette, dtype=np.uint8)
    n = palette.shape[0]
    if n & (n - 1) or not 2 <= n <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    if mx >= n:
        raise ValueError("pixel index exceeds the palette")
    if screen is None:
        screen = (
            max(g["left"] + g["indices"].shape[1] for g in norm),
            max(g["top"] + g["indices"].shape[0] for g in norm),
        )
    sw, sh = screen
    for g in norm:
        h, w = g["indices"].shape
        if g["left"] + w > sw or g["top"] + h > sh:
            raise ValueError("frame extends past the logical screen")

    depth = max(n.bit_length() - 1, 1)
    out = bytearray(b"GIF89a")
    packed = 0x80 | ((depth - 1) << 4) | (depth - 1)
    out += struct.pack("<HHBBB", sw, sh, packed, 0, 0)
    out += palette.tobytes()
    if loop_count is not None:
        if not 0 <= int(loop_count) <= 0xFFFF:
            raise ValueError("loop count must fit in 16 bits")
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", int(loop_count))
        out.append(0)
    mcs = max(depth, 2)
    for g in norm:
        t = g["transparent_index"]
        gpacked = (g["disposal"] << 2) | (0x01 if t is not None else 0)
        out += b"\x21\xf9\x04" + bytes([gpacked])
        out += struct.pack("<H", g["delay_cs"])
        out += bytes([t if t is not None else 0, 0])
        h, w = g["indices"].shape
        out += b"\x2c" + struct.pack(
            "<HHHHB",
            g["left"], g["top"], w, h, 0x40 if g["interlace"] else 0,
        )
        rows = (
            g["indices"][_interlace_order(h)]
            if g["interlace"]
            else g["indices"]
        )
        out.append(mcs)
        out += _sub_blocks(lzw_encode(rows, mcs))
    out += b"\x3b"
    return bytes(out)


def compose_frames(decoded: dict) -> list[dict]:
    """Apply the GIF89a animation model to ``decode_gif`` output.

    Returns one dict per frame: {frame_idx, delay_cs, canvas} where
    ``canvas`` is the full logical screen as (sh, sw) int64 palette
    indices with -1 for transparent (never-painted or
    restored-to-background) pixels — the canvas AS RENDERED for that
    frame, i.e. after the frame draws and before its disposal runs.

    Model (GIF89a §23 + universal renderer practice):
    - the canvas starts fully transparent;
    - a frame draws its rect, skipping pixels equal to its GCE
      transparent index (punch-through to whatever is below);
    - disposal 0/1: leave; 2: clear the frame RECT to transparent
      (modern renderers treat "background" as transparent, ignoring
      the header background-color index); 3: restore the canvas to
      its pre-draw state.

    Honest gate: composition happens on the index plane, so every
    frame must use the GLOBAL color table — a frame with a local
    color table raises NotImplementedError rather than blending
    indices across palettes."""
    sw, sh = decoded["width"], decoded["height"]
    if sw == 0 or sh == 0:
        raise ValueError("zero-extent logical screen")
    canvas = np.full((sh, sw), -1, dtype=np.int64)
    out = []
    for i, f in enumerate(decoded["frames"]):
        if f.get("has_local_palette"):
            raise NotImplementedError(
                "composition over local color tables is not supported "
                "(index planes from different palettes cannot blend)"
            )
        left, top, w, h = f["left"], f["top"], f["width"], f["height"]
        if left + w > sw or top + h > sh:
            raise ValueError("frame extends past the logical screen")
        saved = canvas.copy() if f["disposal"] == 3 else None
        region = canvas[top : top + h, left : left + w]
        t = f["transparent_index"]
        mask = (
            np.ones((h, w), dtype=bool)
            if t is None
            else f["indices"] != t
        )
        region[mask] = f["indices"][mask]
        out.append(
            {
                "frame_idx": i,
                "delay_cs": f["delay_cs"],
                "canvas": canvas.copy(),
            }
        )
        if f["disposal"] == 2:
            canvas[top : top + h, left : left + w] = -1
        elif f["disposal"] == 3:
            canvas = saved
    return out
