"""CCITT Group 4 (ITU-T T.6 / MMR) bilevel codec — decoder + encoder.

The compression of scanned-document corpora: TIFF Compression 4 and the
PDF CCITTFaxDecode filter's K<0 mode. Pure 2-D coding: every row is
coded against the row above via pass / horizontal / vertical modes, with
horizontal runs carried by the T.4 modified-Huffman white/black
run-length alphabets (terminating codes 0-63, makeup codes 64-1728 per
color, and the shared extended makeups 1792-2560).

The code tables below are the published ITU-T T.4 §10 / T.6 §4 constants.
Their internal consistency (prefix-freeness, full coverage of every run
length 0-63 + makeups) is asserted at import; correctness of the coding
loop is pinned by encoder<->decoder property tests over random rasters
(tests/test_ccitt.py) and by the planted TIFF fixtures cycling
Compression 4 through the driver-checked ``multimodal_tiff_bilevel`` row.

Reference parity: ashkangoleh/pyiceberg-lakehouse has no raster layer
(tabular parquet only - main-daft.py:121-138); this serves the
multimodal/document-extraction surface of the task brief.
"""

from __future__ import annotations

# T.4 white run-length codes: run -> bitstring
WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

# T.4 black run-length codes
BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup codes 1792-2560, shared by both colors (T.4 table 3)
EXT_CODES = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 §4.2.1 two-dimensional mode codes
MODE_CODES = {
    "P": "0001", "H": "001", "V0": "1",
    "VR1": "011", "VR2": "000011", "VR3": "0000011",
    "VL1": "010", "VL2": "000010", "VL3": "0000010",
}
EOFB = "000000000001000000000001"


def _build_trie(codes: dict) -> dict:
    root: dict = {}
    for value, bits in codes.items():
        node = root
        for b in bits[:-1]:
            nxt = node.get(b)
            if nxt is None:
                nxt = node[b] = {}
            elif not isinstance(nxt, dict):
                raise AssertionError(f"code table prefix conflict at {value}")
            node = nxt
        last = bits[-1]
        if last in node:
            raise AssertionError(f"code table prefix conflict at {value}")
        node[last] = value
    return root


def _check(codes: dict, n_makeup_max: int) -> dict:
    assert all(r in codes for r in range(64)), "terminating codes incomplete"
    assert all(
        r in codes for r in range(64, n_makeup_max + 1, 64)
    ), "makeup codes incomplete"
    return _build_trie({**codes, **{k + 10000: v for k, v in EXT_CODES.items()}})


_WHITE_TRIE = _check(WHITE_CODES, 1728)
_BLACK_TRIE = _check(BLACK_CODES, 1728)
_MODE_TRIE = _build_trie(MODE_CODES)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("CCITT G4 stream exhausted mid-code")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_code(self, trie: dict):
        node = trie
        while True:
            node = node.get(str(self.read_bit()))
            if node is None:
                raise ValueError("invalid CCITT G4 code word")
            if not isinstance(node, dict):
                return node


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[str] = []

    def write(self, s: str) -> None:
        self.bits.append(s)

    def getvalue(self) -> bytes:
        s = "".join(self.bits)
        pad = (-len(s)) % 8
        s += "0" * pad
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _read_run(br: _BitReader, trie: dict) -> int:
    """One run length: zero or more makeup codes then a terminating."""
    total = 0
    while True:
        v = br.read_code(trie)
        if v >= 10000:  # shared extended makeup (stored offset by 10000)
            total += v - 10000
            continue
        total += v
        if v < 64:  # terminating code ends the run
            return total


def _decode_2d_row(br: _BitReader, ref: list[int], width: int) -> list[int]:
    """One pass/horizontal/vertical-coded row against ``ref`` ->
    transition positions (shared by T.6 and T.4 K>0 2-D rows)."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 white, 1 black
    while a0 < width:
        # b1: first ref transition right of a0 with opposite color
        # (transitions alternate white->black at even indices)
        i = 0
        while i < len(ref) and (ref[i] <= a0 or (i & 1) != color):
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        mode = br.read_code(_MODE_TRIE)
        if mode == "P":
            a0 = b2
        elif mode == "H":
            start = a0 if a0 > 0 else 0
            r1 = _read_run(br, _BLACK_TRIE if color else _WHITE_TRIE)
            r2 = _read_run(br, _WHITE_TRIE if color else _BLACK_TRIE)
            a1 = start + r1
            a2 = a1 + r2
            cur.extend((a1, a2))
            a0 = a2
        else:
            delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                     "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = b1 + delta
            cur.append(a1)
            a0 = a1
            color ^= 1
    return [min(max(p, 0), width) for p in cur]


def _paint_row(out: bytearray, base: int, cur: list[int], width: int) -> None:
    paint = 0
    pos = 0
    for t in cur + [width]:
        if paint:
            for x in range(pos, min(t, width)):
                out[base + (x >> 3)] |= 0x80 >> (x & 7)
        pos = t
        paint ^= 1
        if pos >= width:
            break


def g4_decode(data: bytes, width: int, height: int) -> bytes:
    """T.6 stream -> packed rows ((width+7)//8 bytes each, MSB-first,
    1 = black)."""
    br = _BitReader(data)
    rowbytes = (width + 7) // 8
    out = bytearray(rowbytes * height)
    ref = [width, width]  # changing elements of the imaginary white row
    for y in range(height):
        cur = _decode_2d_row(br, ref, width)
        _paint_row(out, y * rowbytes, cur, width)
        ref = cur + [width, width]
    return bytes(out)


def _transitions(row_bits: list[int], width: int) -> list[int]:
    out = []
    prev = 0
    for x in range(width):
        if row_bits[x] != prev:
            out.append(x)
            prev = row_bits[x]
    return out


def _write_run(bw: _BitWriter, run: int, codes: dict) -> None:
    while run >= 64:
        if run > 2560 + 63:
            bw.write(EXT_CODES[2560])
            run -= 2560
            continue
        makeup = min(run - run % 64, 2560)
        if makeup > 1728:
            bw.write(EXT_CODES[makeup])
        else:
            bw.write(codes[makeup])
        run -= makeup
    bw.write(codes[run])


def _encode_2d_row(
    bw: _BitWriter, cur: list[int], ref: list[int], width: int
) -> None:
    """Code one row against ``ref`` with pass/horizontal/vertical modes
    (shared by T.6 and T.4 K>0 2-D rows)."""
    a0 = -1
    color = 0
    ci = 0
    while a0 < width:
        i = 0
        while i < len(ref) and (ref[i] <= a0 or (i & 1) != color):
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        a1 = cur[ci] if ci < len(cur) else width
        if b2 < a1:
            bw.write(MODE_CODES["P"])
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.write(
                MODE_CODES[
                    {0: "V0", 1: "VR1", 2: "VR2", 3: "VR3",
                     -1: "VL1", -2: "VL2", -3: "VL3"}[a1 - b1]
                ]
            )
            a0 = a1
            ci += 1
            color ^= 1
        else:
            a2 = cur[ci + 1] if ci + 1 < len(cur) else width
            start = a0 if a0 > 0 else 0
            bw.write(MODE_CODES["H"])
            _write_run(bw, a1 - start, BLACK_CODES if color else WHITE_CODES)
            _write_run(bw, a2 - a1, WHITE_CODES if color else BLACK_CODES)
            a0 = a2
            ci += 2


def _row_bits(packed: bytes, y: int, rowbytes: int, width: int) -> list[int]:
    base = y * rowbytes
    return [
        (packed[base + (x >> 3)] >> (7 - (x & 7))) & 1 for x in range(width)
    ]


def g4_encode(packed: bytes, width: int, height: int) -> bytes:
    """Packed rows (1 = black) -> T.6 stream (with EOFB)."""
    rowbytes = (width + 7) // 8
    bw = _BitWriter()
    ref = [width, width]
    for y in range(height):
        cur = _transitions(_row_bits(packed, y, rowbytes, width), width)
        _encode_2d_row(bw, cur, ref, width)
        ref = cur + [width, width]
    bw.write(EOFB)
    return bw.getvalue()



# ----------------------------------------------------------- T.4 (G3) ---

EOL = "000000000001"


def _row_transitions_to_bits(cur: list[int], width: int) -> list[int]:
    row = [0] * width
    paint = 0
    pos = 0
    for t in cur + [width]:
        t = min(max(t, 0), width)
        if paint:
            for x in range(pos, t):
                row[x] = 1
        pos = t
        paint ^= 1
    return row


def _mh_encode_row(bw: _BitWriter, row: list[int], width: int) -> None:
    """One T.4 1-D (modified Huffman) row: alternating white/black runs,
    always starting with a (possibly zero-length) white run."""
    x = 0
    color = 0
    while x <= width:
        run = 0
        while x + run < width and row[x + run] == color:
            run += 1
        _write_run(bw, run, BLACK_CODES if color else WHITE_CODES)
        x += run
        if x >= width:
            break
        color ^= 1


def _mh_decode_row(br: _BitReader, width: int) -> list[int]:
    """-> transition positions for one 1-D row."""
    cur: list[int] = []
    x = 0
    color = 0
    while x < width:
        run = _read_run(br, _BLACK_TRIE if color else _WHITE_TRIE)
        x += run
        if x > width:
            raise ValueError("CCITT 1-D run overruns the row")
        cur.append(x)
        color ^= 1
    return cur


def g3_1d_encode(
    packed: bytes, width: int, height: int, byte_align: bool = True,
    with_eol: bool = False,
) -> bytes:
    """T.4 1-D / TIFF Compression 2 ("CCITT RLE", byte-aligned rows) or
    Compression 3 with EOL prefixes."""
    rowbytes = (width + 7) // 8
    bw = _BitWriter()
    for y in range(height):
        if with_eol:
            bw.write(EOL)
        row = [
            (packed[y * rowbytes + (x >> 3)] >> (7 - (x & 7))) & 1
            for x in range(width)
        ]
        _mh_encode_row(bw, row, width)
        if byte_align and not with_eol:
            used = sum(len(b) for b in bw.bits)
            bw.write("0" * ((-used) % 8))
    return bw.getvalue()


def g3_1d_decode(
    data: bytes, width: int, height: int, byte_align: bool = True,
    with_eol: bool = False,
) -> bytes:
    rowbytes = (width + 7) // 8
    out = bytearray(rowbytes * height)
    br = _BitReader(data)
    for y in range(height):
        if with_eol:
            # skip fill bits up to and including the EOL code
            zeros = 0
            while True:
                bit = br.read_bit()
                if bit:
                    if zeros < 11:
                        raise ValueError("CCITT G3 row lacks its EOL prefix")
                    break
                zeros += 1
        elif byte_align and br.pos % 8:
            br.pos += 8 - (br.pos % 8)
        cur = _mh_decode_row(br, width)
        row = _row_transitions_to_bits(cur, width)
        base = y * rowbytes
        for x in range(width):
            if row[x]:
                out[base + (x >> 3)] |= 0x80 >> (x & 7)
    return bytes(out)


def g3_2d_encode(packed: bytes, width: int, height: int, k: int = 2) -> bytes:
    """T.4 K>0 mixed coding: every row is EOL-prefixed with a tag bit —
    1 for a 1-D (MH) row, 0 for a 2-D (pass/horizontal/vertical) row
    coded against the previous row; a 1-D anchor row appears at least
    every ``k`` rows (the fax error-confinement contract)."""
    if k < 1:
        raise ValueError("K must be positive")
    rowbytes = (width + 7) // 8
    bw = _BitWriter()
    ref: list[int] | None = None
    for y in range(height):
        row = _row_bits(packed, y, rowbytes, width)
        cur = _transitions(row, width)
        one_d = y % k == 0
        bw.write(EOL)
        bw.write("1" if one_d else "0")
        if one_d:
            _mh_encode_row(bw, row, width)
        else:
            _encode_2d_row(bw, cur, ref, width)
        ref = cur + [width, width]
    return bw.getvalue()


def g3_2d_decode(data: bytes, width: int, height: int) -> bytes:
    """T.4 K>0 stream -> packed rows (the tag bit after each EOL routes
    1-D vs 2-D row decoding)."""
    rowbytes = (width + 7) // 8
    out = bytearray(rowbytes * height)
    br = _BitReader(data)
    ref: list[int] | None = None
    for y in range(height):
        zeros = 0
        while True:
            if br.read_bit():
                if zeros < 11:
                    raise ValueError("CCITT G3 row lacks its EOL prefix")
                break
            zeros += 1
        one_d = bool(br.read_bit())
        if one_d:
            cur = _mh_decode_row(br, width)
        else:
            if ref is None:
                raise ValueError("2-D G3 row with no preceding anchor row")
            cur = _decode_2d_row(br, ref, width)
        cur = [min(max(p, 0), width) for p in cur]
        _paint_row(out, y * rowbytes, cur, width)
        ref = cur + [width, width]
    return bytes(out)
