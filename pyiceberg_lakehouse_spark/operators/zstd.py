"""Zstandard (RFC 8878) in pure Python — frame decoder AND compressor.

Closes the archive layer's zstd gate on this Python (no stdlib zstd
until 3.14): decodes real zstd frames — frame header forms, raw/RLE/
compressed blocks, all four literals-section types (including the
4-stream Huffman split), FSE-compressed Huffman weight tables, the
predefined AND FSE-encoded sequence tables, repeat-offset history with
the literals-length-0 special cases, overlap-safe match copies, and the
optional xxhash64 content checksum (implemented below, also pure
Python).

Validation both ways: tests/test_zstd.py round-trips hundreds of
frames produced by the SYSTEM zstd encoder (pyarrow's bundled libzstd)
across compression levels and data shapes, and the from-scratch
compressor's frames (raw literals + predefined-FSE sequence coding,
encoder section at the bottom) decode through libzstd as well as this
decoder — every structural path exercised against the reference
implementation, the same posture as the VP8/snappy codecs.

All constants (predefined FSE distributions, code baselines/extra-bit
tables) are the published RFC 8878 §3.1.1.3.2 values.

Reference parity: ashkangoleh/pyiceberg-lakehouse reads zstd only
through parquet codecs (engine-internal); this decoder serves the
crawl-archive surface (.zst / .tar.zst web-corpus wrappers).
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F

# --- sequence code tables (RFC 8878 §3.1.1.3.2.1) ---
_LL_BASELINE = (
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
)
_LL_BITS = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
)
_ML_BASELINE = (
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37,
    39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
)
_ML_BITS = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
)

# predefined FSE distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT_DIST = (
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
)
_LL_DEFAULT_ALOG = 6
_ML_DEFAULT_DIST = (
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1,
    -1,
)
_ML_DEFAULT_ALOG = 6
_OF_DEFAULT_DIST = (
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
)
_OF_DEFAULT_ALOG = 5


class _FwdBits:
    """Forward little-endian bit reader (FSE table descriptions)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = (self.pos + i) >> 3
            if byte >= len(self.data):
                raise ValueError("zstd: FSE description overruns its area")
            out |= ((self.data[byte] >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return out

    def bytes_used(self) -> int:
        return (self.pos + 7) >> 3


class _BackBits:
    """Backward bitstream (RFC 8878 §3.1.1.1: starts at the LAST byte,
    whose highest set bit is the padding sentinel)."""

    def __init__(self, data: bytes) -> None:
        if not data:
            raise ValueError("zstd: empty bitstream")
        self.data = data
        last = data[-1]
        if last == 0:
            raise ValueError("zstd: bitstream padding byte is zero")
        # bit position just below the sentinel bit, counting from stream
        # start (bit i = bit (i&7) of byte (i>>3), little-endian)
        self.pos = (len(data) - 1) * 8 + last.bit_length() - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        out = 0
        for i in range(n):
            p = self.pos + i
            if p < 0:
                continue  # reading past the start yields zero bits
            out |= ((self.data[p >> 3] >> (p & 7)) & 1) << i
        return out

    def exhausted(self) -> bool:
        return self.pos <= 0


def _fse_read_distribution(src: bytes) -> tuple[list[int], int, int]:
    """FSE table description -> (normalized counts, accuracy_log,
    bytes consumed)."""
    br = _FwdBits(src)
    alog = br.read(4) + 5
    if alog > 9:
        raise ValueError("zstd: FSE accuracy log over 9")
    remaining = 1 << alog
    counts: list[int] = []
    while remaining > 0:
        # truncated-binary value over [0, remaining+1]: the u shortest
        # codes use k-1 bits, the rest k bits (FSE_readNCount semantics)
        k = (remaining + 1).bit_length()
        u = (1 << k) - (remaining + 2)
        lo = br.read(k - 1)
        if lo < u:
            value = lo
        else:
            full = lo | (br.read(1) << (k - 1))
            value = full - u if full >= (1 << (k - 1)) else full
        prob = value - 1  # -1 means "less than one"
        counts.append(prob)
        remaining -= abs(prob) if prob != 0 else 0
        if prob == 0:
            # repeat flag: 2 bits, value 3 repeats again
            while True:
                rep = br.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
    if remaining < 0:
        raise ValueError("zstd: FSE distribution exceeds table size")
    return counts, alog, br.bytes_used()


def _fse_build_table(counts: list[int], alog: int) -> list[tuple[int, int, int]]:
    """-> decode table: state -> (symbol, nb_bits, baseline)."""
    size = 1 << alog
    table_sym = [0] * size
    high = size - 1
    # "less than one" symbols take single cells from the table end
    for sym, c in enumerate(counts):
        if c == -1:
            table_sym[high] = sym
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for sym, c in enumerate(counts):
        if c <= 0:
            continue
        for _ in range(c):
            table_sym[pos] = sym
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE spread did not return to zero")
    # per-state transition: count occurrences per symbol in state order
    seen: dict[int, int] = {}
    table: list[tuple[int, int, int]] = [None] * size  # type: ignore
    total = {s: (1 if c == -1 else c) for s, c in enumerate(counts)}
    for state in range(size):
        sym = table_sym[state]
        k = seen.get(sym, 0)
        seen[sym] = k + 1
        n = total[sym]
        # the k-th state of this symbol (in table order)
        nb = alog - (n + k).bit_length() + 1
        baseline = ((n + k) << nb) - size
        table[state] = (sym, nb, baseline)
    return table


class _FseState:
    def __init__(self, table, bits: _BackBits, alog: int) -> None:
        self.table = table
        self.state = bits.read(alog)

    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, bits: _BackBits) -> None:
        _sym, nb, baseline = self.table[self.state]
        self.state = baseline + bits.read(nb)


# --------------------------------------------------------------- huffman --


def _huf_read_weights(src: bytes) -> tuple[list[int], int]:
    """Huffman weight table -> (weights incl. implied last, bytes used)."""
    if not src:
        raise ValueError("zstd: empty huffman description")
    head = src[0]
    if head >= 128:  # direct: 4-bit weights
        n = head - 127
        nbytes = (n + 1) // 2
        weights = []
        for i in range(n):
            b = src[1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        used = 1 + nbytes
    else:  # FSE-compressed weights, two interleaved states
        area = src[1 : 1 + head]
        counts, alog, desc_used = _fse_read_distribution(area)
        table = _fse_build_table(counts, alog)
        bits = _BackBits(area[desc_used:])
        s1 = _FseState(table, bits, alog)
        s2 = _FseState(table, bits, alog)
        weights = []
        # interleaved two-state FSE: each step emits the current state's
        # symbol and advances it; once the advance overreads the stream,
        # the OTHER state contributes its pending symbol and decode ends
        cur, oth = s1, s2
        while True:
            weights.append(cur.symbol())
            cur.update(bits)
            if bits.pos < 0:
                weights.append(oth.symbol())
                break
            cur, oth = oth, cur
            if len(weights) > 254:
                raise ValueError("zstd: more than 255 huffman weights")
        used = 1 + head
    # implied last weight completes the total to the next power of two
    total = sum((1 << (w - 1)) for w in weights if w)
    if total == 0:
        raise ValueError("zstd: huffman weights all zero")
    p = 1
    while p <= total:
        p <<= 1
    rest = p - total
    if rest & (rest - 1):
        raise ValueError("zstd: huffman weights do not complete a power of 2")
    weights.append(rest.bit_length())
    return weights, used


def _huf_build_table(weights: list[int]) -> tuple[dict, int]:
    """weights -> (table: code-prefix lookup list, max_bits).

    Table maps every value of max_bits bits to (symbol, nb_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w)
    max_bits = total.bit_length() - 1
    if (1 << max_bits) != total:
        raise ValueError("zstd: completed huffman weights not a power of 2")
    size = 1 << max_bits
    table: list[tuple[int, int]] = [None] * size  # type: ignore
    code = 0
    # lower weights first (longest codes), symbol order within a weight
    for w in range(1, max_bits + 1):
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            nb = max_bits + 1 - w
            span = 1 << (max_bits - nb)
            for i in range(span):
                table[code + i] = (sym, nb)
            code += span
    if code != size:
        raise ValueError("zstd: huffman table not fully assigned")
    return table, max_bits


def _huf_decode_stream(
    data: bytes, table, max_bits: int, n_out: int
) -> bytearray:
    bits = _BackBits(data)
    out = bytearray()
    while len(out) < n_out:
        idx = bits.read(max_bits)
        sym, nb = table[idx]
        # give back the unused bits
        bits.pos += max_bits - nb
        out.append(sym)
        if bits.pos < 0 and len(out) < n_out:
            raise ValueError("zstd: huffman stream exhausted early")
    return out


# --------------------------------------------------------------- xxhash --


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (the zstd content checksum), pure Python."""
    P1, P2, P3, P4, P5 = (
        0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
        0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
    )
    M = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while pos + 32 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<Q", data, pos + 8 * i)
                v = (v + lane * P2) & M
                v = rotl(v, 31)
                v = (v * P1) & M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            v = (v * P2) & M
            v = rotl(v, 31)
            v = (v * P1) & M
            h ^= v
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        k = rotl((lane * P2) & M, 31)
        h ^= (k * P1) & M
        h = (rotl(h, 27) * P1 + P4) & M
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h ^= (lane * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        pos += 4
    while pos < n:
        h ^= (data[pos] * P5) & M
        h = (rotl(h, 11) * P1) & M
        pos += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


# ---------------------------------------------------------------- frames --


class _RepeatTables:
    """Per-frame repeatable entropy state (Treeless literals + Repeat
    sequence modes reuse the previous tables)."""

    def __init__(self) -> None:
        self.huf = None  # (table, max_bits)
        self.ll = None
        self.of = None
        self.ml = None


def _decode_literals(block: bytes, rep: _RepeatTables) -> tuple[bytes, int]:
    """Literals section -> (literals, bytes consumed)."""
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):  # 1-byte header, 5-bit size (sf bit0 is size bit)
            size = b0 >> 3
            pos = 1
        elif sf == 1:
            size = (b0 >> 4) | (block[1] << 4)
            pos = 2
        else:
            size = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            pos = 3
        if ltype == 0:
            return bytes(block[pos : pos + size]), pos + size
        return bytes([block[pos]]) * size, pos + 1
    # compressed / treeless
    if sf in (0, 1):
        n_streams = 1 if sf == 0 else 4
        rsize = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        csize = (block[1] >> 6) | (block[2] << 2)
        pos = 3
    elif sf == 2:
        n_streams = 4
        rsize = (b0 >> 4) | (block[1] << 4) | ((block[2] & 3) << 12)
        csize = (block[2] >> 2) | (block[3] << 6)
        pos = 4
    else:
        n_streams = 4
        rsize = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        csize = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
        pos = 5
    area = block[pos : pos + csize]
    if len(area) != csize:
        raise ValueError("zstd: literals area truncated")
    if ltype == 2:  # new huffman table
        weights, used = _huf_read_weights(area)
        rep.huf = _huf_build_table(weights)
        area = area[used:]
    if rep.huf is None:
        raise ValueError("zstd: treeless literals with no previous table")
    table, max_bits = rep.huf
    if n_streams == 1:
        out = _huf_decode_stream(area, table, max_bits, rsize)
    else:
        if len(area) < 6:
            raise ValueError("zstd: 4-stream literals too short")
        s1, s2, s3 = struct.unpack_from("<HHH", area, 0)
        streams = []
        p = 6
        for sz in (s1, s2, s3):
            streams.append(area[p : p + sz])
            p += sz
        streams.append(area[p:])
        per = (rsize + 3) // 4
        out = bytearray()
        for i, sdata in enumerate(streams):
            want = per if i < 3 else rsize - 3 * per
            out += _huf_decode_stream(sdata, table, max_bits, want)
    if len(out) != rsize:
        raise ValueError("zstd: literals regenerated size mismatch")
    return bytes(out), pos + csize


def _seq_table(mode: int, src: bytes, pos: int, default, rep_slot, max_sym):
    """One symbol-table per the 2-bit compression mode -> (table, alog,
    new_pos). ``default`` = (dist, alog); rep_slot = previous table."""
    if mode == 0:  # predefined
        dist, alog = default
        return _fse_build_table(list(dist), alog), alog, pos
    if mode == 1:  # RLE: one byte, a table with a single zero-bit state
        sym = src[pos]
        if sym > max_sym:
            raise ValueError("zstd: RLE sequence symbol out of range")
        return [(sym, 0, 0)], 0, pos + 1
    if mode == 2:  # FSE-described
        counts, alog, used = _fse_read_distribution(src[pos:])
        if len(counts) - 1 > max_sym:
            raise ValueError("zstd: FSE symbol out of range")
        return _fse_build_table(counts, alog), alog, pos + used
    if rep_slot is None:
        raise ValueError("zstd: repeat sequence mode with no previous table")
    return rep_slot[0], rep_slot[1], pos


def _decode_block(block: bytes, out: bytearray, rep: _RepeatTables, reps: list[int]) -> None:
    literals, pos = _decode_literals(block, rep)
    # sequences header
    if pos >= len(block):
        raise ValueError("zstd: missing sequences section")
    b = block[pos]
    if b < 128:
        n_seq = b
        pos += 1
    elif b < 255:
        n_seq = ((b - 128) << 8) + block[pos + 1]
        pos += 2
    else:
        n_seq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    if n_seq == 0:
        out += literals
        return
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence mode bits set")
    ll_mode = (modes >> 6) & 3
    of_mode = (modes >> 4) & 3
    ml_mode = (modes >> 2) & 3
    ll_table, ll_alog, pos = _seq_table(
        ll_mode, block, pos, (_LL_DEFAULT_DIST, _LL_DEFAULT_ALOG), rep.ll, 35
    )
    rep.ll = (ll_table, ll_alog)
    of_table, of_alog, pos = _seq_table(
        of_mode, block, pos, (_OF_DEFAULT_DIST, _OF_DEFAULT_ALOG), rep.of, 31
    )
    rep.of = (of_table, of_alog)
    ml_table, ml_alog, pos = _seq_table(
        ml_mode, block, pos, (_ML_DEFAULT_DIST, _ML_DEFAULT_ALOG), rep.ml, 52
    )
    rep.ml = (ml_table, ml_alog)
    bits = _BackBits(block[pos:])
    ll_state = _FseState(ll_table, bits, ll_alog)
    of_state = _FseState(of_table, bits, of_alog)
    ml_state = _FseState(ml_table, bits, ml_alog)
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_state.symbol()
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        of_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_state.symbol()
        ml = _ML_BASELINE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = ll_state.symbol()
        ll = _LL_BASELINE[ll_code] + bits.read(_LL_BITS[ll_code])
        # repeat-offset resolution (RFC 8878 §3.1.1.5)
        if of_value > 3:
            offset = of_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = of_value - 1 if ll != 0 else of_value
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # ll == 0 and of_value == 3
                offset = reps[0] - 1
                if offset == 0:
                    raise ValueError("zstd: repeat offset underflow")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if lit_pos + ll > len(literals):
            raise ValueError("zstd: sequence literals length exceeds"
                             " the literals section")
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset beyond decoded data")
        # overlap-safe copy
        start = len(out) - offset
        for k in range(ml):
            out.append(out[start + k])
        if i < n_seq - 1:
            ll_state.update(bits)
            ml_state.update(bits)
            of_state.update(bits)
    out += literals[lit_pos:]


def decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """All zstd frames in ``data`` (skippable frames skipped) ->
    concatenated decompressed bytes. Dictionaries are not supported
    (raises on a nonzero dictionary id)."""
    out_all = bytearray()
    pos = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("zstd: trailing garbage after last frame")
        (magic,) = struct.unpack_from("<I", data, pos)
        if SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
            (size,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + size
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError(f"zstd: bad magic {magic:#x}")
        pos += 4
        fhd = data[pos]
        pos += 1
        dict_flag = fhd & 3
        checksum = (fhd >> 2) & 1
        if (fhd >> 3) & 1:
            raise ValueError("zstd: reserved frame header bit set")
        single_segment = (fhd >> 5) & 1
        fcs_code = fhd >> 6
        if not single_segment:
            pos += 1  # window descriptor (size hints only)
        if dict_flag:
            did_len = (0, 1, 2, 4)[dict_flag]
            did = int.from_bytes(data[pos : pos + did_len], "little")
            pos += did_len
            if did:
                raise NotImplementedError(
                    f"zstd: dictionary {did} required - dictionary frames"
                    " are not supported"
                )
        fcs = None
        fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_code]
        if fcs_len:
            fcs = int.from_bytes(data[pos : pos + fcs_len], "little")
            if fcs_len == 2:
                fcs += 256
            pos += fcs_len
        out = bytearray()
        rep = _RepeatTables()
        reps = [1, 4, 8]
        while True:
            if pos + 3 > len(data):
                raise ValueError("zstd: truncated block header")
            bh = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # raw
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                block = data[pos : pos + bsize]
                if len(block) != bsize:
                    raise ValueError("zstd: compressed block truncated")
                _decode_block(block, out, rep, reps)
                pos += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if len(out) > max_output:
                raise ValueError("zstd: output exceeds the allowed maximum")
            if last:
                break
        if fcs is not None and len(out) != fcs:
            raise ValueError(
                f"zstd: frame content size {fcs} != decoded {len(out)}"
            )
        if checksum:
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            got = xxh64(bytes(out)) & 0xFFFFFFFF
            if got != want:
                raise ValueError("zstd: content checksum mismatch")
        out_all += out
    return bytes(out_all)


# ------------------------------------------------------------- encoder --
# From-scratch zstd COMPRESSOR (the decoder's symmetric half): raw
# literals + predefined-FSE sequence coding (RFC 8878 §3.1.1.3.2.2) —
# every frame it emits is decodable by this module's own decoder AND by
# libzstd (tests/test_zstd.py round-trips both ways). The FSE encoder
# is derived directly from the decode tables: for each symbol the
# [baseline, baseline + 2^nb) ranges of its states tile the whole state
# space, so threading states backwards from the last sequence picks the
# unique predecessor state per transition.


class _FwdBitWriter:
    """Forward little-endian bit writer for the backward-read stream:
    values are appended in REVERSE consumption order, then the padding
    sentinel bit closes the stream (§3.1.1.1)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def finish(self) -> bytes:
        self.bits.append(1)  # sentinel
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _code_for(value: int, baselines, bits_tbl) -> tuple[int, int]:
    for code in range(len(baselines) - 1, -1, -1):
        if baselines[code] <= value:
            extra = value - baselines[code]
            if extra < (1 << bits_tbl[code]):
                return code, extra
            break
    raise ValueError(f"zstd: no sequence code for value {value}")


def _fse_thread_states(table, symbols):
    """decode table + the symbol sequence -> (initial state, transition
    bits [(value, nb)] for sequences 0..n-2, in decode order)."""
    by_sym: dict[int, list[tuple[int, int, int]]] = {}
    for state, (sym, nb, baseline) in enumerate(table):
        by_sym.setdefault(sym, []).append((state, nb, baseline))
    n = len(symbols)
    state = by_sym[symbols[n - 1]][0][0]
    ubits: list[tuple[int, int]] = []
    for i in range(n - 2, -1, -1):
        target = state
        for st, nb, baseline in by_sym[symbols[i]]:
            if baseline <= target < baseline + (1 << nb):
                state = st
                ubits.append((target - baseline, nb))
                break
        else:  # unreachable: the ranges tile [0, size)
            raise ValueError("zstd: FSE state threading failed")
    ubits.reverse()
    return state, ubits


def _match_block(chunk: bytes) -> tuple[bytes, list[tuple[int, int, int]]]:
    """Greedy hash matcher -> (literals, [(ll, offset, ml)])."""
    table: dict[bytes, int] = {}
    lits = bytearray()
    seqs: list[tuple[int, int, int]] = []
    i = 0
    lit_start = 0
    end = len(chunk)
    while i + 4 <= end:
        key = chunk[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None:
            i += 1
            continue
        ml = 4
        while i + ml < end and chunk[cand + ml] == chunk[i + ml]:
            ml += 1
        seqs.append((i - lit_start, i - cand, ml))
        lits += chunk[lit_start:i]
        i += ml
        lit_start = i
    lits += chunk[lit_start:end]
    return bytes(lits), seqs


def _encode_block(chunk: bytes) -> bytes | None:
    """One compressed-block body (literals + sequences sections), or
    None when the chunk has no matches worth a sequence section."""
    lits, seqs = _match_block(chunk)
    if not seqs:
        return None
    # ---- literals section: Raw, 20-bit size form (sf=3) ----
    body = bytearray()
    size = len(lits)
    body.append(((size & 0xF) << 4) | (3 << 2) | 0)
    body.append((size >> 4) & 0xFF)
    body.append((size >> 12) & 0xFF)
    body += lits
    # ---- sequences header ----
    n = len(seqs)
    if n < 128:
        body.append(n)
    elif n < 0x7F00:
        body.append((n >> 8) + 128)
        body.append(n & 0xFF)
    else:
        body.append(255)
        body.append((n - 0x7F00) & 0xFF)
        body.append((n - 0x7F00) >> 8)
    body.append(0)  # all three channels: predefined mode
    # ---- per-sequence codes ----
    ll_codes, of_codes, ml_codes = [], [], []
    extras = []  # (of_extra, of_nb, ml_extra, ml_nb, ll_extra, ll_nb)
    for ll, offset, ml in seqs:
        of_value = offset + 3
        of_code = of_value.bit_length() - 1
        if of_code > 28:
            raise ValueError("zstd: offset beyond the predefined table")
        of_extra = of_value - (1 << of_code)
        ml_code, ml_extra = _code_for(ml, _ML_BASELINE, _ML_BITS)
        ll_code, ll_extra = _code_for(ll, _LL_BASELINE, _LL_BITS)
        of_codes.append(of_code)
        ml_codes.append(ml_code)
        ll_codes.append(ll_code)
        extras.append((of_extra, of_code, ml_extra, _ML_BITS[ml_code],
                       ll_extra, _LL_BITS[ll_code]))
    ll_table = _fse_build_table(list(_LL_DEFAULT_DIST), _LL_DEFAULT_ALOG)
    of_table = _fse_build_table(list(_OF_DEFAULT_DIST), _OF_DEFAULT_ALOG)
    ml_table = _fse_build_table(list(_ML_DEFAULT_DIST), _ML_DEFAULT_ALOG)
    ll0, ll_u = _fse_thread_states(ll_table, ll_codes)
    of0, of_u = _fse_thread_states(of_table, of_codes)
    ml0, ml_u = _fse_thread_states(ml_table, ml_codes)
    # ---- assemble the reads in DECODE order, write them reversed ----
    reads: list[tuple[int, int]] = [
        (ll0, _LL_DEFAULT_ALOG), (of0, _OF_DEFAULT_ALOG),
        (ml0, _ML_DEFAULT_ALOG),
    ]
    for i in range(n):
        of_e, of_nb, ml_e, ml_nb, ll_e, ll_nb = extras[i]
        reads.append((of_e, of_nb))
        reads.append((ml_e, ml_nb))
        reads.append((ll_e, ll_nb))
        if i < n - 1:
            reads.append(ll_u[i])
            reads.append(ml_u[i])
            reads.append(of_u[i])
    w = _FwdBitWriter()
    for value, nb in reversed(reads):
        w.write(value, nb)
    body += w.finish()
    return bytes(body)


def compress(data: bytes, block_size: int = 1 << 16) -> bytes:
    """bytes -> one zstd frame (single-segment, 4-byte frame content
    size, no checksum): compressed blocks with raw literals +
    predefined-FSE sequences where matches exist, raw blocks
    otherwise."""
    data = bytes(data)
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    out.append((1 << 5) | (2 << 6))  # single-segment, 4-byte FCS
    out += struct.pack("<I", len(data))
    chunks = [data[i : i + block_size]
              for i in range(0, len(data), block_size)] or [b""]
    for ci, chunk in enumerate(chunks):
        last = 1 if ci == len(chunks) - 1 else 0
        body = _encode_block(chunk) if chunk else None
        if body is not None and len(body) < len(chunk):
            bh = (len(body) << 3) | (2 << 1) | last
            out += bh.to_bytes(3, "little")
            out += body
        else:
            bh = (len(chunk) << 3) | (0 << 1) | last
            out += bh.to_bytes(3, "little")
            out += chunk
    return bytes(out)
