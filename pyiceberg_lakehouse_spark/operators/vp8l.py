"""WebP VP8L lossless codec in pure Python/numpy — pixels, not probes.

Implements the published "WebP Lossless Bitstream Specification"
(VERDICT r13 task #1 — WebP is the modern crawl's dominant image
format; until now the engine could curate on container metadata but
not see pixels):

- LSB-first bit reading (DEFLATE's convention, the GIF/TIFF codecs'
  opposite pairing), canonical prefix codes read root-first;
- both prefix-code wire forms: "simple" (1-2 symbols) and "normal"
  (code-length-codes in the spec's 19-symbol order, repeat codes
  16/17/18, the optional max_symbol early-out);
- the spatially-coded image: 5 prefix codes per meta group
  (green+length+cache, red, blue, alpha, distance), LZ77
  back-references with the shared length/distance prefix scheme and
  the 120-entry distance-to-plane-code neighborhood map, and the
  optional color cache ((0x1e35a7bd * ARGB) >> (32 - bits) keys,
  every emitted pixel inserted);
- all four transforms, inverted in reverse read order: PREDICTOR
  (14 modes incl. Select and the two clamp-add-subtract forms, with
  the spec's border rules — TR of the rightmost column is the
  leftmost pixel of the SAME row), COLOR (cross-color deltas
  (int8(t) * int8(c)) >> 5, blue correcting off the RECONSTRUCTED
  red), SUBTRACT_GREEN, and COLOR_INDEXING (delta-coded palette,
  sub-byte pixel bundling at 1/2/4 bits);
- meta prefix groups via an entropy image (level-0 only, as the spec
  scopes it).

The encoder emits valid, deliberately straightforward streams —
single meta group, real canonical codes (depth-limited), distance-1
run LZ77, optional color cache, optional transforms — so the
planted-construction driver row roundtrips real bitstreams; it is a
correctness fixture, not a compression contender.

Honest gates: lossy VP8 pixel decode stays out (a DCT video intra
codec, a different project); COLOR_INDEXING combined with PREDICTOR/
COLOR transforms raises (spec-legal, unseen in practice, and the
packed-width interaction is easy to get silently wrong).

Reference parity: ashkangoleh/pyiceberg-lakehouse ingests images as
opaque binary (main-daft.py:68); this engine decodes them.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- bit I/O ---


class BitReader:
    """LSB-first bit reader (first bit read = LSB of the current byte)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("VP8L stream exhausted mid-read")
        v = 0
        got = 0
        pos = self.pos
        while got < n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n - got)
            bits = (byte >> (pos & 7)) & ((1 << take) - 1)
            v |= bits << got
            got += take
            pos += take
        self.pos = pos
        return v


class BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if value < 0 or (n < 32 and value >> n):
            raise ValueError(f"value {value} does not fit in {n} bits")
        self.acc |= value << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def getvalue(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


# ------------------------------------------------- canonical prefix code ---

MAX_CODE_DEPTH = 15
# spec §6.2.2: the order code-length-code lengths arrive in
CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """lengths[symbol] -> {symbol: (code, length)} per the DEFLATE/VP8L
    canonical rule (codes assigned in symbol order within each length,
    read most-significant-bit first). Rejects over-/under-subscribed
    (incomplete) codes — a guessing decoder corrupts silently."""
    used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("prefix code with no symbols")
    if len(used) == 1:
        return {used[0][0]: (0, 0)}  # zero-bit code, spec's 1-symbol form
    kraft = sum(1 << (MAX_CODE_DEPTH - ln) for _, ln in used)
    if kraft != 1 << MAX_CODE_DEPTH:
        raise ValueError("incomplete or oversubscribed prefix code")
    bl_count: dict[int, int] = {}
    for _, ln in used:
        bl_count[ln] = bl_count.get(ln, 0) + 1
    next_code: dict[int, int] = {}
    code = 0
    for ln in range(1, max(bl_count) + 1):
        code = (code + bl_count.get(ln - 1, 0)) << 1
        next_code[ln] = code
    out: dict[int, tuple[int, int]] = {}
    for s, ln in sorted(used, key=lambda t: (t[1], t[0])):
        out[s] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


class PrefixDecoder:
    """Bit-by-bit canonical decode: (length, code) -> symbol lookup."""

    def __init__(self, lengths: list[int]) -> None:
        codes = canonical_codes(lengths)
        self.single: int | None = None
        if len(codes) == 1:
            (self.single,) = codes
        self.by_code = {(ln, c): s for s, (c, ln) in codes.items()}

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, MAX_CODE_DEPTH + 1):
            code = (code << 1) | br.read(1)
            s = self.by_code.get((ln, code))
            if s is not None:
                return s
        raise ValueError("invalid prefix code in VP8L stream")


def build_lengths(freqs: dict[int, int], alphabet: int, limit: int = MAX_CODE_DEPTH) -> list[int]:
    """Frequency -> depth-limited canonical code lengths. Plain Huffman,
    with frequencies dampened and rebuilt if a depth exceeds ``limit``
    (the standard flattening fallback — optimality is not the goal)."""
    import heapq

    f = {s: c for s, c in freqs.items() if c > 0}
    if not f:
        return [0] * alphabet
    if len(f) == 1:
        out = [0] * alphabet
        out[next(iter(f))] = 1
        return out
    damp = dict(f)
    while True:
        heap = [(c, s, None) for s, c in damp.items()]
        heapq.heapify(heap)
        nodes: list[tuple] = []
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            nodes.append((a, b))
            heapq.heappush(heap, (a[0] + b[0], -len(nodes), (a, b)))
        depths: dict[int, int] = {}

        def walk(node: tuple, d: int) -> None:
            stack = [(node, d)]
            while stack:
                (c, s, kids), dd = stack.pop()
                if kids is None:
                    depths[s] = max(dd, 1)
                else:
                    stack.append((kids[0], dd + 1))
                    stack.append((kids[1], dd + 1))

        walk(heap[0], 0)
        if max(depths.values()) <= limit:
            out = [0] * alphabet
            for s, d in depths.items():
                out[s] = d
            return out
        damp = {s: (c + 1) >> 1 for s, c in damp.items()}


def _write_code(bw: BitWriter, codes: dict[int, tuple[int, int]], symbol: int) -> None:
    code, ln = codes[symbol]
    for k in range(ln - 1, -1, -1):  # canonical codes are read MSB first
        bw.write((code >> k) & 1, 1)


# --------------------------------------------- prefix-code wire headers ---


def read_prefix_code(br: BitReader, alphabet: int) -> PrefixDecoder:
    """§6.2.1/6.2.2: the 'simple' (1-2 symbol) and 'normal'
    (code-length-coded) wire forms."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet
        if s0 >= alphabet:
            raise ValueError("simple code symbol outside the alphabet")
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet or s1 == s0:
                raise ValueError("bad second simple-code symbol")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1  # canonical_codes maps 1 symbol -> 0-bit code
        return PrefixDecoder(lengths)
    # normal: code lengths arrive prefix-coded themselves
    num_code_lengths = 4 + br.read(4)
    if num_code_lengths > len(CODE_LENGTH_ORDER):
        raise ValueError("too many code-length codes")
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_dec = PrefixDecoder(cl_lengths)
    if br.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise ValueError("max_symbol beyond the alphabet")
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    symbol = 0
    prev_len = 8  # spec's default repeat seed
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_dec.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            extra, offset = {16: (2, 3), 17: (3, 3), 18: (7, 11)}[code_len]
            repeat = br.read(extra) + offset
            if symbol + repeat > alphabet:
                raise ValueError("code-length repeat overruns the alphabet")
            fill = prev_len if code_len == 16 else 0
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return PrefixDecoder(lengths)


def write_prefix_code(bw: BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit a prefix code header for ``lengths`` and return the code map
    for payload writing. Picks the simple form for 1-2 symbols (when the
    values fit its fields), else the normal form with zero runs packed
    into repeat codes 17/18 and trailing zeros cut via max_symbol."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("cannot emit a code with no symbols")
    if len(used) == 1 and used[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        return canonical_codes(lengths)
    if (
        len(used) == 2
        and lengths[used[0]] == 1
        and lengths[used[1]] == 1
        and used[1] < 256
    ):
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        bw.write(used[1], 8)
        return canonical_codes(lengths)
    # normal form
    bw.write(0, 1)
    last_used = max(used)
    # tokenize lengths[0..last_used] with 17/18 zero-run repeats
    tokens: list[tuple[int, int, int]] = []  # (cl_symbol, extra_val, extra_bits)
    i = 0
    while i <= last_used:
        if lengths[i] == 0:
            j = i
            while j <= last_used and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                n = min(run, 138)
                tokens.append((18, n - 11, 7))
                run -= n
            while run >= 3:
                n = min(run, 10)
                tokens.append((17, n - 3, 3))
                run -= n
            for _ in range(run):
                tokens.append((0, 0, 0))
            i = j
        else:
            tokens.append((lengths[i], 0, 0))
            i += 1
    if last_used + 1 < len(lengths) and len(tokens) < 2:
        # the token-count field encodes count-2; pad to reach 2 tokens
        tokens.append((0, 0, 0))
    cl_freq: dict[int, int] = {}
    for sym, _, _ in tokens:
        cl_freq[sym] = cl_freq.get(sym, 0) + 1
    cl_lengths = build_lengths(cl_freq, 19, limit=7)
    if len([s for s in range(19) if cl_lengths[s]]) == 1:
        # the temp decoder needs >= 1-bit codes only when reading; a
        # single used cl symbol yields a 0-bit code, which the wire's
        # 3-bit length field cannot express as 0 AND stay decodable —
        # widen to an artificial 2-symbol code
        lone = next(s for s in range(19) if cl_lengths[s])
        other = 0 if lone != 0 else 1
        cl_lengths[lone] = cl_lengths[other] = 1
    # how many of the ORDER slots we must transmit to cover every used one
    need = max(
        i for i, s in enumerate(CODE_LENGTH_ORDER)
        if cl_lengths[s] > 0
    ) + 1
    num_code_lengths = max(4, need)
    bw.write(num_code_lengths - 4, 4)
    for i in range(num_code_lengths):
        bw.write(cl_lengths[CODE_LENGTH_ORDER[i]], 3)
    cl_codes = canonical_codes(cl_lengths)
    if last_used + 1 < len(lengths):
        # trailing zeros are cut by transmitting the TOKEN COUNT (the
        # spec calls the field max_symbol, but the reader decrements it
        # once per token read and stops when it hits zero)
        bw.write(1, 1)
        n_tokens = len(tokens)
        for nbits in (2, 4, 6, 8, 10, 12, 14, 16):
            if n_tokens - 2 < (1 << nbits):
                bw.write((nbits - 2) // 2, 3)
                bw.write(n_tokens - 2, nbits)
                break
    else:
        bw.write(0, 1)
    for sym, extra_val, extra_bits in tokens:
        _write_code(bw, cl_codes, sym)
        if extra_bits:
            bw.write(extra_val, extra_bits)
    return canonical_codes(lengths)


# ------------------------------------------------------ LZ77 + image core ---

NUM_LITERALS = 256
NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40

# spec §5.2.3: plane codes 1..120 address a 2D neighborhood (dx, dy)
# around the current pixel; codes > 120 are linear distances - 120.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (8, 5),
    (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 6), (8, 7), (7, 7), (-7, 7),
)


def _lz77_read_value(code: int, br: BitReader) -> int:
    """Shared length/distance prefix scheme (§5.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_split_value(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits, extra_value); inverse of
    _lz77_read_value."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    hb = v.bit_length() - 1
    second = (v >> (hb - 1)) & 1
    return 2 * hb + second, hb - 1, v - ((2 + second) << (hb - 1))


def _plane_to_distance(plane_code: int, xsize: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    return max(1, dy * xsize + dx)


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_spatial_image(
    br: BitReader, w: int, h: int, is_level0: bool
) -> np.ndarray:
    """§5: the spatially-coded (entropy-coded) ARGB image -> flat
    np.uint32[(h*w)]. Handles the color cache, meta prefix groups
    (level 0 only), literals, LZ77 back-references and cache hits."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits} out of range")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    n_groups = 1
    entropy = None
    hbits = 0
    if is_level0 and br.read(1):
        hbits = br.read(3) + 2
        ew, eh = _subsample_size(w, hbits), _subsample_size(h, hbits)
        entropy = _read_spatial_image(br, ew, eh, False)
        # group index = (red << 8) | green of the entropy pixel
        entropy = ((entropy >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(entropy.max()) + 1

    green_alphabet = NUM_LITERALS + NUM_LENGTH_CODES + (
        (1 << cache_bits) if cache_bits else 0
    )
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                read_prefix_code(br, green_alphabet),
                read_prefix_code(br, NUM_LITERALS),  # red
                read_prefix_code(br, NUM_LITERALS),  # blue
                read_prefix_code(br, NUM_LITERALS),  # alpha
                read_prefix_code(br, NUM_DISTANCE_CODES),
            )
        )

    n = w * h
    out = np.zeros(n, dtype=np.uint64)  # uint64 avoids numpy uint32 traps
    pos = 0
    ew_row = _subsample_size(w, hbits) if entropy is not None else 0
    group = groups[0]
    while pos < n:
        if entropy is not None:
            x, y = pos % w, pos // w
            group = groups[int(entropy[(y >> hbits) * ew_row + (x >> hbits)])]
        g_dec, r_dec, b_dec, a_dec, d_dec = group
        s = g_dec.read(br)
        if s < NUM_LITERALS:  # literal pixel: G, R, B, A in that order
            red = r_dec.read(br)
            blue = b_dec.read(br)
            alpha = a_dec.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
        elif s < NUM_LITERALS + NUM_LENGTH_CODES:  # back-reference
            length = _lz77_read_value(s - NUM_LITERALS, br)
            dist_code = _lz77_read_value(d_dec.read(br), br)
            dist = _plane_to_distance(dist_code, w)
            if dist > pos:
                raise ValueError("VP8L back-reference before image start")
            if pos + length > n:
                raise ValueError("VP8L back-reference past image end")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
        else:  # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without a color cache")
            out[pos] = cache[s - NUM_LITERALS - NUM_LENGTH_CODES]
            pos += 1
    return out.astype(np.uint32)


def _write_spatial_image(
    bw: BitWriter,
    px: list[int],
    w: int,
    h: int,
    is_level0: bool,
    cache_bits: int = 0,
    use_lz77: bool = True,
) -> None:
    """Mirror of _read_spatial_image: single prefix group, distance-1
    run LZ77 (emitted as plane code 2 — exercising the neighborhood
    map), optional color cache with decode-identical insertion order."""
    cache: list[int] | None = (
        [0] * (1 << cache_bits) if cache_bits else None
    )
    events: list[tuple] = []
    n = len(px)
    pos = 0
    while pos < n:
        if use_lz77 and pos > 0:
            run = 0
            while (
                pos + run < n and px[pos + run] == px[pos - 1] and run < 4096
            ):
                run += 1
            if run >= 3:
                events.append(("ref", run, 2))  # plane code 2 = (dx 1, dy 0)
                if cache is not None:
                    for k in range(run):
                        cache[_cache_key(px[pos + k], cache_bits)] = px[pos + k]
                pos += run
                continue
        p = px[pos]
        if cache is not None and cache[_cache_key(p, cache_bits)] == p:
            events.append(("cache", _cache_key(p, cache_bits)))
        else:
            events.append(("lit", p))
        if cache is not None:
            cache[_cache_key(p, cache_bits)] = p
        pos += 1

    g_freq: dict[int, int] = {}
    r_freq: dict[int, int] = {}
    b_freq: dict[int, int] = {}
    a_freq: dict[int, int] = {}
    d_freq: dict[int, int] = {}

    def bump(d: dict[int, int], s: int) -> None:
        d[s] = d.get(s, 0) + 1

    for ev in events:
        if ev[0] == "lit":
            p = ev[1]
            bump(g_freq, (p >> 8) & 0xFF)
            bump(r_freq, (p >> 16) & 0xFF)
            bump(b_freq, p & 0xFF)
            bump(a_freq, (p >> 24) & 0xFF)
        elif ev[0] == "ref":
            bump(g_freq, NUM_LITERALS + _lz77_split_value(ev[1])[0])
            bump(d_freq, _lz77_split_value(ev[2])[0])
        else:
            bump(g_freq, NUM_LITERALS + NUM_LENGTH_CODES + ev[1])

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_level0:
        bw.write(0, 1)  # single prefix group, no entropy image
    green_alphabet = NUM_LITERALS + NUM_LENGTH_CODES + (
        (1 << cache_bits) if cache_bits else 0
    )
    # every tree must exist on the wire, used or not
    for freq, alphabet in (
        (g_freq, green_alphabet),
        (r_freq, NUM_LITERALS),
        (b_freq, NUM_LITERALS),
        (a_freq, NUM_LITERALS),
        (d_freq, NUM_DISTANCE_CODES),
    ):
        if not freq:
            freq[0] = 1
    g_codes = write_prefix_code(bw, build_lengths(g_freq, green_alphabet))
    r_codes = write_prefix_code(bw, build_lengths(r_freq, NUM_LITERALS))
    b_codes = write_prefix_code(bw, build_lengths(b_freq, NUM_LITERALS))
    a_codes = write_prefix_code(bw, build_lengths(a_freq, NUM_LITERALS))
    d_codes = write_prefix_code(bw, build_lengths(d_freq, NUM_DISTANCE_CODES))
    for ev in events:
        if ev[0] == "lit":
            p = ev[1]
            _write_code(bw, g_codes, (p >> 8) & 0xFF)
            _write_code(bw, r_codes, (p >> 16) & 0xFF)
            _write_code(bw, b_codes, p & 0xFF)
            _write_code(bw, a_codes, (p >> 24) & 0xFF)
        elif ev[0] == "ref":
            lcode, leb, lev = _lz77_split_value(ev[1])
            _write_code(bw, g_codes, NUM_LITERALS + lcode)
            if leb:
                bw.write(lev, leb)
            dcode, deb, dev = _lz77_split_value(ev[2])
            _write_code(bw, d_codes, dcode)
            if deb:
                bw.write(dev, deb)
        else:
            _write_code(bw, g_codes, NUM_LITERALS + NUM_LENGTH_CODES + ev[1])


# ----------------------------------------------------------- transforms ---

T_PREDICTOR, T_COLOR, T_SUBTRACT_GREEN, T_COLOR_INDEXING = 0, 1, 2, 3


def _split(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _join(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg2(p: tuple, q: tuple) -> tuple:
    return tuple((x + y) >> 1 for x, y in zip(p, q))


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _trunc_half(v: int) -> int:
    """C's (v)/2 — truncation toward zero, not Python's floor."""
    return -((-v) >> 1) if v < 0 else v >> 1


def _predict(mode: int, L: tuple, T: tuple, TL: tuple, TR: tuple) -> tuple:
    if mode == 0:
        return (0xFF, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select(T, L, TL): whichever of T/L is closer to TL+...
        pa_minus_pb = sum(
            abs(ell - tl) - abs(t - tl) for t, ell, tl in zip(T, L, TL)
        )
        return T if pa_minus_pb <= 0 else L
    if mode == 12:  # ClampAddSubtractFull
        return tuple(
            _clip255(ell + t - tl) for ell, t, tl in zip(L, T, TL)
        )
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        return tuple(
            _clip255(av + _trunc_half(av - tl)) for av, tl in zip(ave, TL)
        )
    raise ValueError(f"predictor mode {mode} out of range")


def _predictor_pass(
    img: list[int], w: int, h: int, modes: list[int], bits: int,
    forward: bool,
) -> list[int]:
    """Shared forward/inverse predictor walk. ``img`` is flat ARGB; the
    RECONSTRUCTED image feeds every neighbor (for the forward pass the
    two coincide — the transform is lossless). Border rules per spec:
    (0,0) mode 0, top row L, left column T, and the TR of a
    rightmost-column pixel is the LEFTMOST pixel of the SAME row."""
    mw = _subsample_size(w, bits)
    out = [0] * (w * h)
    recon = img if forward else out
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1
            elif x == 0:
                mode = 2
            else:
                mode = modes[(y >> bits) * mw + (x >> bits)]
            L = _split(recon[i - 1]) if x else (0, 0, 0, 0)
            T = _split(recon[i - w]) if y else (0, 0, 0, 0)
            TL = _split(recon[i - w - 1]) if (x and y) else (0, 0, 0, 0)
            if y == 0:
                TR = (0, 0, 0, 0)
            elif x == w - 1:
                TR = _split(recon[y * w])  # leftmost pixel, SAME row
            else:
                TR = _split(recon[i - w + 1])
            pred = _predict(mode, L, T, TL, TR)
            cur = _split(img[i])
            if forward:
                out[i] = _join(*(((c - p) & 0xFF) for c, p in zip(cur, pred)))
            else:
                out[i] = _join(*(((c + p) & 0xFF) for c, p in zip(cur, pred)))
    return out


def _s8(v: int) -> int:
    return v - 256 if v > 127 else v


def _cdelta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _color_pass(
    img: list[int], w: int, h: int, elements: list[int], bits: int,
    forward: bool,
) -> list[int]:
    """Cross-color transform (§4.2). Element pixel packs green_to_red
    in blue, green_to_blue in green, red_to_blue in red. The blue
    correction keys off the ORIGINAL red (encoder) / the RECONSTRUCTED
    red (decoder) — the same value, in that order."""
    mw = _subsample_size(w, bits)
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            e = elements[(y >> bits) * mw + (x >> bits)]
            g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
            a, r, g, b = _split(img[i])
            if forward:
                r2 = (r - _cdelta(g2r, g)) & 0xFF
                b2 = (b - _cdelta(g2b, g) - _cdelta(r2b, r)) & 0xFF
            else:
                r2 = (r + _cdelta(g2r, g)) & 0xFF
                b2 = (b + _cdelta(g2b, g) + _cdelta(r2b, r2)) & 0xFF
            out[i] = _join(a, r2, g, b2)
    return out


def _palette_xbits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


# ------------------------------------------------------------ top level ---


def decode_vp8l(payload: bytes) -> tuple[np.ndarray, dict]:
    """VP8L chunk payload (0x2F signature + 32-bit header + stream) ->
    ((h, w, 4) uint8 RGBA, meta). meta: {width, height, has_alpha,
    transforms (names in read order), cache_bits}."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L signature byte missing")
    br = BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read(1)
    if br.read(3) != 0:
        raise ValueError("unknown VP8L stream version")
    rgba, names, cache_bits_meta = _decode_stream(br, w, h)
    meta = {
        "width": w, "height": h, "has_alpha": bool(alpha_hint),
        "transforms": names, "cache_bits": cache_bits_meta,
    }
    return rgba, meta


def _decode_stream(br: "BitReader", w: int, h: int):
    """Headerless VP8L image stream (transform loop + entropy-coded
    pixels) -> ((h, w, 4) RGBA, transform names, cache_bits). Shared by
    the VP8L chunk decoder and the ALPH alpha-plane decoder (the WebP
    container spec carries alpha as exactly this stream, §Alpha)."""
    transforms: list[tuple] = []
    seen: set[int] = set()
    cur_w = w
    cache_bits_meta = 0
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L transform repeated")
        seen.add(ttype)
        if ttype == T_PREDICTOR:
            bits = br.read(3) + 2
            mw, mh = _subsample_size(cur_w, bits), _subsample_size(h, bits)
            sub = _read_spatial_image(br, mw, mh, False)
            modes = [(int(p) >> 8) & 0xFF for p in sub]
            if any(m > 13 for m in modes):
                raise ValueError("predictor mode out of range")
            transforms.append(("predictor", bits, modes))
        elif ttype == T_COLOR:
            bits = br.read(3) + 2
            mw, mh = _subsample_size(cur_w, bits), _subsample_size(h, bits)
            sub = _read_spatial_image(br, mw, mh, False)
            transforms.append(("color", bits, [int(p) for p in sub]))
        elif ttype == T_SUBTRACT_GREEN:
            transforms.append(("subtract-green",))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            raw = _read_spatial_image(br, n_colors, 1, False)
            pal: list[int] = []
            acc = 0
            for p in raw:  # entries are per-channel deltas off the previous
                a0, r0, g0, b0 = _split(acc)
                a1, r1, g1, b1 = _split(int(p))
                acc = _join(
                    (a0 + a1) & 0xFF, (r0 + r1) & 0xFF,
                    (g0 + g1) & 0xFF, (b0 + b1) & 0xFF,
                )
                pal.append(acc)
            xbits = _palette_xbits(n_colors)
            cur_w = _subsample_size(w, xbits)
            transforms.append(("palette", pal, xbits))
    names = [t[0] for t in transforms]
    if "palette" in names and ("predictor" in names or "color" in names):
        raise NotImplementedError(
            "COLOR_INDEXING combined with spatial transforms (the packed-"
            "width interaction): spec-legal, unseen in practice, refused"
        )
    img = [int(p) for p in _read_spatial_image(br, cur_w, h, True)]
    width = cur_w
    for t in reversed(transforms):  # last-read inverts first
        if t[0] == "predictor":
            img = _predictor_pass(img, width, h, t[2], t[1], forward=False)
        elif t[0] == "color":
            img = _color_pass(img, width, h, t[2], t[1], forward=False)
        elif t[0] == "subtract-green":
            out = []
            for p in img:
                a, r, g, b = _split(p)
                out.append(_join(a, (r + g) & 0xFF, g, (b + g) & 0xFF))
            img = out
        else:  # palette
            pal, xbits = t[1], t[2]
            bpp = 8 >> xbits
            mask = (1 << xbits) - 1
            out = []
            for y in range(h):
                for x in range(w):
                    packed = img[y * width + (x >> xbits)]
                    idx = ((packed >> 8) >> (bpp * (x & mask))) & ((1 << bpp) - 1)
                    out.append(pal[idx] if idx < len(pal) else 0)
            img = out
            width = w
    arr = np.array(img, dtype=np.uint32).reshape(h, w)
    rgba = np.stack(
        [
            (arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF,
            (arr >> 24) & 0xFF,
        ],
        axis=-1,
    ).astype(np.uint8)
    return rgba, names, cache_bits_meta


def decode_alph(body: bytes, w: int, h: int) -> np.ndarray:
    """WebP ``ALPH`` chunk -> (h, w) uint8 alpha plane.

    Header byte: bits 0-1 compression (0 raw, 1 the headerless VP8L
    stream whose GREEN channel is the alpha), bits 2-3 filtering
    (none/horizontal/vertical/gradient, inverted here), bits 4-5
    preprocessing (informative only)."""
    if not body:
        raise ValueError("empty ALPH chunk")
    compression = body[0] & 3
    filtering = (body[0] >> 2) & 3
    data = body[1:]
    if compression == 0:
        if len(data) < w * h:
            raise ValueError("raw ALPH plane truncated")
        plane = np.frombuffer(data[: w * h], dtype=np.uint8).reshape(h, w).copy()
    elif compression == 1:
        rgba, _names, _cb = _decode_stream(BitReader(data), w, h)
        plane = rgba[:, :, 1].copy()  # green carries alpha
    else:
        raise ValueError(f"reserved ALPH compression method {compression}")
    if filtering:
        p = plane.astype(np.int32)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif filtering == 1:  # horizontal
                    pred = p[y, x - 1] if x else p[y - 1, x]
                elif filtering == 2:  # vertical
                    pred = p[y - 1, x] if y else p[y, x - 1]
                else:  # gradient
                    if y == 0:
                        pred = p[y, x - 1]
                    elif x == 0:
                        pred = p[y - 1, x]
                    else:
                        g = int(p[y, x - 1]) + int(p[y - 1, x]) - int(p[y - 1, x - 1])
                        pred = 0 if g < 0 else (255 if g > 255 else g)
                p[y, x] = (p[y, x] + pred) & 0xFF
        plane = p.astype(np.uint8)
    return plane


def encode_vp8l(
    pixels,
    transforms: tuple[str, ...] = (),
    predictor_mode: int = 11,
    predictor_bits: int = 4,
    cache_bits: int = 0,
    use_lz77: bool = True,
    meta_split: bool = False,
) -> bytes:
    """(h, w, 3|4) uint8 -> VP8L chunk payload. ``transforms`` in stream
    order from 'subtract-green', 'predictor', 'color', 'palette'
    ('palette' only alone); 'predictor' uses one mode image-wide
    (``predictor_mode``), 'color' a fixed element; ``meta_split``
    codes the main image with TWO meta prefix groups through a real
    entropy image (literal-only, exclusive of cache/lz77) —
    correctness fixtures exercising every inverse path, not rate
    optimizers."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8 pixels")
    h, w = px.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dims must be 1..16384")
    if px.shape[2] == 3:
        alpha = np.full((h, w), 255, dtype=np.uint32)
    else:
        alpha = px[:, :, 3].astype(np.uint32)
    argb = (
        (alpha << 24)
        | (px[:, :, 0].astype(np.uint32) << 16)
        | (px[:, :, 1].astype(np.uint32) << 8)
        | px[:, :, 2].astype(np.uint32)
    )
    img = [int(p) for p in argb.reshape(-1)]
    has_alpha = bool((alpha != 255).any())

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version

    if "palette" in transforms and len(transforms) > 1:
        raise NotImplementedError("palette combines with no other transform")
    cur_w = w
    for name in transforms:
        bw.write(1, 1)  # another transform follows
        if name == "subtract-green":
            bw.write(T_SUBTRACT_GREEN, 2)
            out = []
            for p in img:
                a, r, g, b = _split(p)
                out.append(_join(a, (r - g) & 0xFF, g, (b - g) & 0xFF))
            img = out
        elif name == "predictor":
            if not 0 <= predictor_mode <= 13:
                raise ValueError("predictor mode must be 0..13")
            bw.write(T_PREDICTOR, 2)
            bw.write(predictor_bits - 2, 3)
            mw = _subsample_size(cur_w, predictor_bits)
            mh = _subsample_size(h, predictor_bits)
            modes = [predictor_mode] * (mw * mh)
            img = _predictor_pass(
                img, cur_w, h, modes, predictor_bits, forward=True
            )
            _write_spatial_image(
                bw, [m << 8 for m in modes], mw, mh, False
            )
        elif name == "color":
            bw.write(T_COLOR, 2)
            bits = 4
            bw.write(bits - 2, 3)
            mw = _subsample_size(cur_w, bits)
            mh = _subsample_size(h, bits)
            element = _join(0xFF, 0x04, 0xFA, 0x12)  # r2b, g2b, g2r
            elements = [element] * (mw * mh)
            img = _color_pass(img, cur_w, h, elements, bits, forward=True)
            _write_spatial_image(bw, elements, mw, mh, False)
        elif name == "palette":
            pal = sorted(set(img))
            if len(pal) > 256:
                raise ValueError("palette transform needs <= 256 colors")
            bw.write(T_COLOR_INDEXING, 2)
            bw.write(len(pal) - 1, 8)
            index = {p: i for i, p in enumerate(pal)}
            deltas = []
            prev = 0
            for p in pal:
                a0, r0, g0, b0 = _split(prev)
                a1, r1, g1, b1 = _split(p)
                deltas.append(
                    _join(
                        (a1 - a0) & 0xFF, (r1 - r0) & 0xFF,
                        (g1 - g0) & 0xFF, (b1 - b0) & 0xFF,
                    )
                )
                prev = p
            _write_spatial_image(bw, deltas, len(pal), 1, False)
            xbits = _palette_xbits(len(pal))
            bpp = 8 >> xbits
            mask = (1 << xbits) - 1
            cur_w = _subsample_size(w, xbits)
            packed = [0] * (cur_w * h)
            for y in range(h):
                for x in range(w):
                    at = y * cur_w + (x >> xbits)
                    packed[at] |= index[img[y * w + x]] << (
                        8 + bpp * (x & mask)
                    )
            # indices live in green; alpha byte mirrors a real encoder's
            # 0xff fill so literal coding stays unremarkable
            img = [(p & 0x00FFFF00) | 0xFF000000 for p in packed]
        else:
            raise ValueError(f"unknown transform {name!r}")
    bw.write(0, 1)  # no more transforms
    if meta_split:
        if cache_bits or not use_lz77:
            raise ValueError("meta_split composes with default coding only")
        _write_spatial_image_2groups(bw, img, cur_w, h)
    else:
        _write_spatial_image(
            bw, img, cur_w, h, True, cache_bits=cache_bits, use_lz77=use_lz77
        )
    return bw.getvalue()


def wrap_webp_lossless(vp8l_payload: bytes) -> bytes:
    """RIFF/WEBP container around a VP8L chunk payload."""
    pad = b"\x00" if len(vp8l_payload) % 2 else b""
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload + pad
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def decode_webp(payload: bytes) -> tuple[np.ndarray, dict]:
    """RIFF/WEBP -> ((h, w, 4) RGBA, meta). VP8L (lossless) decodes
    natively; lossy VP8 key frames decode through operators/vp8.py, with
    an optional ALPH chunk (a headerless VP8L stream) supplying alpha."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP framing missing)")
    pos = 12
    end = 8 + struct.unpack_from("<I", payload, 4)[0]
    alph_body = None
    while pos + 8 <= min(end, len(payload)):
        fourcc = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csize]
        if fourcc == b"ALPH":
            alph_body = body
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            from pyiceberg_lakehouse_spark.operators import vp8 as _vp8

            out = _vp8.decode_vp8_frame(body)
            rgb = _vp8.yuv_to_rgb(out["y"], out["u"], out["v"])
            w, h = out["width"], out["height"]
            alpha = (
                decode_alph(alph_body, w, h)
                if alph_body is not None
                else np.full((h, w), 255, np.uint8)
            )
            meta = {
                "width": w, "height": h,
                "has_alpha": alph_body is not None,
                "transforms": [], "cache_bits": 0, "codec": "vp8",
            }
            return np.dstack([rgb, alpha]), meta
        pos += 8 + csize + (csize % 2)
    raise ValueError("WebP carries no decodable image chunk")


def _write_spatial_image_2groups(
    bw: BitWriter, px: list[int], w: int, h: int, hbits: int = 2
) -> None:
    """Level-0 spatial image with TWO meta prefix groups split at the
    image midline via a real entropy image — the decode path real
    multi-entropy files take. Literal-only coding (runs crossing a
    group boundary would need split bookkeeping a fixture doesn't)."""
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # entropy image present
    bw.write(hbits - 2, 3)
    ew, eh = _subsample_size(w, hbits), _subsample_size(h, hbits)
    half = w // 2
    # group 1 for blocks whose first pixel sits in the right half
    entropy_px = [
        (0xFF << 24) | ((1 if (bx << hbits) >= half else 0) << 8)
        for _ in range(eh)
        for bx in range(ew)
    ]
    _write_spatial_image(bw, entropy_px, ew, eh, False)
    group_of = [
        1 if ((i % w) >> hbits << hbits) >= half else 0
        for i in range(w * h)
    ]
    # the reader sizes the group list from the entropy image's max index
    # — a degenerate split (image narrower than one block) has one group
    n_groups = max((p >> 8) & 0xFFFF for p in entropy_px) + 1
    alphabet = NUM_LITERALS + NUM_LENGTH_CODES
    all_codes = []
    for grp in range(n_groups):
        freqs: list[dict[int, int]] = [{} for _ in range(4)]
        for i, p in enumerate(px):
            if group_of[i] != grp:
                continue
            for fi, v in zip(
                freqs,
                ((p >> 8) & 0xFF, (p >> 16) & 0xFF, p & 0xFF, (p >> 24) & 0xFF),
            ):
                fi[v] = fi.get(v, 0) + 1
        for fi in freqs:
            if not fi:
                fi[0] = 1
        g = write_prefix_code(bw, build_lengths(freqs[0], alphabet))
        r = write_prefix_code(bw, build_lengths(freqs[1], NUM_LITERALS))
        b = write_prefix_code(bw, build_lengths(freqs[2], NUM_LITERALS))
        a = write_prefix_code(bw, build_lengths(freqs[3], NUM_LITERALS))
        d = write_prefix_code(bw, build_lengths({0: 1}, NUM_DISTANCE_CODES))
        all_codes.append((g, r, b, a, d))
    for i, p in enumerate(px):
        g, r, b, a, _ = all_codes[group_of[i]]
        _write_code(bw, g, (p >> 8) & 0xFF)
        _write_code(bw, r, (p >> 16) & 0xFF)
        _write_code(bw, b, p & 0xFF)
        _write_code(bw, a, (p >> 24) & 0xFF)


# ------------------------------------------------------ animated WebP ---
# The WebP Container Specification's animation layer: VP8X feature
# flags, ANIM (background color in BGRA byte order + 16-bit loop
# count), and ANMF frames (x/2 and y/2 in 24-bit fields — offsets must
# be even — dims minus one, 24-bit duration, and a flags byte carrying
# the blending method (bit 1: 1 = overwrite, 0 = alpha-blend) and the
# disposal method (bit 0: 1 = dispose to background color)). Frame
# pixels ride as VP8L chunks, so the lossless codec above does the
# pixel work; ALPH+VP8 (lossy) frames stay gated with VP8 itself.


def encode_webp_animation(
    frames: list[dict],
    canvas_w: int,
    canvas_h: int,
    background: tuple[int, int, int, int] = (255, 255, 255, 255),
    loop_count: int = 0,
    **vp8l_kwargs,
) -> bytes:
    """frames: [{x, y, pixels (h, w, 3|4) uint8, duration_ms,
    blend ('over'|'source'), dispose ('none'|'background')}] ->
    RIFF/WEBP bytes. Offsets must be even (the wire stores x/2, y/2)."""
    if not frames:
        raise ValueError("an animation needs at least one frame")
    if not 0 <= loop_count <= 0xFFFF:
        raise ValueError("loop_count must fit 16 bits")

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    body = chunk(
        b"VP8X",
        bytes([0x02 | 0x10])  # animation + alpha feature flags
        + b"\x00\x00\x00"
        + (canvas_w - 1).to_bytes(3, "little")
        + (canvas_h - 1).to_bytes(3, "little"),
    )
    r, g, b, a = background
    body += chunk(
        b"ANIM", bytes([b, g, r, a]) + struct.pack("<H", loop_count)
    )
    for f in frames:
        x, y = int(f["x"]), int(f["y"])
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even (stored halved)")
        px = np.asarray(f["pixels"], dtype=np.uint8)
        fh, fw = px.shape[:2]
        if x + fw > canvas_w or y + fh > canvas_h:
            raise ValueError("frame exceeds the canvas")
        if not 0 <= int(f["duration_ms"]) < 1 << 24:
            raise ValueError("duration must fit 24 bits")
        flags = (0x02 if f.get("blend", "over") == "source" else 0) | (
            0x01 if f.get("dispose", "none") == "background" else 0
        )
        sub = chunk(b"VP8L", encode_vp8l(px, **vp8l_kwargs))
        body += chunk(
            b"ANMF",
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + int(f["duration_ms"]).to_bytes(3, "little")
            + bytes([flags])
            + sub,
        )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def decode_webp_animation(payload: bytes) -> dict:
    """-> {width, height, loop_count, background (r, g, b, a),
    frames: [{x, y, width, height, duration_ms, blend, dispose,
    pixels (h, w, 4) uint8 RGBA}]}. Strict: VP8X must declare
    animation, ANIM must precede ANMF, frames must fit the canvas."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP framing missing)")
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    pos = 12
    canvas = None
    background = None
    loop_count = None
    frames: list[dict] = []
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            raise ValueError(f"WebP chunk {fourcc!r} exceeds the file")
        if fourcc == b"VP8X":
            if csize < 10:
                raise ValueError("VP8X chunk too small")
            if not body[0] & 0x02:
                raise ValueError("VP8X without the animation flag")
            canvas = (
                int.from_bytes(body[4:7], "little") + 1,
                int.from_bytes(body[7:10], "little") + 1,
            )
        elif fourcc == b"ANIM":
            if csize < 6:
                raise ValueError("ANIM chunk too small")
            background = (body[2], body[1], body[0], body[3])  # BGRA wire
            (loop_count,) = struct.unpack_from("<H", body, 4)
        elif fourcc == b"ANMF":
            if canvas is None or background is None:
                raise ValueError("ANMF before VP8X/ANIM")
            if csize < 16:
                raise ValueError("ANMF header too small")
            x = int.from_bytes(body[0:3], "little") * 2
            y = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            duration = int.from_bytes(body[12:15], "little")
            flags = body[15]
            if x + fw > canvas[0] or y + fh > canvas[1]:
                raise ValueError("ANMF frame exceeds the canvas")
            sub = body[16:]
            if sub[:4] == b"ALPH" or sub[:4] == b"VP8 ":
                raise NotImplementedError(
                    "lossy (VP8/ALPH) animation frames not supported"
                )
            if sub[:4] != b"VP8L":
                raise ValueError("ANMF frame without a VP8L chunk")
            (fsize,) = struct.unpack_from("<I", sub, 4)
            pixels, meta = decode_vp8l(sub[8 : 8 + fsize])
            if (meta["width"], meta["height"]) != (fw, fh):
                raise ValueError("ANMF dims disagree with the VP8L header")
            frames.append(
                {
                    "x": x, "y": y, "width": fw, "height": fh,
                    "duration_ms": duration,
                    "blend": "source" if flags & 0x02 else "over",
                    "dispose": "background" if flags & 0x01 else "none",
                    "pixels": pixels,
                }
            )
        pos += 8 + csize + (csize % 2)
    if canvas is None or not frames:
        raise ValueError("no animation frames found")
    return {
        "width": canvas[0], "height": canvas[1],
        "loop_count": loop_count, "background": background,
        "frames": frames,
    }


def compose_webp_animation(decoded: dict) -> list[dict]:
    """Apply the WebP animation model: the canvas starts filled with the
    ANIM background color; each frame alpha-blends (the spec's OVER,
    the exact integer port property-tested in tests/test_apng.py's
    float cross-check) or overwrites its rect; disposal refills the
    frame's rect with the background AFTER rendering. Returns one
    {frame_idx, duration_ms, canvas (h, w, 4)} per frame, the canvas
    as rendered for that frame."""
    cw, ch = decoded["width"], decoded["height"]
    bg = np.array(decoded["background"], dtype=np.uint8)
    canvas = np.tile(bg, (ch, cw, 1))
    out = []
    for i, f in enumerate(decoded["frames"]):
        x, y, w, h = f["x"], f["y"], f["width"], f["height"]
        region = canvas[y : y + h, x : x + w]
        src = f["pixels"].astype(np.int64)
        if f["blend"] == "source":
            region[:] = src.astype(np.uint8)
        else:  # OVER — same integer arithmetic as apng.compose_apng
            dst = region.astype(np.int64)
            sa = src[:, :, 3:4]
            da = dst[:, :, 3:4]
            oa_num = sa * 255 + da * (255 - sa)
            rgb_num = src[:, :, :3] * sa * 255 + dst[:, :, :3] * da * (
                255 - sa
            )
            rgb = np.where(
                oa_num > 0,
                (rgb_num + np.maximum(oa_num, 1) // 2)
                // np.maximum(oa_num, 1),
                0,
            )
            region[:, :, :3] = rgb.astype(np.uint8)
            region[:, :, 3] = ((oa_num + 127) // 255).astype(np.uint8)[
                :, :, 0
            ]
        out.append(
            {
                "frame_idx": i,
                "duration_ms": f["duration_ms"],
                "canvas": canvas.copy(),
            }
        )
        if f["dispose"] == "background":
            canvas[y : y + h, x : x + w] = bg
    return out
