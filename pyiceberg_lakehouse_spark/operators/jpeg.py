"""Baseline JPEG (ITU-T T.81 sequential DCT) codec in pure numpy.

The remaining compressed-image stub made real without any codec library:
encode = level-shift -> 8x8 orthonormal DCT (one matrix sandwich per
block) -> quality-scaled quantization -> zigzag -> DPCM DC + run/size AC
-> canonical Huffman with byte stuffing; decode inverts every stage,
reading quantization and Huffman tables FROM the stream (so files from
other encoders with optimal tables decode too).

Scope (honest gates, same stance as the PNG codec): 8-bit baseline
sequential, grayscale or YCbCr at 4:4:4, 4:2:2, or 4:2:0 chroma
subsampling (any integer-ratio Hi x Vi factors decode; the encoder
emits the three standard schemes), with restart intervals (DRI/RSTm)
on both encode and decode, multi-scan (non-interleaved color) baseline
streams, and 8- or 16-bit quantization tables; PROGRESSIVE streams
(SOF2) dispatch to the multi-scan decoder in
operators/jpeg_progressive.py; LOSSLESS streams (SOF3, T.81 process
14) encode and decode natively below — all seven spatial predictors,
2-16-bit precision (uint16 above 8 bits), point transforms
(near-lossless low-bit drop, H.2.1), multi-scan non-interleaved
streams and restart intervals (DRI/RSTm with the H.1.2.2 prediction
reset, mid-row boundaries included), bit-exact on the kept bits;
arithmetic coding and subsampled lossless components raise
NotImplementedError. The emitted Huffman
tables are flat 8-bit canonical codes — deliberately suboptimal for
SIZE but trivially correct, and legal because the tables travel in DHT
segments (a decoder never assumes Annex K defaults).

Self-validation strategy (no reference codec in this container): the
stages that could hide a matched encoder/decoder bug are pinned
independently — the DCT matrix is checked orthonormal, the zigzag table
against a generated spiral, the color transform against hand-computed
BT.601 constants — and round-trips assert pixel error bounded by the
quantization step (flat blocks reconstruct near-exactly: only the DC
coefficient is nonzero and its quantizer is known).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------- constants -----

# zigzag scan order: index i holds the (row*8+col) position of the i-th
# coefficient in scan order (T.81 figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K base quantization tables (public constants)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: forward F = D @ B @ D.T."""
    D = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
        for x in range(8):
            D[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return D


_D = _dct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K base tables (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


# flat canonical Huffman: every symbol gets an 8-bit code (Kraft-feasible
# for <= 255 symbols, and code values stay below 0xFF so no all-ones code)
_DC_SYMBOLS = list(range(12))  # DC size categories 0..11
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _flat_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """(BITS[16], HUFFVAL) with every symbol at length 8."""
    assert len(symbols) < 255
    bits = [0] * 16
    bits[7] = len(symbols)  # length 8 -> index 7
    return bits, list(symbols)


def _codes_from_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 Annex C): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81
        return bytes(self.buf)

    def restart(self, m: int) -> None:
        """Byte-align (1-bit padding) and emit RSTm — written RAW, never
        byte-stuffed (it is a real marker, T.81 B.2.1.2)."""
        self.flush()
        self.buf += bytes([0xFF, 0xD0 + (m & 7)])


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self.acc = (self.acc << 8) | byte
            self.n += 8
        out = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return out

    def align_restart(self, expect: int) -> None:
        """Drop padding bits to the byte boundary and consume the expected
        RSTm marker (T.81 E.2.4: markers restart modulo 8)."""
        self.acc = 0
        self.n = 0
        tag = self.data[self.pos : self.pos + 2]
        if tag != bytes([0xFF, 0xD0 + (expect & 7)]):
            raise ValueError(
                f"missing restart marker RST{expect & 7} in entropy stream"
            )
        self.pos += 2


def _entropy_span(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Slice the entropy-coded bytes starting at ``pos``: they end at the
    first 0xFF followed by a real marker (stuffed 0xFF00 passes through;
    RSTm markers belong to the scan's entropy data and are consumed by
    the reader's restart alignment)."""
    i = pos
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return payload[pos:i], i
        i += 1
    return payload[pos:n], n


class _Geometry:
    """Per-component block geometry for a (possibly subsampled) frame.

    ``bym/bxm``: the MCU-ALIGNED grid each component's coefficient array
    covers (mcuy*Vi x mcux*Hi blocks — T.81 A.2.4 pads to whole MCUs);
    ``byn/bxn``: the component's OWN block grid (ceil of its true sample
    dims / 8), the grid NON-INTERLEAVED scans walk (A.2.2). For 4:4:4
    the two coincide."""

    def __init__(self, h: int, w: int, samps: list[int]) -> None:
        self.h, self.w = h, w
        self.hs = [(s >> 4) or 1 for s in samps]
        self.vs = [(s & 0x0F) or 1 for s in samps]
        self.hmax, self.vmax = max(self.hs), max(self.vs)
        if any(
            self.hmax % x or self.vmax % y
            for x, y in zip(self.hs, self.vs)
        ):
            raise NotImplementedError(
                "fractional chroma sampling ratios unsupported"
            )
        self.mcuy = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        self.mcux = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.bym = [self.mcuy * v for v in self.vs]
        self.bxm = [self.mcux * x for x in self.hs]
        self.hpx = [
            (h * v + self.vmax - 1) // self.vmax for v in self.vs
        ]
        self.wpx = [
            (w * x + self.hmax - 1) // self.hmax for x in self.hs
        ]
        self.byn = [(p + 7) // 8 for p in self.hpx]
        self.bxn = [(p + 7) // 8 for p in self.wpx]

    def noninterleaved_blocks(self, idx: int) -> list[int]:
        """Coefficient-array indices a non-interleaved scan visits, in
        raster order over the component's OWN grid (MCU-padding blocks
        beyond it are not coded in such a scan)."""
        bxm = self.bxm[idx]
        return [
            r * bxm + c
            for r in range(self.byn[idx])
            for c in range(self.bxn[idx])
        ]

    def interleaved_blocks(
        self, scan_comps: list[tuple[int, int, int]]
    ) -> list[tuple[int, int]]:
        """(component, coefficient-array index) pairs in MCU-interleaved
        order: per MCU, each component contributes its Vi x Hi raster."""
        out = []
        for my in range(self.mcuy):
            for mx in range(self.mcux):
                for idx, _dct, _act in scan_comps:
                    hi, vi = self.hs[idx], self.vs[idx]
                    for v in range(vi):
                        for hb in range(hi):
                            out.append(
                                (idx, (my * vi + v) * self.bxm[idx] + mx * hi + hb)
                            )
        return out



def _huff_decode(r: _BitReader, decode: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | r.read(1)
        length += 1
        sym = decode.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    # positive: value itself; negative: ones-complement (v - 1 in 2's)
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """Full-range BT.601 (JFIF): Y in [0,255], Cb/Cr centered at 128."""
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def _blocks(channel: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a (h, w) plane to 8-multiples by edge replication and cut into
    (n_blocks_y, n_blocks_x, 8, 8)."""
    h, w = channel.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(channel, ((0, H - h), (0, W - w)), mode="edge")
    by, bx = H // 8, W // 8
    return (
        padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3),
        by,
        bx,
    )


def _blocks_grid(channel: np.ndarray, by: int, bx: int) -> np.ndarray:
    """Like _blocks but padded to an EXPLICIT (by, bx) block grid — the
    MCU-aligned grid a subsampled component must fill (T.81 A.2.4 pads
    the frame to complete MCUs, not just complete blocks)."""
    h, w = channel.shape
    padded = np.pad(
        channel, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge"
    )
    return padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Deterministic box-mean chroma downsample by integer factors,
    edge-replicating odd trailing rows/columns first."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    H, W = (h + fy - 1) // fy * fy, (w + fx - 1) // fx * fx
    p = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    return p.reshape(H // fy, fy, W // fx, fx).mean(axis=(1, 3))


# subsampling name -> per-component (Hi, Vi) sampling factors (Y, Cb, Cr)
_SUBSAMPLING = {
    "4:4:4": [(1, 1), (1, 1), (1, 1)],
    "4:2:2": [(2, 1), (1, 1), (1, 1)],
    "4:2:0": [(2, 2), (1, 1), (1, 1)],
}


def encode_jpeg(
    pixels,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JPEG bytes.

    ``subsampling``: "4:4:4" (default), "4:2:2" (chroma halved
    horizontally), or "4:2:0" (chroma halved both ways) — the scheme the
    vast majority of real-world JPEGs use. Chroma is box-mean
    downsampled; blocks are emitted MCU-interleaved with per-component
    Hi x Vi factors per T.81 A.2.3. Ignored for grayscale.

    ``restart_interval`` > 0 emits a DRI segment and an RSTm marker every
    that many MCUs (byte-aligned, DC predictors reset) — the
    error-resilience feature most camera JPEGs carry."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qt_l, qt_c = quality_tables(quality)
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    if gray:
        planes = [px.astype(np.float64)]
        qts = [qt_l]
        qt_ids = [0]
        hv = [(1, 1)]
    else:
        hv = _SUBSAMPLING[subsampling]
        hmax = max(x for x, _ in hv)
        vmax = max(y for _, y in hv)
        ycc = rgb_to_ycbcr(px)
        planes = [
            _box_downsample(ycc[..., i], vmax // vi, hmax // hi)
            for i, (hi, vi) in enumerate(hv)
        ]
        qts = [qt_l, qt_c, qt_c]
        qt_ids = [0, 1, 1]

    dc_bits, dc_vals = _flat_table(_DC_SYMBOLS)
    ac_bits, ac_vals = _flat_table(_AC_SYMBOLS)
    dc_codes = _codes_from_table(dc_bits, dc_vals)
    ac_codes = _codes_from_table(ac_bits, ac_vals)

    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag coefficients per component over its MCU-aligned
    # block grid (mcuy*Vi x mcux*Hi blocks)
    comp_coeffs = []
    comp_bx = []
    for plane, qt, (hi, vi) in zip(planes, qts, hv):
        byi, bxi = mcuy * vi, mcux * hi
        blocks = _blocks_grid(plane, byi, bxi)
        shifted = blocks - 128.0
        dct = np.einsum("ux,ybxc,vc->ybuv", _D, shifted, _D, optimize=True)
        quant = np.round(dct / qt).astype(np.int64)
        comp_coeffs.append(quant.reshape(byi * bxi, 64)[:, ZIGZAG])
        comp_bx.append(bxi)

    def _emit(wtr, preds, ci, zz):
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        size = _category(diff)
        code, length = dc_codes[size]
        wtr.write(code, length)
        if size:
            wtr.write(_amplitude_bits(diff, size), size)
        run = 0
        last_nz = int(np.max(np.nonzero(zz[1:])[0])) + 1 if np.any(zz[1:]) else 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                wtr.write(c, ln)  # ZRL
                run -= 16
            size = _category(v)
            c, ln = ac_codes[(run << 4) | size]
            wtr.write(c, ln)
            wtr.write(_amplitude_bits(v, size), size)
            run = 0
        if last_nz < 63:
            c, ln = ac_codes[0x00]
            wtr.write(c, ln)  # EOB

    wtr = _BitWriter()
    preds = [0] * len(planes)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                wtr.restart((mcu_n // restart_interval - 1) % 8)
                preds = [0] * len(planes)
            mcu_n += 1
            for ci, (hi, vi) in enumerate(hv):
                for v in range(vi):
                    for hb in range(hi):
                        m = (my * vi + v) * comp_bx[ci] + (mx * hi + hb)
                        _emit(wtr, preds, ci, comp_coeffs[ci][m])

    out = bytearray(b"\xff\xd8")  # SOI
    for tid, qt in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        body = bytes([tid]) + bytes(
            int(qt.reshape(64)[ZIGZAG[i]]) for i in range(64)
        )
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = hv[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qt_ids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w) or (h, w, 3) uint8 (RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qt_id)
    h = w = 0
    restart_interval = 0
    scans: list[tuple[list[tuple[int, int, int]], bytes, int]] = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2 fill bytes before a marker
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + seglen
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq not in (0, 1):
                    raise ValueError(f"corrupt JPEG (DQT precision {pq})")
                # pq=1: 16-bit big-endian table entries (T.81 B.2.4.1) —
                # used by very-high-quality foreign encoders
                if pq:
                    zz = np.frombuffer(
                        body[off + 1 : off + 129], dtype=">u2"
                    ).astype(np.float64)
                else:
                    zz = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8)
                t = np.zeros(64)
                t[ZIGZAG] = zz
                qts[tq] = t.reshape(8, 8)
                off += 129 if pq else 65
        elif marker == 0xC2:
            # progressive DCT: delegate the WHOLE stream to the
            # multi-scan decoder (operators/jpeg_progressive.py)
            from pyiceberg_lakehouse_spark.operators.jpeg_progressive import (
                decode_progressive,
            )

            return decode_progressive(payload)
        elif marker == 0xC3:
            # lossless (process 14): delegate the whole stream to the
            # predictive decoder below
            return decode_jpeg_lossless(payload)
        elif marker in (0xC1, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) unsupported"
            )
        elif marker == 0xC0:
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append((cid, samp, tq))
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                codes = _codes_from_table(bits, vals)
                huff[(tc, th)] = {(ln, c): s for s, (c, ln) in codes.items()}
                off += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cid, tabs = body[1 + si * 2 : 3 + si * 2]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan_comps.append((idx, tabs >> 4, tabs & 0x0F))
            if tuple(body[1 + ns * 2 : 4 + ns * 2]) != (0, 63, 0):
                raise NotImplementedError("progressive scan unsupported")
            data, pos = _entropy_span(payload, pos)
            # DRI may change between scans; capture its value per scan
            scans.append((scan_comps, data, restart_interval))
    if not scans or not comps:
        raise ValueError("corrupt JPEG (no scan data)")
    geom = _Geometry(h, w, [c[1] for c in comps])
    seen = set()
    for scan_comps, _d, _ri in scans:
        seen.update(idx for idx, _, _ in scan_comps)
    if len(seen) < len(comps):
        raise ValueError("corrupt JPEG (components never scanned)")
    planes = {
        idx: np.zeros((geom.bym[idx] * 8, geom.bxm[idx] * 8))
        for idx in range(len(comps))
    }
    for scan_comps, data, ri in scans:
        _decode_baseline_scan(
            _BitReader(data), planes, qts, huff, comps, scan_comps, geom, ri
        )
    # crop each component to its true sample dims, then nearest-neighbor
    # upsample back to full resolution (the JFIF simple upsampling)
    full = []
    for idx in range(len(comps)):
        p = planes[idx][: geom.hpx[idx], : geom.wpx[idx]]
        fy, fx = geom.vmax // geom.vs[idx], geom.hmax // geom.hs[idx]
        if fy != 1 or fx != 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    out = ycbcr_to_rgb(np.stack(full, axis=-1))
    return out.astype(np.uint8)


def _decode_baseline_scan(
    r, planes, qts, huff, comps, scan_comps, geom, restart_interval
) -> None:
    """One sequential-DCT scan: interleaved (all components, MCU order)
    or non-interleaved (one component, its own grid — the multi-scan
    baseline shape some encoders emit). DC predictors are per scan."""
    preds = {idx: 0 for idx, _, _ in scan_comps}

    def _block(idx: int, dc_tab, ac_tab) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int64)
        size = _huff_decode(r, dc_tab)
        diff = _extend(r.read(size), size) if size else 0
        preds[idx] += diff
        zz[0] = preds[idx]
        k = 1
        while k < 64:
            sym = _huff_decode(r, ac_tab)
            if sym == 0x00:
                break  # EOB
            if sym == 0xF0:
                k += 16
                continue
            k += sym >> 4
            size = sym & 0x0F
            if k > 63:
                raise ValueError("corrupt JPEG (AC index overflow)")
            zz[k] = _extend(r.read(size), size)
            k += 1
        block = np.zeros(64)
        block[ZIGZAG] = zz
        freq = block.reshape(8, 8) * qts[comps[idx][2]]
        return _D.T @ freq @ _D + 128.0

    tabs = {idx: (huff[(0, d)], huff[(1, a)]) for idx, d, a in scan_comps}
    if len(scan_comps) == 1:
        only = scan_comps[0][0]
        walk = [(only, b) for b in geom.noninterleaved_blocks(only)]
        per_mcu = 1
    else:
        walk = geom.interleaved_blocks(scan_comps)
        per_mcu = sum(geom.hs[idx] * geom.vs[idx] for idx, _, _ in scan_comps)
    mcu_n = 0
    for i, (idx, b) in enumerate(walk):
        if i % per_mcu == 0:
            if (
                restart_interval
                and mcu_n
                and mcu_n % restart_interval == 0
            ):
                r.align_restart(mcu_n // restart_interval - 1)
                preds = {k: 0 for k in preds}
            mcu_n += 1
        bxm = geom.bxm[idx]
        br, bc = b // bxm, b % bxm
        planes[idx][br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8] = _block(
            idx, *tabs[idx]
        )


def jpeg_sampling(payload: bytes) -> str:
    """Chroma subsampling declared in the frame header: "4:4:4", "4:2:2",
    "4:2:0", "gray", or "HxV,..." for non-standard factor sets — without
    full decode."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 fill bytes before a marker
        if pos + 4 > len(payload):
            break
        marker = payload[pos + 1]
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC2):
            body = payload[pos + 4 : pos + 2 + seglen]
            ncomp = body[5]
            if ncomp == 1:
                return "gray"
            samps = [body[6 + ci * 3 + 1] for ci in range(ncomp)]
            for name, hv in _SUBSAMPLING.items():
                if ncomp == 3 and samps == [(hi << 4) | vi for hi, vi in hv]:
                    return name
            return ",".join(f"{s >> 4}x{s & 0x0F}" for s in samps)
        if marker in (0xDA, 0xD9):
            break
        pos += 2 + seglen
    raise ValueError("corrupt JPEG (no frame header)")


def jpeg_header(payload: bytes) -> tuple[int, int, int]:
    """Frame-header parse (SOF0/SOF2/SOF3) -> (width, height,
    n_components) without full decode."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 fill bytes before a marker
        if pos + 4 > len(payload):
            break
        marker = payload[pos + 1]
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC2, 0xC3):  # baseline/progressive/lossless
            body = payload[pos + 4 : pos + 2 + seglen]
            if len(body) < 6:
                raise ValueError("truncated SOF header")
            h, w = struct.unpack(">HH", body[1:5])
            return w, h, body[5]
        if marker == 0xDA or marker == 0xD9:
            break
        pos += 2 + seglen
    raise ValueError("corrupt JPEG (no SOF0 header)")


# ------------------------------------------------- lossless JPEG (SOF3) ---
# T.81 process 14: predictive lossless coding. No DCT, no quantization —
# each sample's prediction residual (one of the seven spatial predictors,
# H.1.2.1) is Huffman-coded with the DC category+amplitude machinery the
# baseline codec already has. Closes the "lossless JPEG honestly gated"
# capability: medical/archival corpora carry SOF3 files a curation
# pipeline must read bit-exactly.

_LL_PREDICTORS = (1, 2, 3, 4, 5, 6, 7)


def _ll_predict(
    s: "np.ndarray",
    y: int,
    x: int,
    psel: int,
    p_bits: int,
    ry: int = 0,
    rx: int = 0,
) -> int:
    """T.81 H.1: first sample 2^(P-1); rest of the first line predictor 1
    (left); first column of later lines predictor 2 (above); elsewhere the
    selected predictor. ``(ry, rx)`` is the restart-interval origin —
    T.81 H.1.2.2 resets prediction at the start of every restart interval
    exactly as at the start of the scan, so the interval's first sample
    takes the default and the remainder of its first line takes predictor
    1; callers only pass positions at or after the origin in scan order.
    ``s`` holds reconstructed samples (== originals: lossless), so encoder
    and decoder compute identical predictions."""
    if y == ry:
        return int(s[y, x - 1]) if x > rx else 1 << (p_bits - 1)
    if x == 0:
        return int(s[y - 1, 0])
    a, b, c = int(s[y, x - 1]), int(s[y - 1, x]), int(s[y - 1, x - 1])
    if psel == 1:
        return a
    if psel == 2:
        return b
    if psel == 3:
        return c
    if psel == 4:
        return a + b - c
    if psel == 5:
        return a + ((b - c) >> 1)
    if psel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1  # psel == 7


def encode_jpeg_lossless(
    px: "np.ndarray",
    predictor: int = 4,
    precision: int | None = None,
    point_transform: int = 0,
    interleaved: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """Lossless JPEG (SOF3) encode: (h, w) or (h, w, nc) uint8/uint16 ->
    bit-exact recoverable bytes. Components are coded independently
    (no color transform — lossless JPEG stores samples as given),
    interleaved sample-by-sample in one scan; one shared DC Huffman
    table covers categories 0-16. ``precision`` defaults to the dtype
    width (8 for uint8, 16 for uint16); pass 12 for the medical-imagery
    range — samples must fit the declared bits. ``point_transform``
    (Al, T.81 H.2.1) drops that many low bits before coding — the
    near-lossless knob: the decoder restores the shift, so the
    roundtrip is exact on the kept bits ((x >> Pt) << Pt).
    ``interleaved=False`` emits one scan per component (the multi-scan
    shape some foreign lossless encoders produce) instead of one
    interleaved scan. ``restart_interval`` > 0 emits a DRI segment and
    an RSTm marker every that-many MCUs (one MCU = one sample position,
    T.81 H.2.4); prediction resets at each interval start per H.1.2.2,
    so intervals need not align with row boundaries."""
    if predictor not in _LL_PREDICTORS:
        raise ValueError(f"predictor must be 1-7, got {predictor}")
    arr = np.asarray(px)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype == np.uint8:
        precision = precision or 8
    elif arr.dtype == np.uint16:
        precision = precision or 16
    else:
        raise ValueError("uint8 or uint16 samples only")
    if not 2 <= precision <= 16:
        raise ValueError(f"precision must be 2-16, got {precision}")
    if int(arr.max(initial=0)) >= (1 << precision):
        raise ValueError(
            f"samples exceed the declared {precision}-bit precision"
        )
    if not 0 <= point_transform < precision:
        raise ValueError(
            f"point transform must be in [0, {precision}), got {point_transform}"
        )
    h, w, nc = arr.shape
    planes = arr.astype(np.int64) >> point_transform
    pbits = precision - point_transform  # coded precision after the shift

    bits, vals = _flat_table(list(range(17)))
    codes = _codes_from_table(bits, vals)

    def _scan_entropy(channels: list[int]) -> bytes:
        wr = _BitWriter()
        mcu_n = 0
        ry = rx = 0  # current restart interval's origin (scan start)
        for y in range(h):
            for x in range(w):
                # one MCU = one sample position (all of the scan's
                # components at it, T.81 H.2.4) — restart boundaries sit
                # between MCUs, so mid-row restarts are legal
                if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                    wr.restart((mcu_n // restart_interval - 1) % 8)
                    ry, rx = y, x
                mcu_n += 1
                for c in channels:
                    pred = _ll_predict(
                        planes[:, :, c], y, x, predictor, pbits, ry, rx
                    )
                    v = (int(planes[y, x, c]) - pred) & 0xFFFF
                    signed = v - 65536 if v >= 32768 else v
                    if signed == -32768:
                        code, ln = codes[16]  # SSSS=16: no amplitude bits
                        wr.write(code, ln)
                        continue
                    cat = _category(signed)
                    code, ln = codes[cat]
                    wr.write(code, ln)
                    if cat:
                        wr.write(_amplitude_bits(signed, cat), cat)
        return wr.flush()

    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00]) + bytes(bits) + bytes(vals)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sof = bytearray([precision]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])  # Hi=Vi=1; Tq meaningless in SOF3
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + bytes(sof)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    scan_groups = [list(range(nc))] if interleaved else [[c] for c in range(nc)]
    for group in scan_groups:
        sos = bytearray([len(group)])
        for ci in group:
            sos += bytes([ci + 1, 0x00])  # all components -> DC table 0
        # Ss=predictor, Se=0, Ah=0 / Al=point transform
        sos += bytes([predictor, 0, point_transform & 0x0F])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + bytes(sos)
        out += _scan_entropy(group)
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_lossless(payload: bytes) -> "np.ndarray":
    """Lossless JPEG (SOF3) decode -> (h, w) or (h, w, nc) uint8
    (precision <= 8) or uint16 (9-16 bits, the medical-imagery range),
    bit-exact. Supports any predictor 1-7, point transforms (Al > 0,
    T.81 H.2.1 — the decoder restores the shift), multi-component
    interleaved and per-component multi-scan streams, and restart
    intervals (DRI/RSTm, byte-aligned, sequence-validated, prediction
    reset per H.1.2.2 — mid-row restarts included); subsampled
    components (Hi/Vi != 1) and arithmetic coding stay gated (raise,
    never guess)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    precision = 8
    restart_interval = 0
    comps: list[int] = []  # component ids in SOF order
    scans: list[tuple[list[tuple[int, int]], int, int, int, bytes]] = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + seglen
        if marker == 0xC3:
            if len(body) < 6 or len(body) < 6 + 3 * body[5]:
                raise ValueError("truncated SOF3 component list")
            precision = body[0]
            if not (2 <= precision <= 16):
                raise ValueError(f"bad lossless precision {precision}")
            h, w = struct.unpack(">HH", body[1:5])
            comps = [body[6 + ci * 3] for ci in range(body[5])]
            # T.81 allows subsampled components in SOF3, but this decoder
            # walks a full h*w raster per component — gate up front
            # instead of failing late with a misleading truncation error.
            for ci in range(body[5]):
                if body[6 + ci * 3 + 1] != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless components (Hi/Vi != 1) "
                        "unsupported"
                    )
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                tbits = list(body[off + 1 : off + 17])
                nv = sum(tbits)
                tvals = list(body[off + 17 : off + 17 + nv])
                codes = _codes_from_table(tbits, tvals)
                # key by (tc, th): a stray AC-class table (tc=1) with the
                # same id must not clobber the DC table lossless scans use
                huff[(tc, th)] = {
                    (ln, c): s for s, (c, ln) in codes.items()
                }
                off += 17 + nv
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            sc = []
            for si in range(ns):
                cid, tabs = body[1 + si * 2 : 3 + si * 2]
                if (0, tabs >> 4) not in huff:
                    raise ValueError(
                        f"scan references undefined DC table {tabs >> 4}"
                    )
                sc.append((comps.index(cid), tabs >> 4))
            psel, _se, ahal = body[1 + ns * 2 : 4 + ns * 2]
            if psel not in _LL_PREDICTORS:
                raise ValueError(f"bad lossless predictor {psel}")
            if (ahal & 0x0F) >= precision:
                raise ValueError("point transform >= sample precision")
            data, pos = _entropy_span(payload, pos)
            # DRI applies to scans that FOLLOW it (and can change between
            # scans), so snapshot the active value per scan
            scans.append((sc, psel, ahal & 0x0F, restart_interval, data))
    if not scans or not comps or not h:
        raise ValueError("corrupt lossless JPEG (no scan)")
    covered = [idx for sc, _p, _a, _ri, _d in scans for idx, _th in sc]
    if sorted(covered) != list(range(len(comps))):
        raise ValueError(
            "lossless scans must cover every component exactly once"
        )
    nc = len(comps)
    planes = np.zeros((h, w, nc), dtype=np.int64)
    pts = [0] * nc
    # each scan decodes independently: interleaved (all components per
    # sample position) or non-interleaved per-component raster — the
    # multi-scan shape foreign lossless encoders emit. Predictor, point
    # transform and restart interval are per-scan properties.
    for sc, psel, pt, ri, data in scans:
        r = _BitReader(data)
        mcu_n = 0
        ry = rx = 0  # current restart interval's origin
        for y in range(h):
            for x in range(w):
                # one MCU = one sample position (T.81 H.2.4); at each
                # boundary the RSTm sequence number is validated and
                # prediction resets to the interval origin (H.1.2.2)
                if ri and mcu_n and mcu_n % ri == 0:
                    r.align_restart(mcu_n // ri - 1)
                    ry, rx = y, x
                mcu_n += 1
                for idx, th in sc:
                    ssss = _huff_decode(r, huff[(0, th)])
                    if ssss == 16:
                        diff = 32768
                    elif ssss:
                        diff = _extend(r.read(ssss), ssss)
                    else:
                        diff = 0
                    pred = _ll_predict(
                        planes[:, :, idx], y, x, psel, precision - pt, ry, rx
                    )
                    planes[y, x, idx] = (pred + diff) & 0xFFFF
        for idx, _th in sc:
            pts[idx] = pt
    dtype = np.uint8 if precision <= 8 else np.uint16
    # T.81 H.2.1: the decoder restores the point-transform shift
    for idx in range(nc):
        planes[:, :, idx] <<= pts[idx]
    out = planes.astype(dtype)
    return out[:, :, 0] if nc == 1 else out
