"""FLAC codec in pure stdlib — the lossless format speech/audio
training corpora (LibriSpeech and kin) actually ship.

Implements the real bitstream, not a header probe: STREAMINFO +
VORBIS_COMMENT + PADDING metadata walk, frame sync and header
(UTF-8-coded frame numbers, blocksize/sample-rate/sample-size codes,
CRC-8), all four channel assignments (independent, left/side,
right/side, mid/side — the side channel carries bits+1 per spec),
all subframe types (CONSTANT, VERBATIM, FIXED orders 0..4, LPC with
quantized coefficients and signed shift), wasted-bits shifting,
partitioned Rice residuals (4-bit parameters, the 0b1111 escape to
raw two's-complement), and the frame CRC-16. Decoded audio is
verified against STREAMINFO's MD5 of the interleaved little-endian
samples — the same end-to-end check `flac -t` performs.

The encoder half exists so correctness is provable with closed-form
oracles: it emits deterministic streams cycling every decode path and
is NOT a compressing encoder anyone should ship (it picks the
subframe type it is told to, not the cheapest one).

Honest gates (raise, never guess): sample sizes other than 8/16/24,
Rice method 1 (5-bit parameters), variable-blocksize streams, and
SEEKTABLE/CUESHEET/PICTURE blocks are skipped structurally but their
lengths must parse.

Reference parity: ashkangoleh/pyiceberg-lakehouse stores audio rows
as opaque binary (main-daft.py:68); this engine decodes them.
"""

from __future__ import annotations

import hashlib
import struct

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (FLAC frame header)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (FLAC whole frame)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            out = (out << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if v >= 1 << (bits - 1):
            v -= 1 << bits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_number(w: _BitWriter, n: int) -> None:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        w.write(n, 8)
        return
    # k continuation bytes carry (5 - k) + 6k + 1 payload bits
    for k in range(1, 6):
        if n < (1 << (5 - k + 6 * k + 1)):
            head = (0xFF << (7 - k)) & 0xFF
            w.write(head | (n >> (6 * k)), 8)
            for i in range(k - 1, -1, -1):
                w.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("frame number too large")


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    k = 0
    mask = 0x40
    while b0 & mask:
        k += 1
        mask >>= 1
    if k == 0:
        raise ValueError("bad UTF-8 coded frame number")
    n = b0 & (mask - 1)
    for _ in range(k):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        n = (n << 6) | (c & 0x3F)
    return n


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u >> 1) + 1)


def _write_rice_partitioned(
    w: _BitWriter,
    residuals: list[int],
    blocksize: int,
    pred_order: int,
    part_order: int,
    rice_param: int,
    escape_rawbits: int | None = None,
) -> None:
    w.write(0, 2)  # residual coding method 0: 4-bit rice
    w.write(part_order, 4)
    nparts = 1 << part_order
    idx = 0
    for p in range(nparts):
        n = (blocksize >> part_order) - (pred_order if p == 0 else 0)
        if escape_rawbits is not None:
            w.write(0xF, 4)
            w.write(escape_rawbits, 5)
            for _ in range(n):
                w.write_signed(residuals[idx], escape_rawbits)
                idx += 1
        else:
            w.write(rice_param, 4)
            for _ in range(n):
                u = _zigzag(residuals[idx])
                w.write_unary(u >> rice_param)
                w.write(u & ((1 << rice_param) - 1), rice_param)
                idx += 1
    assert idx == len(residuals)


def _read_rice_partitioned(
    r: _BitReader, blocksize: int, pred_order: int
) -> list[int]:
    method = r.read(2)
    if method == 1:
        raise NotImplementedError(
            "FLAC Rice method 1 (5-bit parameters) is not supported"
        )
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    part_order = r.read(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("block size not divisible by partition count")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> part_order) - (pred_order if p == 0 else 0)
        param = r.read(4)
        if param == 0xF:  # escape: raw two's complement
            rawbits = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(rawbits))
        else:
            for _ in range(n):
                q = r.read_unary()
                rem = r.read(param)
                out.append(_unzigzag((q << param) | rem))
    return out


def _predict_fixed(order: int, warm: list[int], residuals: list[int]) -> list[int]:
    out = list(warm)
    coeffs = _FIXED_COEFFS[order]
    for res in residuals:
        pred = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
        out.append(pred + res)
    return out


def _predict_lpc(
    warm: list[int], residuals: list[int], coeffs: list[int], shift: int
) -> list[int]:
    out = list(warm)
    for res in residuals:
        acc = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
        out.append((acc >> shift) + res)
    return out


# ---------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------


def _encode_subframe(
    w: _BitWriter,
    samples: list[int],
    bits: int,
    *,
    subframe: str,
    fixed_order: int = 2,
    lpc_coeffs: list[int] | None = None,
    lpc_shift: int = 1,
    part_order: int = 0,
    rice_param: int = 6,
    escape_rawbits: int | None = None,
) -> None:
    blocksize = len(samples)
    # wasted bits: detect common trailing zeros (capped at 2 for sanity)
    wasted = 0
    if any(samples):
        while wasted < 2 and all(s % 2 == 0 for s in samples):
            samples = [s // 2 for s in samples]
            wasted += 1
    eff_bits = bits - wasted
    w.write(0, 1)  # zero pad
    if subframe == "constant":
        assert all(s == samples[0] for s in samples)
        w.write(0b000000, 6)
        _write_wasted(w, wasted)
        w.write_signed(samples[0], eff_bits)
        return
    if subframe == "verbatim":
        w.write(0b000001, 6)
        _write_wasted(w, wasted)
        for s in samples:
            w.write_signed(s, eff_bits)
        return
    if subframe == "fixed":
        order = fixed_order
        w.write(0b001000 | order, 6)
        _write_wasted(w, wasted)
        for s in samples[:order]:
            w.write_signed(s, eff_bits)
        coeffs = _FIXED_COEFFS[order]
        residuals = [
            samples[i]
            - sum(c * samples[i - j - 1] for j, c in enumerate(coeffs))
            for i in range(order, blocksize)
        ]
        _write_rice_partitioned(
            w, residuals, blocksize, order, part_order, rice_param,
            escape_rawbits,
        )
        return
    if subframe == "lpc":
        coeffs = lpc_coeffs or [3, -2]
        order = len(coeffs)
        w.write(0b100000 | (order - 1), 6)
        _write_wasted(w, wasted)
        for s in samples[:order]:
            w.write_signed(s, eff_bits)
        precision = 5  # enough for the deterministic coefficient sets
        w.write(precision - 1, 4)
        w.write_signed(lpc_shift, 5)
        for c in coeffs:
            w.write_signed(c, precision)
        residuals = [
            samples[i]
            - (
                sum(c * samples[i - j - 1] for j, c in enumerate(coeffs))
                >> lpc_shift
            )
            for i in range(order, blocksize)
        ]
        _write_rice_partitioned(
            w, residuals, blocksize, order, part_order, rice_param,
            escape_rawbits,
        )
        return
    raise ValueError(f"unknown subframe strategy {subframe!r}")


def _write_wasted(w: _BitWriter, wasted: int) -> None:
    if wasted == 0:
        w.write(0, 1)
    else:
        w.write(1, 1)
        w.write_unary(wasted - 1)


def encode_flac(
    channels: list[list[int]],
    *,
    sample_rate: int = 16000,
    bits: int = 16,
    blocksize: int = 64,
    stereo_mode: str = "independent",
    subframe: str = "fixed",
    fixed_order: int = 2,
    lpc_coeffs: list[int] | None = None,
    lpc_shift: int = 1,
    part_order: int = 0,
    rice_param: int = 6,
    escape_rawbits: int | None = None,
    tags: dict[str, str] | None = None,
    padding: int = 16,
) -> bytes:
    """Write a deterministic FLAC stream (lossless by construction)."""
    nch = len(channels)
    total = len(channels[0])
    assert all(len(c) == total for c in channels)
    # MD5 over interleaved little-endian samples
    md5 = hashlib.md5()
    width = bits // 8
    for t in range(total):
        for ch in channels:
            md5.update(
                int(ch[t]).to_bytes(width, "little", signed=True)
            )
    out = bytearray(b"fLaC")
    # STREAMINFO (34 bytes)
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    info = si.bytes() + md5.digest()
    blocks: list[tuple[int, bytes]] = [(0, info)]
    if tags:
        vendor = b"pyiceberg-lakehouse-spark"
        vc = struct.pack("<I", len(vendor)) + vendor
        vc += struct.pack("<I", len(tags))
        for k, v in tags.items():
            kv = f"{k}={v}".encode()
            vc += struct.pack("<I", len(kv)) + kv
        blocks.append((4, vc))
    if padding:
        blocks.append((1, bytes(padding)))
    for i, (btype, payload) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out += bytes([last | btype]) + len(payload).to_bytes(3, "big")
        out += payload
    # frames
    frame_idx = 0
    pos = 0
    while pos < total:
        n = min(blocksize, total - pos)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed-blocksize strategy
        w.write(0b0110 if n - 1 < 256 else 0b0111, 4)  # 8/16-bit at end
        w.write(0, 4)  # sample rate: from STREAMINFO
        if nch == 2 and stereo_mode != "independent":
            ca = {"left_side": 0b1000, "right_side": 0b1001,
                  "mid_side": 0b1010}[stereo_mode]
        else:
            ca = nch - 1
        w.write(ca, 4)
        w.write({8: 0b001, 16: 0b100, 24: 0b110}[bits], 3)
        w.write(0, 1)
        _utf8_number(w, frame_idx)
        if n - 1 < 256:
            w.write(n - 1, 8)
        else:
            w.write(n - 1, 16)
        hdr = w.bytes()
        w = _BitWriter()
        for b in hdr:
            w.write(b, 8)
        w.write(_crc8(hdr), 8)
        # subframes
        segs = [ch[pos : pos + n] for ch in channels]
        if nch == 2 and stereo_mode != "independent":
            left, right = segs
            side = [a - b for a, b in zip(left, right)]
            if stereo_mode == "left_side":
                subs = [(left, bits), (side, bits + 1)]
            elif stereo_mode == "right_side":
                subs = [(side, bits + 1), (right, bits)]
            else:  # mid_side
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                subs = [(mid, bits), (side, bits + 1)]
        else:
            subs = [(seg, bits) for seg in segs]
        for seg, sbits in subs:
            sub = subframe
            if sub in ("fixed", "lpc") and n <= max(
                fixed_order, len(lpc_coeffs or [0, 0])
            ):
                sub = "verbatim"  # tail frame too short for the predictor
            if sub == "constant" and any(s != seg[0] for s in seg):
                sub = "verbatim"
            po = part_order
            while po and (
                n % (1 << po)
                or (n >> po)
                <= (
                    fixed_order
                    if sub == "fixed"
                    else len(lpc_coeffs or [3, -2])
                )
            ):
                po -= 1
            _encode_subframe(
                w, list(seg), sbits,
                subframe=sub, fixed_order=fixed_order,
                lpc_coeffs=lpc_coeffs, lpc_shift=lpc_shift,
                part_order=po if sub in ("fixed", "lpc") else 0,
                rice_param=rice_param, escape_rawbits=escape_rawbits,
            )
        w.align()
        frame = w.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
        pos += n
        frame_idx += 1
    return bytes(out)


# ---------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------


def decode_flac(data: bytes) -> tuple[list[list[int]], dict]:
    """Decode a FLAC stream; returns (channels, meta).

    meta: sample_rate, channels, bits, total_samples, n_frames,
    md5_match, tags (dict), subframe_types (sorted unique),
    stereo_modes (sorted unique).
    """
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    tags: dict[str, str] = {}
    last = False
    while not last:
        hdr = data[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated metadata block header")
        last = bool(hdr[0] & 0x80)
        btype = hdr[0] & 0x7F
        length = int.from_bytes(hdr[1:4], "big")
        payload = data[pos + 4 : pos + 4 + length]
        if len(payload) < length:
            raise ValueError("truncated metadata block")
        pos += 4 + length
        if btype == 0:
            r = _BitReader(payload)
            info = {
                "min_blocksize": r.read(16),
                "max_blocksize": r.read(16),
                "min_framesize": r.read(24),
                "max_framesize": r.read(24),
                "sample_rate": r.read(20),
                "channels": r.read(3) + 1,
                "bits": r.read(5) + 1,
                "total_samples": r.read(36),
                "md5": payload[18:34],
            }
        elif btype == 4:
            vlen = struct.unpack_from("<I", payload, 0)[0]
            off = 4 + vlen
            ntags = struct.unpack_from("<I", payload, off)[0]
            off += 4
            for _ in range(ntags):
                klen = struct.unpack_from("<I", payload, off)[0]
                off += 4
                kv = payload[off : off + klen].decode()
                off += klen
                k, _, v = kv.partition("=")
                tags[k.lower()] = v
        # PADDING/SEEKTABLE/etc: length parsed, content skipped
    if info is None:
        raise ValueError("missing STREAMINFO")
    if info["bits"] not in (8, 16, 24):
        raise NotImplementedError(
            f"FLAC sample size {info['bits']} not supported (8/16/24 only)"
        )
    nch = info["channels"]
    total = info["total_samples"]
    channels: list[list[int]] = [[] for _ in range(nch)]
    n_frames = 0
    subframe_types: set[str] = set()
    stereo_modes: set[str] = set()
    while sum(len(c) for c in channels) < total * nch:
        r = _BitReader(data, pos)
        if r.read(14) != 0x3FFE:
            raise ValueError(f"lost frame sync at byte {pos}")
        r.read(1)
        strategy = r.read(1)
        if strategy:
            raise NotImplementedError(
                "variable-blocksize FLAC streams are not supported"
            )
        bs_code = r.read(4)
        sr_code = r.read(4)
        ca = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        _frame_no = _read_utf8_number(r)
        if bs_code == 0b0110:
            n = r.read(8) + 1
        elif bs_code == 0b0111:
            n = r.read(16) + 1
        elif bs_code == 0b0001:
            n = 192
        elif 0b0010 <= bs_code <= 0b0101:
            n = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            n = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved block size code")
        if sr_code not in (0,):  # everything this engine writes
            if sr_code in (0b1100, 0b1101, 0b1110):
                r.read(8 if sr_code == 0b1100 else 16)
            elif sr_code == 0b1111:
                raise ValueError("invalid sample rate code")
        bits = {0b001: 8, 0b100: 16, 0b110: 24}.get(ss_code)
        if bits is None:
            if ss_code == 0:
                bits = info["bits"]
            else:
                raise NotImplementedError(
                    f"FLAC sample size code {ss_code:#b} not supported"
                )
        # CRC-8 check over the header bytes
        hdr_end = r.byte + (1 if r.bit else 0)
        expect = _crc8(data[pos:hdr_end]) if r.bit == 0 else None
        got = r.read(8)
        if expect is not None and got != expect:
            raise ValueError("frame header CRC-8 mismatch")
        if ca <= 0b0111:
            fch = ca + 1
            mode = "independent"
        else:
            fch = 2
            mode = {0b1000: "left_side", 0b1001: "right_side",
                    0b1010: "mid_side"}[ca]
        stereo_modes.add(mode)
        if fch != nch:
            raise ValueError("frame channel count differs from STREAMINFO")
        raws: list[list[int]] = []
        for chi in range(fch):
            sbits = bits
            if mode == "left_side" and chi == 1:
                sbits += 1
            elif mode == "right_side" and chi == 0:
                sbits += 1
            elif mode == "mid_side" and chi == 1:
                sbits += 1
            raws.append(_decode_subframe(r, n, sbits, subframe_types))
        r.align()
        crc_got = r.read(16)
        if crc_got != _crc16(data[pos : r.byte - 2]):
            raise ValueError("frame CRC-16 mismatch")
        if mode == "independent":
            decoded = raws
        elif mode == "left_side":
            left, side = raws
            decoded = [left, [a - s for a, s in zip(left, side)]]
        elif mode == "right_side":
            side, right = raws
            decoded = [[rr + s for rr, s in zip(right, side)], right]
        else:  # mid_side
            mid, side = raws
            left = []
            right = []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            decoded = [left, right]
        for chi in range(nch):
            channels[chi].extend(decoded[chi])
        pos = r.byte
        n_frames += 1
    md5 = hashlib.md5()
    width = info["bits"] // 8
    for t in range(total):
        for ch in channels:
            md5.update(int(ch[t]).to_bytes(width, "little", signed=True))
    meta = {
        "sample_rate": info["sample_rate"],
        "channels": nch,
        "bits": info["bits"],
        "total_samples": total,
        "n_frames": n_frames,
        "md5_match": md5.digest() == info["md5"],
        "tags": tags,
        "subframe_types": sorted(subframe_types),
        "stereo_modes": sorted(stereo_modes),
    }
    return channels, meta


def _decode_subframe(
    r: _BitReader, n: int, bits: int, types_seen: set[str]
) -> list[int]:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bits - wasted
    if t == 0b000000:
        types_seen.add("constant")
        v = r.read_signed(eff)
        out = [v] * n
    elif t == 0b000001:
        types_seen.add("verbatim")
        out = [r.read_signed(eff) for _ in range(n)]
    elif 0b001000 <= t <= 0b001100:
        order = t & 0x07
        types_seen.add(f"fixed{order}")
        warm = [r.read_signed(eff) for _ in range(order)]
        residuals = _read_rice_partitioned(r, n, order)
        out = _predict_fixed(order, warm, residuals)
    elif t >= 0b100000:
        order = (t & 0x1F) + 1
        types_seen.add(f"lpc{order}")
        warm = [r.read_signed(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC coefficient precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift is reserved")
        coeffs = [r.read_signed(precision) for _ in range(order)]
        residuals = _read_rice_partitioned(r, n, order)
        out = _predict_lpc(warm, residuals, coeffs, shift)
    else:
        raise ValueError(f"reserved subframe type {t:#08b}")
    if wasted:
        out = [s << wasted for s in out]
    return out
