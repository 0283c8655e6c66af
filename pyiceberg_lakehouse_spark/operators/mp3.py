"""MPEG Audio Layer III (MP3) — frame/side-info/spectrum decode and a
fixture encoder, pure Python, from the public ISO/IEC 11172-3 spec (+
the 13818-3 LSF extension for MPEG-2 sample rates).

What is EXACT-SPEC here (closed-form or table data validated on this
box):

- header walk + CRC skip, bit-reservoir assembly (main_data_begin);
- side info, both MPEG-1 (17/32-byte) and MPEG-2 LSF (9/17-byte) forms;
- scalefactors: MPEG-1 slen pairs + scfsi, MPEG-2 LSF partition tables;
- Huffman spectrum decode: the Table B.7 code tables (transcribed from
  the public spec; every table machine-checked complete — Kraft sum
  exactly 1 — and prefix-free in tests/test_mp3.py, and the bitstream
  walk of a real LAME-encoded file must consume EXACTLY part2_3_length
  bits per granule, which any mis-sized code table breaks);
- requantization |is|^(4/3) * 2^(gain/4 - (scalefac+pretab)*step),
  short-block reorder, MS/intensity stereo, alias reduction (the cs/ca
  butterflies from the spec's eight ci rationals — closed form),
  IMDCT with all four window types (sin-window closed forms),
  overlap-add and frequency inversion;
- the synthesis MATRIXING cos((16+i)(2k+1)pi/64) — closed form.

What is NOT exact-spec and stays honestly gated: the 512-coefficient
polyphase synthesis window (ISO Table B.3) is pure table data with no
closed form and no copy on this box (binary sweep found none), so
``synthesize_pcm`` defaults to a documented substitute
perfect-reconstruction prototype (sine window) that yields valid PCM
for curation FEATURES but not bit-identical loudspeaker output;
``iso_window=True`` raises until a validation vector exists. Decoded
INTEGER spectra (Huffman + side info + scalefactors) are exact-spec
regardless — Huffman coding is lossless, so planted fixture spectra
round-trip exactly.

Reference parity: the reference treats audio as opaque blobs; this
engine adds the decode layer an audio-curation pass needs (same split
as vp8.py before its real-file pin — fixture encode->decode plus a
real-file structural walk, value-level external validation pending a
reference decoder on the box).
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------- bits --


class Bits:
    """MSB-first bit reader over bytes, with exact position accounting."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        if (pos + n) > 8 * len(data):
            raise ValueError("mp3: bit read past the end of main data")
        for _ in range(n):
            out = (out << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out

    def read1(self) -> int:
        pos = self.pos
        if pos >= 8 * len(self.data):
            raise ValueError("mp3: bit read past the end of main data")
        self.pos = pos + 1
        return (self.data[pos >> 3] >> (7 - (pos & 7))) & 1


class BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tell(self) -> int:
        return len(self.bits)

    def to_bytes(self) -> bytes:
        out = bytearray()
        acc = 0
        for i, b in enumerate(self.bits):
            acc = (acc << 1) | b
            if i % 8 == 7:
                out.append(acc)
                acc = 0
        rem = len(self.bits) % 8
        if rem:
            out.append(acc << (8 - rem))
        return bytes(out)


# ------------------------------------------------------------- headers --

BITRATES_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                  256, 320)
BITRATES_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                  160)
RATES_V1 = (44100, 48000, 32000)
RATES_V2 = (22050, 24000, 16000)
RATES_V25 = (11025, 12000, 8000)


def parse_header(b: bytes, at: int) -> dict:
    """4 header bytes -> field dict (MPEG-1/2/2.5, Layer III only)."""
    if at + 4 > len(b):
        raise ValueError("mp3: truncated header")
    h = struct.unpack_from(">I", b, at)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError("mp3: lost frame sync")
    ver_bits = (h >> 19) & 3
    if ver_bits == 1:
        raise ValueError("mp3: reserved version id")
    version = {0: 25, 2: 2, 3: 1}[ver_bits]  # 25 = MPEG-2.5
    layer = 4 - ((h >> 17) & 3)
    if layer != 3:
        raise NotImplementedError("only Layer III is supported")
    crc_protected = not ((h >> 16) & 1)
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("mp3: free-format/invalid bitrate or samplerate")
    bitrate = (BITRATES_V1_L3 if version == 1 else BITRATES_V2_L3)[br_idx]
    rate = {1: RATES_V1, 2: RATES_V2, 25: RATES_V25}[version][sr_idx]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3  # 0 stereo, 1 joint, 2 dual, 3 mono
    mode_ext = (h >> 4) & 3
    nch = 1 if mode == 3 else 2
    samples = 1152 if version == 1 else 576
    frame_len = (144 if version == 1 else 72) * bitrate * 1000 // rate \
        + padding
    return {
        "version": version, "bitrate_kbps": bitrate, "sample_rate": rate,
        "padding": padding, "mode": mode, "mode_ext": mode_ext, "nch": nch,
        "crc": crc_protected, "frame_len": frame_len, "samples": samples,
        "br_idx": br_idx, "sr_idx": sr_idx,
    }


def parse_side_info(data: bytes, hdr: dict) -> dict:
    """Side info -> {main_data_begin, granules: [[{...} per ch] per gr]}.

    MPEG-1: 2 granules, 9-bit main_data_begin, scfsi; LSF: 1 granule,
    8-bit main_data_begin, 9-bit scalefac_compress.
    """
    v1 = hdr["version"] == 1
    nch = hdr["nch"]
    bits = Bits(data)
    out: dict = {}
    out["main_data_begin"] = bits.read(9 if v1 else 8)
    bits.read((5 if nch == 1 else 3) if v1 else (1 if nch == 1 else 2))
    if v1:
        out["scfsi"] = [[bits.read1() for _ in range(4)]
                        for _ in range(nch)]
    else:
        out["scfsi"] = [[0, 0, 0, 0] for _ in range(nch)]
    grs = []
    for _gr in range(2 if v1 else 1):
        chs = []
        for _ch in range(nch):
            g: dict = {}
            g["part2_3_length"] = bits.read(12)
            g["big_values"] = bits.read(9)
            g["global_gain"] = bits.read(8)
            g["scalefac_compress"] = bits.read(4 if v1 else 9)
            g["window_switching"] = bits.read1()
            if g["window_switching"]:
                g["block_type"] = bits.read(2)
                g["mixed_block"] = bits.read1()
                g["table_select"] = [bits.read(5), bits.read(5)]
                g["subblock_gain"] = [bits.read(3) for _ in range(3)]
                if g["block_type"] == 0:
                    raise ValueError(
                        "mp3: window_switching with block_type 0"
                    )
                # spec-fixed region split for switched blocks
                g["region0_count"] = (
                    8 if g["block_type"] == 2 and not g["mixed_block"]
                    else 7
                )
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [bits.read(5) for _ in range(3)]
                g["region0_count"] = bits.read(4)
                g["region1_count"] = bits.read(3)
            if v1:
                g["preflag"] = bits.read1()
            else:
                g["preflag"] = 0  # LSF: derived from scalefac_compress
            g["scalefac_scale"] = bits.read1()
            g["count1table_select"] = bits.read1()
            chs.append(g)
        grs.append(chs)
    out["granules"] = grs
    expect = (17 if nch == 1 else 32) if v1 else (9 if nch == 1 else 17)
    if bits.pos != 8 * expect:
        raise ValueError(
            f"mp3: side info consumed {bits.pos} bits, expected"
            f" {8 * expect}"
        )
    out["size"] = expect
    return out


# ---------------------------------------------------- huffman tables --
# ISO/IEC 11172-3 Table B.7 code tables, transcribed from the public
# spec as (hlen, hcod) in x-major (x*ylen + y) order. Every table below
# is machine-checked in tests/test_mp3.py: the Kraft sum must be
# EXACTLY 1 (complete code) and the code set prefix-free, and the
# decoder's walk of real bitstreams must consume exactly
# part2_3_length bits per granule.
#
# The structural-validation bar for the remaining B.7 tables (the r17
# verdict's task #1): a transcription ships ONLY if its 36-256
# explicit (hlen, hcod) pairs machine-check as a prefix-free and
# EXACTLY Kraft-complete code — a bar a noisy transcription
# essentially cannot pass by accident, since any wrong pair collides
# with a neighbor or leaves a hole in the code space. Table 9 (6x6,
# no linbits) passed that bar in r18 and ships below, with
# encoder-side round-trips and the driver row exercising it. Tables
# 8, 10-13, 15 and the linbits escape families 16-23/24-31 remain
# gated: their candidate transcriptions FAILED the machine-check
# (duplicate or hole-leaving codewords), and an unvalidated
# "plausible" table would decode real files to silently wrong spectra
# — they raise messagefully instead (the same honesty gate vp8.py
# applies to inter frames). Table 0 codes nothing (all-zero region);
# 4 and 14 are unused by the spec.

_HUFF_RAW: dict[int, tuple[int, int, int, tuple[tuple[int, int], ...]]] = {
    # id: (xlen, ylen, linbits, codes)
    1: (2, 2, 0, ((1, 1), (3, 1), (2, 1), (3, 0))),
    2: (3, 3, 0, ((1, 1), (3, 2), (6, 1),
                  (3, 3), (3, 1), (5, 1),
                  (5, 3), (5, 2), (6, 0))),
    3: (3, 3, 0, ((2, 3), (2, 2), (6, 1),
                  (3, 1), (2, 1), (5, 1),
                  (5, 3), (5, 2), (6, 0))),
    5: (4, 4, 0, ((1, 1), (3, 2), (6, 6), (7, 5),
                  (3, 3), (3, 1), (6, 4), (7, 4),
                  (6, 7), (6, 5), (7, 7), (8, 1),
                  (7, 6), (6, 1), (7, 1), (8, 0))),
    6: (4, 4, 0, ((3, 7), (3, 3), (5, 5), (7, 1),
                  (3, 6), (2, 2), (4, 3), (5, 2),
                  (4, 5), (4, 4), (5, 4), (6, 1),
                  (6, 3), (5, 3), (6, 2), (7, 0))),
    7: (6, 6, 0, ((1, 1), (3, 2), (6, 10), (8, 19), (8, 16), (9, 10),
                  (3, 3), (4, 3), (6, 7), (7, 10), (7, 5), (8, 3),
                  (6, 11), (5, 4), (7, 13), (8, 17), (8, 8), (9, 4),
                  (7, 12), (7, 11), (8, 18), (9, 15), (9, 11), (9, 2),
                  (7, 7), (7, 6), (8, 9), (9, 14), (9, 3), (10, 1),
                  (8, 6), (8, 4), (9, 5), (10, 3), (10, 2), (10, 0))),
    9: (6, 6, 0, ((3, 7), (3, 5), (5, 9), (6, 14), (8, 15), (9, 7),
                  (3, 6), (3, 4), (4, 5), (5, 5), (6, 6), (8, 7),
                  (4, 7), (4, 6), (5, 8), (6, 8), (7, 8), (8, 5),
                  (6, 15), (5, 6), (6, 9), (7, 10), (7, 5), (8, 1),
                  (7, 11), (6, 7), (7, 9), (7, 6), (8, 4), (9, 1),
                  (8, 14), (7, 4), (8, 6), (8, 2), (9, 6), (9, 0))),
}

# count1 region quadruple tables (Table B.7 tables "A" and "B"):
# value v = (v3<<3)|(v2<<2)|(v1<<1)|v0 bit per line, sign bits follow
_COUNT1_A = ((1, 1), (4, 5), (4, 4), (5, 5), (4, 6), (6, 5), (5, 4),
             (6, 4), (4, 7), (5, 3), (5, 6), (6, 0), (5, 7), (6, 2),
             (6, 3), (6, 1))
_COUNT1_B = tuple((4, 15 - v) for v in range(16))

_GATED_TABLES = frozenset(
    i for i in range(32) if i not in _HUFF_RAW and i not in (0, 4, 14)
)


def _build_decode_map(codes, ylen):
    """(hlen,hcod) list -> {(len, code): (x, y)} exact-match map."""
    out = {}
    for idx, (hlen, hcod) in enumerate(codes):
        key = (hlen, hcod)
        if key in out:
            raise ValueError(f"mp3: duplicate huffman code {key}")
        out[key] = (idx // ylen, idx % ylen)
    return out


_DECODE_MAPS = {
    tid: _build_decode_map(codes, ylen)
    for tid, (_xlen, ylen, _lin, codes) in _HUFF_RAW.items()
}
_COUNT1_MAPS = {
    0: {(hl, hc): v for v, (hl, hc) in enumerate(_COUNT1_A)},
    1: {(hl, hc): v for v, (hl, hc) in enumerate(_COUNT1_B)},
}
_MAX_HLEN = 19


def _read_code(bits: Bits, cmap: dict) -> tuple[int, int]:
    code = 0
    for ln in range(1, _MAX_HLEN + 1):
        code = (code << 1) | bits.read1()
        hit = cmap.get((ln, code))
        if hit is not None:
            return hit
    raise ValueError("mp3: invalid huffman codeword")


def walk_frames(payload: bytes) -> list[dict]:
    """Strict frame walk over a bare MPEG stream -> one dict per frame
    with header fields + side info + the frame's main-data bytes."""
    frames = []
    at = 0
    n = len(payload)
    while at < n:
        if n - at < 4:
            raise ValueError("mp3: trailing bytes after the last frame")
        hdr = parse_header(payload, at)
        end = at + hdr["frame_len"]
        if end > n:
            raise ValueError("mp3: truncated frame")
        body = at + 4
        if hdr["crc"]:
            body += 2
        si_len = (17 if hdr["nch"] == 1 else 32) if hdr["version"] == 1 \
            else (9 if hdr["nch"] == 1 else 17)
        side = parse_side_info(payload[body : body + si_len], hdr)
        frames.append(
            {
                "header": hdr,
                "side": side,
                "main_data": payload[body + si_len : end],
                "offset": at,
            }
        )
        at = end
    return frames


# ------------------------------------------------- scalefactor bands --
# ISO 11172-3 Table B.8 (MPEG-1) / 13818-3 (LSF) long- and short-block
# scalefactor band boundaries, in spectral-line units.

SFB_LONG = {
    44100: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576),
    48000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576),
    32000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576),
    22050: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576),
    24000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136,
            162, 194, 232, 278, 332, 394, 464, 540, 576),
    16000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576),
}
SFB_SHORT = {
    44100: (0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000: (0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000: (0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
    22050: (0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192),
    24000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192),
    16000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
}
PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3,
          2, 0)
SLEN1 = (0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
SLEN2 = (0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)


def assemble_main_data(frames: list[dict]) -> list[tuple[dict, int]]:
    """Resolve each frame's main_data_begin against the bit reservoir:
    returns [(frame, start_bit_offset_into_its_assembled_buffer)].
    Each frame gets a buffer = reservoir tail + its own main_data."""
    out = []
    reservoir = b""
    for f in frames:
        mdb = f["side"]["main_data_begin"]
        if mdb > len(reservoir):
            raise ValueError(
                "mp3: main_data_begin reaches past the bit reservoir"
            )
        buf = (reservoir[len(reservoir) - mdb :] if mdb else b"") \
            + f["main_data"]
        out.append((f, buf))
        reservoir = (reservoir + f["main_data"])[-511:]
    return out


def _read_scalefactors_v1(bits, g, prev_sf, scfsi, gr):
    """MPEG-1 scalefactors for one granule/channel -> (long[21] or
    short[13][3], part2_bits)."""
    s1, s2 = SLEN1[g["scalefac_compress"]], SLEN2[g["scalefac_compress"]]
    start = bits.pos
    if g["block_type"] == 2 and g["window_switching"]:
        if g["mixed_block"]:
            # mixed blocks (spec 2.4.2.7): 8 LONG scalefactors (slen1)
            # for the two long subbands, then short bands 3..5 (slen1)
            # and 6..11 (slen2), three windows each — 17*slen1 +
            # 18*slen2 part2 bits
            long_sf = [bits.read(s1) for _ in range(8)]
            short_sf = [[0, 0, 0] for _ in range(3)]
            short_sf += [[bits.read(s1) for _ in range(3)]
                         for _ in range(3)]
            short_sf += [[bits.read(s2) for _ in range(3)]
                         for _ in range(6)]
            return (
                {"long": long_sf + [0] * 13, "short": short_sf,
                 "mixed": True},
                bits.pos - start,
            )
        sf = [[bits.read(s1) for _ in range(3)] for _ in range(6)] + \
             [[bits.read(s2) for _ in range(3)] for _ in range(6)]
        return {"short": sf}, bits.pos - start
    sf = []
    groups = ((0, 6, s1), (6, 11, s1), (11, 16, s2), (16, 21, s2))
    for gi, (lo, hi, sl) in enumerate(groups):
        if gr == 1 and scfsi[gi]:
            sf.extend(prev_sf["long"][lo:hi])
        else:
            sf.extend(bits.read(sl) for _ in range(hi - lo))
    return {"long": sf}, bits.pos - start


def _lsf_layout(sfc: int, short: bool) -> tuple[tuple, tuple, int]:
    """13818-3 scalefac_compress -> (slen[4], nsfb[4], preflag)."""
    if sfc < 400:
        slen = ((sfc >> 4) // 5, (sfc >> 4) % 5, (sfc % 16) >> 2, sfc % 4)
        nsfb = (9, 9, 9, 9) if short else (6, 5, 5, 5)
        preflag = 0
    elif sfc < 500:
        s = sfc - 400
        slen = ((s >> 2) // 5, (s >> 2) % 5, s % 4, 0)
        nsfb = (9, 9, 12, 6) if short else (6, 5, 7, 3)
        preflag = 0
    else:
        s = sfc - 500
        slen = (s // 3, s % 3, 0, 0)
        nsfb = (18, 18, 0, 0) if short else (11, 10, 0, 0)
        preflag = 1
    return slen, nsfb, preflag


def _read_scalefactors_lsf(bits, g, mode_ext_intensity):
    """MPEG-2 LSF scalefactors (13818-3): scalefac_compress (9 bits)
    selects slen[4] + partition sizes; intensity channels gated."""
    if mode_ext_intensity:
        raise NotImplementedError("mp3: LSF intensity-stereo scalefactors")
    sfc = g["scalefac_compress"]
    short = g["block_type"] == 2 and g["window_switching"]
    if short and g["mixed_block"]:
        raise NotImplementedError("mp3: mixed blocks")
    slen, nsfb, preflag = _lsf_layout(sfc, short)
    start = bits.pos
    flat = []
    for n, sl in zip(nsfb, slen):
        flat.extend(bits.read(sl) for _ in range(n))
    g["preflag"] = preflag
    if short:
        # flat holds 36 window-scalefactors (12 bands x 3 windows)
        sf = [flat[i * 3 : i * 3 + 3] for i in range(12)]
        return {"short": sf}, bits.pos - start
    return {"long": flat + [0] * (21 - len(flat))}, bits.pos - start


def decode_spectrum(bits, g, hdr) -> tuple[list[int], int]:
    """Huffman-decode one granule/channel -> (is[576] integers,
    count1_lines). Consumes exactly the huffman-data bits."""
    sr = hdr["sample_rate"]
    short = g["block_type"] == 2 and g["window_switching"]
    long_bands = SFB_LONG[sr]
    is_ = [0] * 576
    big = 2 * g["big_values"]
    if big > 576:
        raise ValueError("mp3: big_values exceed the spectrum")
    if short:
        region1_start = 36
        region2_start = 576
    else:
        r0 = min(g["region0_count"] + 1, len(long_bands) - 1)
        r1 = min(r0 + g["region1_count"] + 1, len(long_bands) - 1)
        region1_start = long_bands[r0]
        region2_start = long_bands[r1]
    pos = 0
    end_bits = None  # caller enforces part2_3; we track validity
    while pos < big:
        if pos < region1_start:
            tid = g["table_select"][0]
        elif pos < region2_start:
            tid = g["table_select"][1]
        else:
            tid = g["table_select"][2] if not short else None
            if tid is None:
                raise ValueError("mp3: short block spilled into region2")
        if tid == 0:
            is_[pos] = 0
            is_[pos + 1] = 0
            pos += 2
            continue
        if tid in _GATED_TABLES:
            raise NotImplementedError(
                f"mp3: huffman table {tid} pending a transcription"
                " that passes the prefix-free/Kraft machine-check"
                " (tables 0-3,5-7,9 + count1 A/B shipped)"
            )
        if tid not in _HUFF_RAW:
            # ids 4 and 14 are encodable in the 5-bit table_select
            # field but unused by the spec — a stream selecting them
            # is corrupt and must reject CLEANLY (the fuzz suite's
            # ValueError/NotImplementedError/EOFError contract), not
            # KeyError
            raise ValueError(
                f"mp3: spec-unused huffman table {tid} selected"
            )
        xlen, ylen, linbits, _codes = _HUFF_RAW[tid]
        x, y = _read_code(bits, _DECODE_MAPS[tid])
        if linbits and x == xlen - 1:
            x += bits.read(linbits)
        if x:
            x = -x if bits.read1() else x
        if linbits and y == ylen - 1:
            y += bits.read(linbits)
        if y:
            y = -y if bits.read1() else y
        is_[pos] = x
        is_[pos + 1] = y
        pos += 2
    del end_bits
    return is_, pos


def decode_count1(bits, g, limit_bit, pos, is_) -> int:
    """count1 region: quadruples until the huffman bit budget or the
    spectrum is exhausted. Returns the first zero line (rzero start)."""
    cmap = _COUNT1_MAPS[g["count1table_select"]]
    while bits.pos < limit_bit and pos <= 572:
        v = _read_code(bits, cmap)
        for j in range(4):
            mag = (v >> (3 - j)) & 1
            if mag:
                if bits.pos >= limit_bit:
                    raise ValueError("mp3: count1 sign bit past budget")
                mag = -1 if bits.read1() else 1
            is_[pos + j] = mag
        pos += 4
    if bits.pos > limit_bit:
        # the final quadruple straddled the boundary: spec decoders
        # discard it and resynchronize on the byte budget
        for j in range(1, 5):
            is_[pos - j] = 0
        bits.pos = limit_bit
        pos -= 4
    return pos


_CI = (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
_CS = tuple(1.0 / math.sqrt(1.0 + c * c) for c in _CI)
_CA = tuple(c / math.sqrt(1.0 + c * c) for c in _CI)


def requantize(is_, g, sf, sr) -> list[float]:
    """Integer spectrum + scalefactors -> xr floats (spec 2.4.3.4)."""
    xr = [0.0] * 576
    gain = g["global_gain"] - 210
    step = 1.0 if g["scalefac_scale"] else 0.5
    short = g["block_type"] == 2 and g["window_switching"]
    if short:
        bands = SFB_SHORT[sr]
        sfs = sf["short"]
        sbg = g["subblock_gain"]
        mixed = bool(g.get("mixed_block")) or sf.get("mixed", False)
        first_band = 0
        idx = 0
        if mixed:
            # mixed: lines 0..35 are the LONG part (long bands 0..7,
            # long scalefactors + pretab); the short band-major runs
            # start at line 36 = short band 3
            lbands = SFB_LONG[sr]
            sfl = sf["long"]
            for b in range(8):
                sfv = sfl[b] if b < len(sfl) else 0
                pre = PRETAB[b] if g["preflag"] else 0
                mult = 2.0 ** (gain / 4.0 - step * (sfv + pre))
                for i in range(lbands[b], min(lbands[b + 1], 36)):
                    v = is_[i]
                    if v:
                        xr[i] = math.copysign(
                            abs(v) ** (4.0 / 3.0), v
                        ) * mult
            first_band = 3
            idx = 36
        # short-block spectra arrive band-major, window-minor (reorder
        # happens AFTER requantization): for each band b, window w, the
        # run covers bands[b]..bands[b+1] of that window
        for b in range(first_band, len(bands) - 1):
            width = bands[b + 1] - bands[b]
            for w in range(3):
                sfv = sfs[b][w] if b < len(sfs) else 0
                mult = 2.0 ** (
                    gain / 4.0 - 2.0 * sbg[w] - step * sfv
                )
                for _k in range(width):
                    v = is_[idx]
                    if v:
                        xr[idx] = math.copysign(
                            abs(v) ** (4.0 / 3.0), v
                        ) * mult
                    idx += 1
                    if idx >= 576:
                        break
                if idx >= 576:
                    break
            if idx >= 576:
                break
        return xr
    bands = SFB_LONG[sr]
    sfl = sf["long"]
    for b in range(len(bands) - 1):
        sfv = sfl[b] if b < len(sfl) else 0
        pre = PRETAB[b] if g["preflag"] else 0
        mult = 2.0 ** (gain / 4.0 - step * (sfv + pre))
        for i in range(bands[b], bands[b + 1]):
            v = is_[i]
            if v:
                xr[i] = math.copysign(abs(v) ** (4.0 / 3.0), v) * mult
    return xr


def reorder_short(xr, sr, mixed: bool = False) -> list[float]:
    """Short-block reorder: band-major window runs -> line-interleaved
    (within each 18-line granule-subband group, line j holds window
    j%3, frequency j//3 — the layout the per-window IMDCT consumes).
    ``mixed``: the long part (lines 0..35) passes through untouched;
    reordering starts at short band 3 (= line 36 on both sides)."""
    out = [0.0] * 576
    bands = SFB_SHORT[sr]
    first_band = 0
    idx = 0
    if mixed:
        out[:36] = xr[:36]
        first_band = 3
        idx = 36
    for b in range(first_band, len(bands) - 1):
        start, width = bands[b], bands[b + 1] - bands[b]
        for w in range(3):
            for k in range(width):
                out[3 * (start + k) + w] = xr[idx]
                idx += 1
    return out


def ms_stereo(xr_l, xr_r) -> None:
    """In-place mid/side reconstruction (mode_ext & 2)."""
    inv = 1.0 / math.sqrt(2.0)
    for i in range(576):
        m, s = xr_l[i], xr_r[i]
        xr_l[i] = (m + s) * inv
        xr_r[i] = (m - s) * inv


def stereo_process(hdr, g_r, sf_r, is_r, xr_l, xr_r) -> None:
    """Joint-stereo reconstruction for one granule (§2.4.3.4.9):
    MS (mode_ext & 2) and/or INTENSITY (mode_ext & 1).

    The intensity border follows the spec's VALUE rule (dist10's
    III_stereo): the bound is the scalefactor band holding the right
    channel's LAST NON-ZERO decoded value; every band fully above it
    carries one combined signal in the left channel, re-panned by
    is_pos = the right channel's scalefactor for that band:
    is_ratio = tan(is_pos * pi/12), left = xr*ratio/(1+ratio),
    right = xr/(1+ratio). Position 6 is the pure-left limit (left =
    xr, right = 0); position 7 is ILLEGAL — the band falls back to
    the lower-bands mode (MS when mode_ext & 2, else plain L/R). The
    last band group reuses the final transmitted position (only 21
    long / 12 short scalefactors exist). When MS and intensity
    combine, MS applies ONLY below the border.

    LONG blocks process whole bands; SHORT (non-mixed) blocks process
    per (band, window) over the REORDERED spectrum with each window's
    own border and its own is_pos (sf_r["short"][band][window]).
    Mixed-block intensity (two borders, long + short parts) stays
    gated."""
    ms = bool(hdr["mode_ext"] & 2)
    intens = bool(hdr["mode_ext"] & 1)
    if not intens:
        if ms:
            ms_stereo(xr_l, xr_r)
        return
    short = g_r["block_type"] == 2 and g_r["window_switching"]
    if short and g_r.get("mixed_block"):
        raise NotImplementedError(
            "mp3: intensity stereo over MIXED blocks (a long + a"
            " per-window short border) — long and pure-short"
            " intensity shipped r18"
        )
    inv = 1.0 / math.sqrt(2.0)

    def _panned(pos):
        if pos == 6:
            return 1.0, 0.0
        ratio = math.tan(pos * math.pi / 12.0)
        return ratio / (1.0 + ratio), 1.0 / (1.0 + ratio)

    def _ms_run(indices):
        for i in indices:
            m, sd = xr_l[i], xr_r[i]
            xr_l[i] = (m + sd) * inv
            xr_r[i] = (m - sd) * inv

    if not short:
        bands = SFB_LONG[hdr["sample_rate"]]
        last_nz = -1
        for i in range(575, -1, -1):
            if is_r[i]:
                last_nz = i
                break
        border_band = next(
            (b for b in range(len(bands)) if bands[b] > last_nz),
            len(bands) - 1,
        )
        border_line = bands[min(border_band, len(bands) - 1)]
        if ms:
            _ms_run(range(border_line))
        sfl = sf_r.get("long") or [0] * 21
        for b in range(border_band, len(bands) - 1):
            is_pos = sfl[min(b, 20)]
            lo, hi = bands[b], bands[b + 1]
            if is_pos == 7:
                if ms:
                    _ms_run(range(lo, hi))
                continue
            kl, kr = _panned(is_pos)
            for i in range(lo, hi):
                v = xr_l[i]
                xr_l[i] = v * kl
                xr_r[i] = v * kr
        return

    # pure short blocks: per-window borders over the reordered layout
    # (band b, window w occupies 3*(start+k)+w for k < width)
    bands = SFB_SHORT[hdr["sample_rate"]]
    n_bands = len(bands) - 1
    sfs = sf_r.get("short") or [[0] * 3 for _ in range(12)]

    def _run(b, w):
        start, width = bands[b], bands[b + 1] - bands[b]
        return [3 * (start + k) + w for k in range(width)
                if 3 * (start + k) + w < 576]

    for w in range(3):
        bound = -1
        for b in range(n_bands - 1, -1, -1):
            if any(is_r[i] for i in _run(b, w)):
                bound = b
                break
        for b in range(n_bands):
            idxs = _run(b, w)
            if b <= bound:
                if ms:
                    _ms_run(idxs)
                continue
            is_pos = sfs[min(b, 11)][w]
            if is_pos == 7:
                if ms:
                    _ms_run(idxs)
                continue
            kl, kr = _panned(is_pos)
            for i in idxs:
                v = xr_l[i]
                xr_l[i] = v * kl
                xr_r[i] = v * kr


def alias_reduce(xr, block_type, window_switching,
                 mixed: bool = False) -> None:
    """Butterflies across the 31 subband boundaries (skip pure short;
    MIXED blocks butterfly only the long part's single internal
    boundary, between subbands 0 and 1)."""
    if block_type == 2 and window_switching and not mixed:
        return
    n_bounds = 2 if (block_type == 2 and window_switching) else 32
    for sb in range(1, n_bounds):
        base = 18 * sb
        for i in range(8):
            lo, hi = base - 1 - i, base + i
            a, b = xr[lo], xr[hi]
            xr[lo] = a * _CS[i] - b * _CA[i]
            xr[hi] = b * _CS[i] + a * _CA[i]


def _imdct_win(block_type: int) -> list[float]:
    if block_type == 0:
        return [math.sin(math.pi / 36.0 * (i + 0.5)) for i in range(36)]
    if block_type == 1:
        return (
            [math.sin(math.pi / 36.0 * (i + 0.5)) for i in range(18)]
            + [1.0] * 6
            + [math.sin(math.pi / 12.0 * (i - 18 + 0.5))
               for i in range(24, 30)]
            + [0.0] * 6
        )
    if block_type == 3:
        return (
            [0.0] * 6
            + [math.sin(math.pi / 12.0 * (i - 6 + 0.5))
               for i in range(6, 12)]
            + [1.0] * 6
            + [math.sin(math.pi / 36.0 * (i + 0.5)) for i in range(18, 36)]
        )
    return [math.sin(math.pi / 12.0 * (i + 0.5)) for i in range(12)]


_WIN_LONG = {bt: _imdct_win(bt) for bt in (0, 1, 3)}
_WIN_SHORT = _imdct_win(2)
# cached IMDCT cosine bases (pure data; identical values to inline cos)
_IMDCT36 = [
    [math.cos(math.pi / 72.0 * (2 * i + 19) * (2 * k + 1))
     for k in range(18)]
    for i in range(36)
]
_IMDCT12 = [
    [math.cos(math.pi / 24.0 * (2 * i + 7) * (2 * k + 1))
     for k in range(6)]
    for i in range(12)
]


try:  # vectorized IMDCT + synthesis when numpy is present (always
    # under mapInPandas); pure-Python fallback keeps the module
    # dependency-free. Both paths agree to ~1e-13 (pinned in tests).
    import numpy as _np
except ImportError:  # pragma: no cover
    _np = None

_NP_CONSTS: dict = {}


def _np_consts():
    c = _NP_CONSTS
    if not c:
        c["M36"] = _np.asarray(_IMDCT36)          # (36, 18)
        c["M12"] = _np.asarray(_IMDCT12)          # (12, 6)
        c["WINL"] = {bt: _np.asarray(w) for bt, w in _WIN_LONG.items()}
        c["WINS"] = _np.asarray(_WIN_SHORT)
        # frequency inversion: odd subbands negate odd samples
        s = _np.ones((32, 18))
        s[1::2, 1::2] = -1.0
        c["SIGN"] = s
        c["N"] = _np.asarray(_SYNTH_N)            # (64, 32)
        idx = _np.empty((16, 32), dtype=_np.int64)
        for i in range(16):
            for j in range(32):
                idx[i, j] = (i >> 1) * 128 + ((96 + j) if i & 1 else j)
        c["IDX"] = idx
        c["DMAT"] = _np.asarray(
            [[_SUBSTITUTE_D[32 * i + j] for j in range(32)]
             for i in range(16)]
        )
    return c


def imdct_granule(xr, block_type, window_switching, overlap,
                  mixed: bool = False) -> list[float]:
    """18 spectral lines per subband -> 18 time samples per subband with
    overlap-add; ``overlap`` is the persistent [32][18] state. Returns
    576 time-domain samples (subband-major), frequency-inverted.
    ``mixed``: subbands 0-1 use the LONG (type 0) window, 2-31 short —
    handled by running the long path on the first two subbands and the
    short path on the rest (the per-subband transforms are
    independent)."""
    if mixed and block_type == 2 and window_switching:
        # two passes over disjoint subband ranges sharing the overlap
        # state: zero-input/zero-overlap dummy subbands contribute
        # nothing, and frequency inversion keys on the subband INDEX,
        # which both passes preserve
        ov_long = [list(overlap[0]), list(overlap[1])] + \
            [[0.0] * 18 for _ in range(30)]
        ov_short = [[0.0] * 18, [0.0] * 18] + \
            [list(overlap[sb]) for sb in range(2, 32)]
        long_out = imdct_granule(
            list(xr[:36]) + [0.0] * 540, 0, 0, ov_long
        )
        short_out = imdct_granule(
            [0.0] * 36 + list(xr[36:]), 2, 1, ov_short
        )
        overlap[0] = ov_long[0]
        overlap[1] = ov_long[1]
        for sb in range(2, 32):
            overlap[sb] = ov_short[sb]
        return long_out[:36] + short_out[36:]
    short = block_type == 2 and window_switching
    if _np is not None:
        c = _np_consts()
        xmat = _np.asarray(xr, dtype=_np.float64).reshape(32, 18)
        if short:
            x36 = _np.zeros((36, 32))
            for w in range(3):
                yw = (c["M12"] @ xmat[:, w::3].T) * c["WINS"][:, None]
                x36[6 + 6 * w : 18 + 6 * w, :] += yw
        else:
            x36 = (c["M36"] @ xmat.T) * c["WINL"][block_type][:, None]
        ov = _np.asarray(overlap, dtype=_np.float64)      # (32, 18)
        out = ((x36[:18, :].T + ov) * c["SIGN"]).reshape(-1)
        overlap[:] = x36[18:36, :].T.tolist()
        return out.tolist()
    out = [0.0] * 576
    for sb in range(32):
        X = xr[18 * sb : 18 * sb + 18]
        if short:
            x36 = [0.0] * 36
            for w in range(3):
                Xw = [X[3 * k + w] for k in range(6)]
                for i in range(12):
                    row = _IMDCT12[i]
                    s = 0.0
                    for k in range(6):
                        s += Xw[k] * row[k]
                    x36[6 + 6 * w + i] += s * _WIN_SHORT[i]
        else:
            win = _WIN_LONG[block_type]
            x36 = [0.0] * 36
            if not any(X):
                pass  # zero granule: IMDCT of zeros is zeros
            else:
                for i in range(36):
                    row = _IMDCT36[i]
                    s = 0.0
                    for k in range(18):
                        s += X[k] * row[k]
                    x36[i] = s * win[i]
        prev = overlap[sb]
        for i in range(18):
            v = x36[i] + prev[i]
            # frequency inversion: odd subbands negate odd samples
            if sb & 1 and i & 1:
                v = -v
            out[18 * sb + i] = v
        overlap[sb] = x36[18:36]
    return out


# ------------------------------------------------------- synthesis --
# The polyphase matrixing N[i][k] = cos((16+i)(2k+1)pi/64) is the
# spec's closed form. The 512-tap windowing uses ISO Table B.3, which
# is pure table data: no copy exists on this box, so the default is a
# documented SUBSTITUTE prototype (the sine window of the MDCT
# family), which keeps the filterbank perfect-reconstruction-shaped
# for curation features. iso_window=True raises until a validated
# vector exists.

_SYNTH_N = [
    [math.cos((16 + i) * (2 * k + 1) * math.pi / 64.0) for k in range(32)]
    for i in range(64)
]
_SUBSTITUTE_D = [
    math.sin(math.pi * (i + 0.5) / 512.0) / 16.0 for i in range(512)
]


class Synthesizer:
    """32-subband -> PCM polyphase synthesis with the spec's matrixing
    and FIFO structure."""

    def __init__(self, iso_window: bool = False):
        if iso_window:
            raise NotImplementedError(
                "mp3: ISO Table B.3 synthesis window unavailable on this"
                " box (no closed form; substitute window documented in"
                " the module docstring)"
            )
        self.v = _np.zeros(1024) if _np is not None else [0.0] * 1024
        self.window = _SUBSTITUTE_D

    def step(self, subband_samples: list[float]) -> list[float]:
        """One time step: 32 subband samples -> 32 PCM samples."""
        if _np is not None:
            c = _np_consts()
            # shift the FIFO by 64; matrixing is one (64,32) matvec,
            # the windowed U-vector fold one fancy-indexed gather
            self.v = _np.concatenate(
                (c["N"] @ _np.asarray(subband_samples,
                                      dtype=_np.float64),
                 self.v[:960])
            )
            return (self.v[c["IDX"]] * c["DMAT"]).sum(axis=0).tolist()
        v = self.v
        # shift the FIFO by 64
        del v[960:]
        v[0:0] = [
            sum(_SYNTH_N[i][k] * subband_samples[k] for k in range(32))
            for i in range(64)
        ]
        D = self.window
        pcm = []
        for j in range(32):
            s = 0.0
            for i in range(16):
                # the spec's U-vector indexing: u[64*i'+j] with the
                # alternating 96+ offset fold
                off = (i >> 1) * 128
                if i & 1:
                    s += v[off + 96 + j] * D[32 * i + j]
                else:
                    s += v[off + j] * D[32 * i + j]
            pcm.append(s)
        return pcm


def decode_granule_channel(bits, g, hdr, sf) -> tuple[list[int],
                                                      list[float], int]:
    """Huffman + count1 + requant (+ reorder) for one granule/channel.
    ``bits`` must be positioned at the start of the huffman data;
    consumes exactly up to the part2_3 boundary. The third return is
    rzero — the first line past the CODED region (big values + count1)
    — which is the intensity-stereo border input (§2.4.3.4.9.3 keys on
    the right channel's zero part, not on decoded-value zeroness)."""
    limit = g["_huff_end_bit"]
    is_, pos = decode_spectrum(bits, g, hdr)
    pos = decode_count1(bits, g, limit, pos, is_)
    if bits.pos != limit:
        # ancillary/stuffing inside part2_3 is not legal; spec decoders
        # treat the remainder as zero region only when count1 stopped
        # short of 576 on the bit budget — which decode_count1 handles.
        raise ValueError(
            f"mp3: huffman data consumed {bits.pos} bits, side info"
            f" declared {limit}"
        )
    xr = requantize(is_, g, sf, hdr["sample_rate"])
    if g["block_type"] == 2 and g["window_switching"]:
        mixed = bool(g.get("mixed_block"))
        xr = reorder_short(xr, hdr["sample_rate"], mixed=mixed)
        is_r = [0] * 576
        # keep the integer spectrum in the same (reordered) layout the
        # float path uses, for exact-integer downstream features
        bands = SFB_SHORT[hdr["sample_rate"]]
        if mixed:
            is_r[:36] = is_[:36]
        idx = 36 if mixed else 0
        for b in range(3 if mixed else 0, len(bands) - 1):
            start, width = bands[b], bands[b + 1] - bands[b]
            for w in range(3):
                for k in range(width):
                    is_r[3 * (start + k) + w] = is_[idx]
                    idx += 1
        is_ = is_r
    return is_, xr, pos


def decode_mp3(payload: bytes, iso_window: bool = False) -> dict:
    """Bare MPEG stream -> {sample_rate, nch, n_frames, n_samples,
    spectra: [per granule [per ch is[576]]], pcm: [per ch list[float]],
    subband_energy: [32]} through the full Layer III chain (mono,
    MS/LR stereo, and r18: INTENSITY stereo over long AND pure-short
    blocks — value-rule borders, per-window positions, the
    MS+intensity combination — plus MPEG-1 MIXED BLOCKS: long windows
    on subbands 0-1, short on 2-31, with the mixed scalefactor
    layout, partial reorder, single-boundary alias reduction and the
    split IMDCT. Mixed-block intensity and LSF mixed blocks stay
    gated)."""
    frames = walk_frames(payload)
    if not frames:
        raise ValueError("mp3: no frames")
    hdr0 = frames[0]["header"]
    nch = hdr0["nch"]
    overlap = [[[0.0] * 18 for _ in range(32)] for _ in range(nch)]
    synths = [Synthesizer(iso_window=iso_window) for _ in range(nch)]
    pcm: list[list[float]] = [[] for _ in range(nch)]
    spectra = []
    sub_energy = [0.0] * 32
    prev_sf: list[dict] = [{} for _ in range(nch)]
    for f, buf in assemble_main_data(frames):
        hdr, side = f["header"], f["side"]
        bits = Bits(buf)
        for gr, chs in enumerate(side["granules"]):
            gr_is = []
            gr_xr = []
            gr_sf = []
            for ch, g in enumerate(chs):
                start = bits.pos
                if hdr["version"] == 1:
                    sf, part2 = _read_scalefactors_v1(
                        bits, g, prev_sf[ch], side["scfsi"][ch], gr
                    )
                else:
                    sf, part2 = _read_scalefactors_lsf(
                        bits, g, hdr["mode"] == 1 and hdr["mode_ext"] & 1
                    )
                if part2 > g["part2_3_length"]:
                    raise ValueError(
                        "mp3: scalefactors overran part2_3_length"
                    )
                prev_sf[ch] = sf
                g["_huff_end_bit"] = start + g["part2_3_length"]
                # third return (coded-region end) unused here: the
                # intensity border keys on decoded VALUES per the spec
                is_, xr, _rzero = decode_granule_channel(
                    bits, g, hdr, sf
                )
                gr_is.append(is_)
                gr_xr.append(xr)
                gr_sf.append(sf)
            if len(gr_xr) == 2 and hdr["mode"] == 1:
                stereo_process(
                    hdr, chs[1], gr_sf[1], gr_is[1],
                    gr_xr[0], gr_xr[1],
                )
            for ch, g in enumerate(chs):
                mixed = bool(g.get("mixed_block"))
                alias_reduce(
                    gr_xr[ch], g["block_type"], g["window_switching"],
                    mixed=mixed,
                )
                ss = imdct_granule(
                    gr_xr[ch], g["block_type"], g["window_switching"],
                    overlap[ch], mixed=mixed,
                )
                for sb in range(32):
                    e = 0.0
                    for i in range(18):
                        v = ss[18 * sb + i]
                        e += v * v
                    sub_energy[sb] += e
                for t in range(18):
                    pcm[ch].extend(
                        synths[ch].step(
                            [ss[18 * sb + t] for sb in range(32)]
                        )
                    )
            spectra.append(gr_is)
    return {
        "sample_rate": hdr0["sample_rate"],
        "nch": nch,
        "version": hdr0["version"],
        "n_frames": len(frames),
        "n_samples": len(pcm[0]),
        "spectra": spectra,
        "pcm": pcm,
        "subband_energy": sub_energy,
    }


# ------------------------------------------------------ fixture encoder --


_TABLE_MAX = {tid: _HUFF_RAW[tid][0] - 1 for tid in _HUFF_RAW}
_ENCODE_MAPS = {
    tid: {(idx // _HUFF_RAW[tid][1], idx % _HUFF_RAW[tid][1]): hh
          for idx, hh in enumerate(_HUFF_RAW[tid][3])}
    for tid in _HUFF_RAW
}


def _encode_granule(w: BitWriter, spec: dict, sr: int) -> dict:
    """Write one granule's scalefactor + huffman bits; returns the side
    info fields. ``spec``: {is (576 ints), global_gain,
    scalefac_compress, scalefac_l (21 ints), tables (3 ids),
    region0_count, region1_count, count1table (0/1), big_values,
    count1_quads, block_type/subblock_gain/scalefac_s for short}."""
    start = w.tell()
    short = spec.get("block_type", 0) == 2
    if not (0 <= spec.get("region0_count", 0) <= 15
            and 0 <= spec.get("region1_count", 0) <= 7
            and 0 <= spec["big_values"] <= 288):
        raise ValueError(
            "mp3 encoder: side-info field out of its bit width"
            " (region0<=15, region1<=7, big_values<=288)"
        )
    sfc = spec.get("scalefac_compress", 0)
    s1, s2 = SLEN1[sfc], SLEN2[sfc]
    is_ = spec["is"]
    def _wsf(value: int, slen: int) -> None:
        if not (0 <= value < (1 << slen)):
            raise ValueError(
                f"scalefactor {value} does not fit slen {slen}"
            )
        w.write(value, slen)

    if short and spec.get("mixed_block"):
        sfl = spec.get("scalefac_l") or [0] * 8
        for b in range(8):
            _wsf(sfl[b], s1)
        sfs = spec.get("scalefac_s") or [[0] * 3 for _ in range(12)]
        for b in range(3, 6):
            for wnd in range(3):
                _wsf(sfs[b][wnd], s1)
        for b in range(6, 12):
            for wnd in range(3):
                _wsf(sfs[b][wnd], s2)
    elif short:
        sfs = spec.get("scalefac_s") or [[0] * 3 for _ in range(12)]
        for b in range(6):
            for wnd in range(3):
                _wsf(sfs[b][wnd], s1)
        for b in range(6, 12):
            for wnd in range(3):
                _wsf(sfs[b][wnd], s2)
    else:
        sfl = spec.get("scalefac_l") or [0] * 21
        for b in range(11):
            _wsf(sfl[b], s1)
        for b in range(11, 21):
            _wsf(sfl[b], s2)
    tables = spec["tables"]
    big = 2 * spec["big_values"]
    if short:
        region1_start, region2_start = 36, 576
    else:
        lb = SFB_LONG[sr]
        region1_start = lb[min(spec["region0_count"] + 1, len(lb) - 1)]
        region2_start = lb[min(
            spec["region0_count"] + 1 + spec["region1_count"] + 1,
            len(lb) - 1,
        )]
    pos = 0
    while pos < big:
        if pos < region1_start:
            tid = tables[0]
        elif pos < region2_start:
            tid = tables[1]
        else:
            tid = tables[2]
        x, y = is_[pos], is_[pos + 1]
        if tid == 0:
            if x or y:
                raise ValueError("table 0 region carries nonzero lines")
            pos += 2
            continue
        if tid in _GATED_TABLES or tid not in _HUFF_RAW:
            raise NotImplementedError(f"mp3 encoder: table {tid}")
        mx = _TABLE_MAX[tid]
        ax, ay = abs(x), abs(y)
        if ax > mx or ay > mx:
            raise ValueError(f"value {x},{y} exceeds table {tid} range")
        hlen, hcod = _ENCODE_MAPS[tid][(ax, ay)]
        w.write(hcod, hlen)
        if ax:
            w.write(1 if x < 0 else 0, 1)
        if ay:
            w.write(1 if y < 0 else 0, 1)
        pos += 2
    c1map = (_COUNT1_A, _COUNT1_B)[spec.get("count1table", 0)]
    for _q in range(spec.get("count1_quads", 0)):
        vals = is_[pos : pos + 4]
        v = 0
        for j, val in enumerate(vals):
            if abs(val) > 1:
                raise ValueError("count1 region carries |value| > 1")
            if val:
                v |= 1 << (3 - j)
        hlen, hcod = c1map[v]
        w.write(hcod, hlen)
        for val in vals:
            if val:
                w.write(1 if val < 0 else 0, 1)
        pos += 4
    for i in range(pos, 576):
        if is_[i]:
            raise ValueError("nonzero line beyond the coded regions")
    side = {
        "part2_3_length": w.tell() - start,
        "big_values": spec["big_values"],
        "global_gain": spec.get("global_gain", 210),
        "scalefac_compress": sfc,
        "window_switching": 1 if short else 0,
        "block_type": spec.get("block_type", 0),
        "mixed_block": 1 if (short and spec.get("mixed_block")) else 0,
        "table_select": tables,
        "subblock_gain": spec.get("subblock_gain", [0, 0, 0]),
        "region0_count": spec.get("region0_count", 0),
        "region1_count": spec.get("region1_count", 0),
        "preflag": spec.get("preflag", 0),
        "scalefac_scale": spec.get("scalefac_scale", 0),
        "count1table_select": spec.get("count1table", 0),
    }
    return side


def encode_mp3(granule_specs: list[dict], sample_rate: int = 44100,
               bitrate_kbps: int = 128) -> bytes:
    """Fixture encoder: granule specs (pairs per MPEG-1 frame) -> a bare
    mono MPEG-1 Layer III stream with main_data_begin=0 per frame and
    zero-byte ancillary padding. Every header/side-info field is real;
    the planted integer spectra round-trip exactly (Huffman is
    lossless)."""
    if len(granule_specs) % 2:
        raise ValueError("MPEG-1 frames carry exactly two granules")
    br_idx = BITRATES_V1_L3.index(bitrate_kbps)
    sr_idx = RATES_V1.index(sample_rate)
    out = bytearray()
    for at in range(0, len(granule_specs), 2):
        frame_len = 144 * bitrate_kbps * 1000 // sample_rate
        header = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (br_idx << 12) | (sr_idx << 10) | (3 << 6)
        mdw = BitWriter()
        sides = [_encode_granule(mdw, granule_specs[at + gr], sample_rate)
                 for gr in range(2)]
        main = mdw.to_bytes()
        sw = BitWriter()
        sw.write(0, 9)   # main_data_begin: no reservoir in fixtures
        sw.write(0, 5)   # private
        sw.write(0, 4)   # scfsi: granule 1 re-reads its scalefactors
        for side in sides:
            sw.write(side["part2_3_length"], 12)
            sw.write(side["big_values"], 9)
            sw.write(side["global_gain"], 8)
            sw.write(side["scalefac_compress"], 4)
            sw.write(side["window_switching"], 1)
            if side["window_switching"]:
                sw.write(side["block_type"], 2)
                sw.write(side["mixed_block"], 1)
                for t in side["table_select"][:2]:
                    sw.write(t, 5)
                for sb in side["subblock_gain"]:
                    sw.write(sb, 3)
            else:
                for t in side["table_select"]:
                    sw.write(t, 5)
                sw.write(side["region0_count"], 4)
                sw.write(side["region1_count"], 3)
            sw.write(side["preflag"], 1)
            sw.write(side["scalefac_scale"], 1)
            sw.write(side["count1table_select"], 1)
        si = sw.to_bytes()
        assert len(si) == 17, len(si)
        body = struct.pack(">I", header) + si + main
        if len(body) > frame_len:
            raise ValueError(
                f"granule data ({len(body)} B) exceeds the {frame_len}-B"
                " frame; raise the bitrate"
            )
        out += body + bytes(frame_len - len(body))
    return bytes(out)


def encode_mp3_stereo(granule_specs: list[list[dict]],
                      sample_rate: int = 44100,
                      bitrate_kbps: int = 256,
                      mode_ext: int = 0) -> bytes:
    """Fixture encoder, STEREO (r18, for intensity/MS validation):
    ``granule_specs[g] = [spec_ch0, spec_ch1]`` with two granules per
    MPEG-1 frame. Writes mode=1 (joint stereo) with the given
    ``mode_ext`` (bit 1 = intensity, bit 2 = MS) and the 32-byte
    stereo side info (3 private bits, 2x4 scfsi, 4x59-bit granule
    blocks). The planted integer spectra are what the decoder's
    Huffman stage recovers BEFORE stereo processing — intensity/MS
    reconstruction applies to the requantized float spectra, so
    fixtures plant the transmitted (combined) channel and the oracle
    applies the §2.4.3.4.9 formulas closed-form."""
    if len(granule_specs) % 2:
        raise ValueError("MPEG-1 frames carry exactly two granules")
    br_idx = BITRATES_V1_L3.index(bitrate_kbps)
    sr_idx = RATES_V1.index(sample_rate)
    out = bytearray()
    for at in range(0, len(granule_specs), 2):
        frame_len = 144 * bitrate_kbps * 1000 // sample_rate
        header = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)             | (br_idx << 12) | (sr_idx << 10) | (1 << 6)             | (mode_ext << 4)
        mdw = BitWriter()
        sides = []
        for gr in range(2):
            pair = granule_specs[at + gr]
            if len(pair) != 2:
                raise ValueError("stereo granule needs two channels")
            sides.append([
                _encode_granule(mdw, pair[ch], sample_rate)
                for ch in range(2)
            ])
        main = mdw.to_bytes()
        sw = BitWriter()
        sw.write(0, 9)   # main_data_begin
        sw.write(0, 3)   # private (stereo)
        sw.write(0, 8)   # scfsi 2ch x 4
        for gr in range(2):
            for ch in range(2):
                side = sides[gr][ch]
                sw.write(side["part2_3_length"], 12)
                sw.write(side["big_values"], 9)
                sw.write(side["global_gain"], 8)
                sw.write(side["scalefac_compress"], 4)
                sw.write(side["window_switching"], 1)
                if side["window_switching"]:
                    sw.write(side["block_type"], 2)
                    sw.write(side["mixed_block"], 1)
                    for t in side["table_select"][:2]:
                        sw.write(t, 5)
                    for sb in side["subblock_gain"]:
                        sw.write(sb, 3)
                else:
                    for t in side["table_select"]:
                        sw.write(t, 5)
                    sw.write(side["region0_count"], 4)
                    sw.write(side["region1_count"], 3)
                sw.write(side["preflag"], 1)
                sw.write(side["scalefac_scale"], 1)
                sw.write(side["count1table_select"], 1)
        si = sw.to_bytes()
        assert len(si) == 32, len(si)
        body = struct.pack(">I", header) + si + main
        if len(body) > frame_len:
            raise ValueError(
                f"granule data ({len(body)} B) exceeds the"
                f" {frame_len}-B frame; raise the bitrate"
            )
        out += body + bytes(frame_len - len(body))
    return bytes(out)


def encode_mp3_lsf(granule_specs: list[dict], sample_rate: int = 22050,
                   bitrate_kbps: int = 64) -> bytes:
    """Fixture encoder, MPEG-2 LSF form: one granule per frame, 9-byte
    mono side info, 9-bit scalefac_compress with the 13818-3 partition
    slens (long blocks; preflag derived from the sfc range). Pins the
    LSF scalefactor path with NONZERO values — the real LAME vector on
    this box is silence (every slen 0). Reuses _encode_granule for the
    huffman body by writing the MPEG-1 scalefactor section with
    scalefac_compress=0 (zero slens -> zero bits) and prepending the
    LSF scalefactor bits here."""
    br_idx = BITRATES_V2_L3.index(bitrate_kbps)
    sr_idx = RATES_V2.index(sample_rate)
    out = bytearray()
    for spec in granule_specs:
        if spec.get("block_type", 0) == 2:
            raise NotImplementedError("LSF fixture writes long blocks")
        frame_len = 72 * bitrate_kbps * 1000 // sample_rate
        header = (0x7FF << 21) | (2 << 19) | (1 << 17) | (1 << 16) \
            | (br_idx << 12) | (sr_idx << 10) | (3 << 6)
        sfc = spec.get("scalefac_compress", 0)
        slen, nsfb, _pre = _lsf_layout(sfc, False)
        mdw = BitWriter()
        start = mdw.tell()
        sfl = spec.get("scalefac_l") or [0] * 21
        at = 0
        for n, sl in zip(nsfb, slen):
            for _ in range(n):
                v = sfl[at] if at < len(sfl) else 0
                if not (0 <= v < (1 << sl)):
                    raise ValueError(
                        f"LSF scalefactor {v} does not fit slen {sl}"
                    )
                mdw.write(v, sl)
                at += 1
        # huffman body via the MPEG-1 granule writer with an
        # all-zero-slen scalefactor section (writes no bits)
        body_spec = dict(spec, scalefac_compress=0, scalefac_l=[0] * 21)
        side = _encode_granule(mdw, body_spec, sample_rate)
        side["part2_3_length"] = mdw.tell() - start
        main = mdw.to_bytes()
        sw = BitWriter()
        sw.write(0, 8)   # main_data_begin
        sw.write(0, 1)   # private (mono LSF)
        sw.write(side["part2_3_length"], 12)
        sw.write(side["big_values"], 9)
        sw.write(side["global_gain"], 8)
        sw.write(sfc, 9)
        sw.write(0, 1)   # window_switching (long)
        for t in side["table_select"]:
            sw.write(t, 5)
        sw.write(side["region0_count"], 4)
        sw.write(side["region1_count"], 3)
        sw.write(side["scalefac_scale"], 1)
        sw.write(side["count1table_select"], 1)
        si = sw.to_bytes()
        assert len(si) == 9, len(si)
        body = struct.pack(">I", header) + si + main
        if len(body) > frame_len:
            raise ValueError("LSF granule exceeds the frame; raise bitrate")
        out += body + bytes(frame_len - len(body))
    return bytes(out)
