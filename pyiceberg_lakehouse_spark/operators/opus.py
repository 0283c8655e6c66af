"""Opus METADATA/TOC layer, from scratch (VERDICT r17 task #5).

Opus (RFC 6716) is the dominant podcast/voice codec; full payload
decode (SILK + CELT) is a separate scoped project, but a crawl
pipeline gets most of its value from the PROBE layer — stream
identity, channel layout, per-packet timing — which is fully
specified without touching compressed payload bits:

- RFC 7845 §5.1 ``OpusHead``: version, channel count, pre-skip,
  input sample rate, output gain, channel mapping family 0/1/255
  with the stream-count/coupled-count/mapping table;
- RFC 6716 §3.1 TOC byte: config 0-31 -> (mode, bandwidth, frame
  duration), stereo flag, frame-count code 0-3;
- RFC 6716 §3.2 frame packing codes incl. the code-3 VBR/padding
  byte and the 1/2-byte frame-length coding, with the R1-R7
  well-formedness rules enforced (a malformed packet REJECTS, it
  never guesses);
- RFC 7845 §4 Ogg mapping: OpusHead alone on the BOS page, OpusTags
  before any audio, granule positions counted in 48 kHz samples
  (every Opus config yields an integral 48 kHz sample count).

Payload DECODE stays honestly gated (``decode_opus_packet``).

Reference parity: the reference ships no audio decoding at all (its
media handling is parquet-column passthrough); this layer exists for
the training-data-pipeline surface (SURVEY §2's multimodal columns).
"""

from __future__ import annotations

import struct

# config -> (mode, bandwidth, frame duration in µs). RFC 6716 §3.1's
# table, rows 0-31.
_CONFIGS: list[tuple[str, str, int]] = (
    [("SILK", "NB", d) for d in (10000, 20000, 40000, 60000)]
    + [("SILK", "MB", d) for d in (10000, 20000, 40000, 60000)]
    + [("SILK", "WB", d) for d in (10000, 20000, 40000, 60000)]
    + [("HYBRID", "SWB", d) for d in (10000, 20000)]
    + [("HYBRID", "FB", d) for d in (10000, 20000)]
    + [("CELT", "NB", d) for d in (2500, 5000, 10000, 20000)]
    + [("CELT", "WB", d) for d in (2500, 5000, 10000, 20000)]
    + [("CELT", "SWB", d) for d in (2500, 5000, 10000, 20000)]
    + [("CELT", "FB", d) for d in (2500, 5000, 10000, 20000)]
)
assert len(_CONFIGS) == 32


def parse_opus_head(packet: bytes) -> dict:
    """RFC 7845 §5.1 identification header -> dict. Channel mapping
    family 0 (mono/stereo) has no mapping table; families 1 (Vorbis
    order, up to 8 channels) and 255 (discrete) carry
    stream_count / coupled_count / channel_mapping, validated per the
    spec's index rule (entry < streams + coupled, or 255 = silent)."""
    if packet[:8] != b"OpusHead":
        raise ValueError("not an OpusHead packet")
    if len(packet) < 19:
        raise ValueError("OpusHead shorter than its fixed fields")
    version = packet[8]
    if version >> 4 != 0:
        raise ValueError(f"unsupported OpusHead version {version}")
    channels = packet[9]
    if channels == 0:
        raise ValueError("OpusHead declares zero channels")
    pre_skip = struct.unpack_from("<H", packet, 10)[0]
    input_rate = struct.unpack_from("<I", packet, 12)[0]
    # Q7.8 signed dB attenuation applied by a compliant player
    output_gain_q8 = struct.unpack_from("<h", packet, 16)[0]
    family = packet[18]
    out = {
        "version": version,
        "channels": channels,
        "pre_skip": pre_skip,
        "input_sample_rate": input_rate,
        "output_gain_q8": output_gain_q8,
        "mapping_family": family,
    }
    if family == 0:
        if channels > 2:
            raise ValueError(
                "mapping family 0 allows only 1-2 channels, got"
                f" {channels}"
            )
        if len(packet) != 19:
            raise ValueError(
                "mapping family 0 must end after the family byte"
            )
        out["stream_count"] = 1
        out["coupled_count"] = channels - 1
        out["channel_mapping"] = list(range(channels))
        return out
    if family == 1 and channels > 8:
        raise ValueError(
            f"mapping family 1 allows 1-8 channels, got {channels}"
        )
    if len(packet) < 21 + channels:
        raise ValueError("OpusHead mapping table truncated")
    streams = packet[19]
    coupled = packet[20]
    if streams < 1:
        raise ValueError("stream_count must be >= 1")
    if coupled > streams:
        raise ValueError("coupled_count exceeds stream_count")
    if streams + coupled > 255:
        raise ValueError("stream_count + coupled_count exceeds 255")
    mapping = list(packet[21 : 21 + channels])
    for m in mapping:
        if m != 255 and m >= streams + coupled:
            raise ValueError(
                f"channel_mapping index {m} out of range for"
                f" {streams}+{coupled} decoded channels"
            )
    out["stream_count"] = streams
    out["coupled_count"] = coupled
    out["channel_mapping"] = mapping
    return out


def parse_opus_toc(b: int) -> dict:
    """TOC byte -> {config, mode, bandwidth, frame_us, stereo, code}."""
    config = b >> 3
    mode, bw, dur = _CONFIGS[config]
    return {
        "config": config,
        "mode": mode,
        "bandwidth": bw,
        "frame_us": dur,
        "stereo": bool((b >> 2) & 1),
        "code": b & 3,
    }


def _frame_len(data: bytes, at: int) -> tuple[int, int]:
    """§3.2.1 frame length: 0 -> DTX, 1..251 verbatim, 252..255 take a
    second byte (len = b2*4 + b1)."""
    if at >= len(data):
        raise ValueError("opus packet truncated in a frame length")
    b1 = data[at]
    if b1 < 252:
        return b1, at + 1
    if at + 1 >= len(data):
        raise ValueError("opus packet truncated in a 2-byte length")
    return data[at + 1] * 4 + b1, at + 2


def parse_opus_packet(data: bytes) -> dict:
    """RFC 6716 §3.2 packet -> TOC fields + frame layout. Enforces
    R1 (non-empty), R2 (frame <= 1275), R3/R6 (CBR divisibility),
    R4 (code-2 length fits), R5 (code-3 count 1..48, total <= 120 ms),
    R7 (padding declared fits). Returns frame sizes, vbr/padding
    flags, and the packet's 48 kHz sample count (config duration x
    frame count — integral for every config)."""
    if not data:
        raise ValueError("R1: empty opus packet")
    toc = parse_opus_toc(data[0])
    body = data[1:]
    vbr = False
    padding = 0
    if toc["code"] == 0:
        frames = [len(body)]
    elif toc["code"] == 1:
        if len(body) % 2:
            raise ValueError("R3: code-1 packet body must split evenly")
        frames = [len(body) // 2] * 2
    elif toc["code"] == 2:
        n1, at = _frame_len(body, 0)
        if n1 > len(body) - at:
            raise ValueError("R4: code-2 first frame exceeds packet")
        frames = [n1, len(body) - at - n1]
    else:
        if not body:
            raise ValueError("code-3 packet lacks the frame-count byte")
        fc = body[0]
        vbr = bool(fc & 0x80)
        has_pad = bool(fc & 0x40)
        m = fc & 0x3F
        if not 1 <= m <= 48:
            raise ValueError(f"R5: code-3 frame count {m} not in 1..48")
        if m * toc["frame_us"] > 120_000:
            raise ValueError(
                f"R5: {m} frames of {toc['frame_us']} us exceed 120 ms"
            )
        at = 1
        if has_pad:
            while True:
                if at >= len(body):
                    raise ValueError("padding length runs off the packet")
                p = body[at]
                at += 1
                padding += 254 if p == 255 else p
                if p != 255:
                    break
        if vbr:
            sizes = []
            for _ in range(m - 1):
                n, at = _frame_len(body, at)
                sizes.append(n)
            rest = len(body) - at - padding
            if rest < sum(sizes):
                raise ValueError("R7: VBR frames overrun the packet")
            frames = sizes + [rest - sum(sizes)]
        else:
            rest = len(body) - at - padding
            if rest < 0:
                raise ValueError("R7: padding exceeds the packet")
            if rest % m:
                raise ValueError(
                    "R6: CBR code-3 body must divide by the frame count"
                )
            frames = [rest // m] * m
    for fl in frames:
        if fl > 1275:
            raise ValueError(f"R2: frame of {fl} bytes exceeds 1275")
        if fl < 0:
            raise ValueError("frame length underflow")
    samples48 = len(frames) * toc["frame_us"] * 48 // 1000
    return {
        **toc,
        "n_frames": len(frames),
        "frame_sizes": frames,
        "vbr": vbr,
        "padding": padding,
        "samples48": samples48,
    }


def build_opus_head(
    channels: int = 2,
    pre_skip: int = 312,
    input_rate: int = 48000,
    output_gain_q8: int = 0,
    mapping_family: int = 0,
    stream_count: int | None = None,
    coupled_count: int | None = None,
    channel_mapping: list[int] | None = None,
) -> bytes:
    out = bytearray(b"OpusHead\x01")
    out += bytes([channels])
    out += struct.pack("<HIh", pre_skip, input_rate, output_gain_q8)
    out += bytes([mapping_family])
    if mapping_family != 0:
        out += bytes([stream_count, coupled_count])
        out += bytes(channel_mapping)
    return bytes(out)


def build_opus_packet(
    config: int,
    frames: list[bytes],
    stereo: bool = False,
    vbr: bool | None = None,
    padding: int = 0,
) -> bytes:
    """Assemble a spec-valid packet for the given frame payloads,
    choosing the tightest code (0/1/2/3) unless vbr/padding force
    code 3."""
    toc = (config << 3) | (0x04 if stereo else 0)
    if vbr is None:
        vbr = len({len(f) for f in frames}) > 1
    if len(frames) == 1 and not padding:
        return bytes([toc | 0]) + frames[0]
    if (len(frames) == 2 and not vbr and not padding
            and len(frames[0]) == len(frames[1])):
        return bytes([toc | 1]) + frames[0] + frames[1]
    if len(frames) == 2 and vbr and not padding:
        n1 = len(frames[0])
        enc = (bytes([n1]) if n1 < 252
               else bytes([252 + (n1 & 3), (n1 - 252 - (n1 & 3)) // 4]))
        return bytes([toc | 2]) + enc + frames[0] + frames[1]
    fc = len(frames) | (0x80 if vbr else 0) | (0x40 if padding else 0)
    out = bytearray([toc | 3, fc])
    if padding:
        p = padding
        while p >= 255:
            out.append(255)
            p -= 254
        out.append(p)
    if vbr:
        for f in frames[:-1]:
            n = len(f)
            if n < 252:
                out.append(n)
            else:
                out += bytes([252 + (n & 3), (n - 252 - (n & 3)) // 4])
    for f in frames:
        out += f
    out += bytes(padding)
    return bytes(out)


def make_ogg_opus(
    head: bytes,
    tags: bytes,
    audio_packets: list[bytes],
    serial: int = 1,
    max_segments: int = 255,
) -> bytes:
    """RFC 7845 §4 framing: OpusHead ALONE on the BOS page, OpusTags
    finishing before audio starts, granule positions = pre-skip +
    cumulative 48 kHz samples (header pages carry granule 0)."""
    from pyiceberg_lakehouse_spark.operators.ogg import make_ogg

    pre_skip = parse_opus_head(head)["pre_skip"]
    grans = [0, 0]
    total = pre_skip
    for p in audio_packets:
        total += parse_opus_packet(p)["samples48"]
        grans.append(total)
    return make_ogg(
        [head, tags] + audio_packets,
        serial=serial,
        max_segments=max_segments,
        granules=grans,
        page_break_after={0, 1},
    )


def probe_ogg_opus(payload: bytes) -> dict:
    """Walk an Ogg Opus stream: identification + tags + every audio
    packet's TOC, with the RFC 7845 framing rules enforced (§4: BOS
    page holds OpusHead alone; the final granule equals pre-skip +
    total samples). -> {head fields, vendor, tags, n_packets,
    n_frames, samples48 (pre-skip NOT subtracted), out_samples48
    (playback length after pre-skip), duration_us at 48 kHz,
    mode/bandwidth/stereo packet counters, max_frame_bytes}."""
    from pyiceberg_lakehouse_spark.operators.ogg import (
        parse_comment_header,
        parse_ogg_chain,
    )

    stream = parse_ogg_chain(payload)[0]
    pkts = stream["packets"]
    if len(pkts) < 2:
        raise ValueError("Ogg Opus needs OpusHead + OpusTags packets")
    head = parse_opus_head(pkts[0]["data"])
    if pkts[0]["last_page"] != 0 or pkts[1]["first_page"] == 0:
        raise ValueError(
            "RFC 7845 §4: OpusHead must sit ALONE on the BOS page"
        )
    com = parse_comment_header(pkts[1]["data"])
    if com["codec"] != "opus":
        raise ValueError("second packet is not OpusTags")
    modes: dict[str, int] = {"SILK": 0, "HYBRID": 0, "CELT": 0}
    bands: dict[str, int] = {}
    n_frames = 0
    n_stereo = 0
    n_vbr = 0
    samples = 0
    max_frame = 0
    for p in pkts[2:]:
        info = parse_opus_packet(p["data"])
        modes[info["mode"]] += 1
        bands[info["bandwidth"]] = bands.get(info["bandwidth"], 0) + 1
        n_frames += info["n_frames"]
        n_stereo += int(info["stereo"])
        n_vbr += int(info["vbr"])
        samples += info["samples48"]
        if info["frame_sizes"]:
            max_frame = max(max_frame, max(info["frame_sizes"]))
    final_gran = pkts[-1]["granule"]
    if len(pkts) > 2 and final_gran not in (
        -1 & 0xFFFFFFFFFFFFFFFF, head["pre_skip"] + samples
    ):
        raise ValueError(
            f"final granule {final_gran} != pre_skip + samples"
            f" ({head['pre_skip'] + samples})"
        )
    play_samples = max(samples - head["pre_skip"], 0)
    return {
        **head,
        "vendor": com["vendor"],
        "tags": com["tags"],
        "n_packets": len(pkts) - 2,
        "n_frames": n_frames,
        "n_stereo_packets": n_stereo,
        "n_vbr_packets": n_vbr,
        "samples48": samples,
        "out_samples48": play_samples,
        "duration_us": samples * 1000 // 48,
        "n_silk": modes["SILK"],
        "n_hybrid": modes["HYBRID"],
        "n_celt": modes["CELT"],
        "bandwidths": bands,
        "max_frame_bytes": max_frame,
        "n_pages": stream["n_pages"],
    }


def decode_opus_packet(data: bytes):  # pragma: no cover - honesty gate
    """Payload decode needs the SILK and CELT decoders (range coder,
    LPC/LTP synthesis, MDCT with PVQ) — a scoped from-scratch project
    not yet shipped. The TOC/metadata layer above is complete."""
    raise NotImplementedError(
        "opus payload decode (SILK+CELT) is not implemented; probe and"
        " TOC parsing are (probe_ogg_opus/parse_opus_packet)"
    )
