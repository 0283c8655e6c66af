"""Ogg container (RFC 3533) — page walk + packet reassembly.

The streaming-audio container podcasts/Vorbis/Opus ship in. The
subtle, correctness-critical parts a demuxer must get right:

- lacing: a packet is laced as floor(len/255) values of 255 plus one
  final value len % 255 — so a packet whose length is an exact
  multiple of 255 ends with a 0 lacing value (the classic off-by-one);
- spanning: a page holds at most 255 lacing values; a packet whose
  lacing spills to the next page sets that page's CONTINUATION flag,
  and a packet is complete only at its first lacing value < 255;
- the 32-bit Ogg CRC: polynomial 0x04C11DB7, UNREFLECTED, init 0,
  no final xor — computed with the header's CRC field zeroed;
- page sequence numbers are per-stream and must increase by exactly 1
  (a gap means data loss); BOS marks the first page, EOS the last.

Chained streams (RFC 3533 §2: a logical stream ends with EOS and a
NEW logical stream with a distinct serial begins at a BOS page — the
shape real podcast files take at every metadata change) parse via
parse_ogg_chain, one link at a time, each link's page sequence
restarting at 0 and every link's serial checked unique across the
chain. parse_ogg stays the strict single-stream form.

GROUPED (interleaved-serial) files — the A/V layout where audio and
video pages interleave — demux via parse_ogg_group/make_ogg_group:
all BOS pages must precede all data pages (the RFC 3533 grouping
rule), each logical stream carries its own sequence space and
packet-spanning state, per-page CRCs verified, EOS required per
stream. parse_ogg/_parse_stream stay the strict single-stream and
chain forms (a second serial mid-link there is a structure error,
routed to the group parser by the caller).

Honest scope: this is the demux layer; VORBIS payload decode
(floor1 + residue2 mono PCM) now lives in operators/vorbis.py —
Opus payloads stay opaque. Chained-of-grouped hybrids (a new BOS
after all streams' EOS) remain unimplemented and raise.
"""

from __future__ import annotations

import struct

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _make_pages(
    packets: list[bytes],
    serial: int,
    max_segments: int,
    granules: list[int] | None,
    page_break_after: set[int] | None = None,
) -> list[bytes]:
    """Mux packets into a list of complete page byte strings.
    ``page_break_after``: packet indexes whose completion FLUSHES the
    page early (RFC 7845 §4 needs OpusHead alone on the BOS page and
    OpusTags finishing before audio starts)."""
    if not 1 <= max_segments <= 255:
        raise ValueError("max_segments must be 1..255")
    if granules is not None and len(granules) != len(packets):
        raise ValueError("granules must have one entry per packet")
    # flatten every packet to (lacing value, data slice, completes_idx)
    lacings: list[tuple[int, bytes, int | None]] = []
    for idx, p in enumerate(packets):
        n_full, tail = divmod(len(p), 255)
        off = 0
        for _k in range(n_full):
            lacings.append((255, p[off : off + 255], None))
            off += 255
        lacings.append((tail, p[off:], idx))
    pages: list[bytes] = []
    page_seq = 0
    pos = 0
    continued = False
    while pos < len(lacings):
        segs = lacings[pos : pos + max_segments]
        if page_break_after:
            for j, (_v, _d, c) in enumerate(segs):
                if c is not None and c in page_break_after:
                    segs = segs[: j + 1]
                    break
        pos += len(segs)
        completes = [c for _, _, c in segs if c is not None]
        # a packet is split across pages iff the page's LAST lacing is
        # 255 (more of that packet follows)
        next_continued = segs[-1][0] == 255 and pos < len(lacings)
        granule = -1 & 0xFFFFFFFFFFFFFFFF
        if completes:
            last = completes[-1]
            granule = (
                granules[last] if granules is not None else last + 1
            ) & 0xFFFFFFFFFFFFFFFF
        header_type = (
            (0x01 if continued else 0)
            | (0x02 if page_seq == 0 else 0)
            | (0x04 if pos >= len(lacings) else 0)
        )
        body = b"".join(d for _, d, _ in segs)
        header = (
            b"OggS\x00"
            + bytes([header_type])
            + struct.pack("<QIIi", granule, serial, page_seq, 0)
            + bytes([len(segs)])
            + bytes(v for v, _, _ in segs)
        )
        crc = ogg_crc(header + body)
        header = header[:22] + struct.pack("<I", crc) + header[26:]
        pages.append(header + body)
        page_seq += 1
        continued = next_continued
    return pages


def make_ogg(
    packets: list[bytes],
    serial: int = 1,
    max_segments: int = 255,
    granules: list[int] | None = None,
    page_break_after: set[int] | None = None,
) -> bytes:
    """Mux packets into Ogg pages. ``max_segments`` (<= 255) caps the
    lacing values per page (small values force packet spanning, which
    exercises the continuation flag). ``granules[i]`` is the granule
    position stamped on the page where packet i COMPLETES (default:
    i + 1); pages where no packet completes carry -1 per spec.
    ``page_break_after`` forces a page boundary after the listed
    packet indexes (the RFC 7845 header-page rule)."""
    return b"".join(_make_pages(
        packets, serial, max_segments, granules, page_break_after
    ))


def make_ogg_group(
    streams: list[dict],
    interleave: int = 1,
) -> bytes:
    """Mux a GROUPED physical stream (RFC 3533 §2: concurrent logical
    bitstreams — the A/V layout): each ``streams[i]`` is {serial,
    packets, max_segments?, granules?}. All BOS pages are emitted
    first in stream order (the grouping rule), then the remaining
    pages interleave round-robin ``interleave`` pages at a time."""
    serials = [s["serial"] for s in streams]
    if len(set(serials)) != len(serials):
        raise ValueError("grouped streams need distinct serials")
    if interleave < 1:
        raise ValueError("interleave must be positive")
    per = [
        _make_pages(
            s["packets"], s["serial"],
            s.get("max_segments", 255), s.get("granules"),
        )
        for s in streams
    ]
    out = bytearray()
    for pages in per:
        out += pages[0]  # every BOS page first, in stream order
    cursors = [1] * len(per)
    while True:
        emitted = False
        for i, pages in enumerate(per):
            take = pages[cursors[i] : cursors[i] + interleave]
            cursors[i] += len(take)
            for pg in take:
                out += pg
                emitted = True
        if not emitted:
            return bytes(out)


def parse_ogg(payload: bytes) -> dict:
    """-> {serial, n_pages, packets: [{idx, size, data, first_page,
    last_page, granule}]}. Strict: CRC, capture pattern, sequence
    continuity and continuation-flag consistency all validated.
    Single-stream form: a chained file (a second link after EOS)
    raises — use parse_ogg_chain for those."""
    stream, pos = _parse_stream(payload, 0, set())
    if pos < len(payload):
        raise ValueError(
            "data after the EOS page (chained stream: use parse_ogg_chain)"
        )
    return stream


def parse_ogg_chain(payload: bytes) -> list[dict]:
    """RFC 3533 chained physical bitstream -> one parse_ogg-shaped dict
    per link, in order. Each link must begin at a BOS page with a
    serial unused by every earlier link and end with EOS before the
    next begins; grouping (a second serial inside a link) raises."""
    links: list[dict] = []
    used: set[int] = set()
    pos = 0
    while pos < len(payload):
        stream, pos = _parse_stream(payload, pos, used)
        used.add(stream["serial"])
        links.append(stream)
    if not links:
        raise ValueError("empty Ogg payload")
    return links


def parse_ogg_group(payload: bytes) -> list[dict]:
    """GROUPED physical stream (RFC 3533 §2, the A/V layout) -> one
    parse_ogg-shaped dict per logical stream, in BOS order.

    Validates the grouping rule (every BOS page precedes every data
    page), per-page CRCs, per-STREAM sequence continuity and
    continuation-flag consistency (each logical stream carries its own
    sequence space and packet-spanning state), no pages after a
    stream's EOS, and that every stream reaches EOS."""
    n = len(payload)
    pos = 0
    order: list[int] = []
    state: dict[int, dict] = {}
    bos_zone = True
    while pos < n:
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError("lost Ogg capture pattern")
        if pos + 27 > n:
            raise ValueError("truncated Ogg page header")
        if payload[pos + 4] != 0:
            raise ValueError("unknown Ogg stream structure version")
        header_type = payload[pos + 5]
        granule, serial, seq, crc_stored = struct.unpack_from(
            "<QIIi", payload, pos + 6
        )
        n_segs = payload[pos + 26]
        seg_table = payload[pos + 27 : pos + 27 + n_segs]
        if len(seg_table) != n_segs:
            raise ValueError("truncated Ogg segment table")
        body_start = pos + 27 + n_segs
        body_len = sum(seg_table)
        if body_start + body_len > n:
            raise ValueError("Ogg page body exceeds the file")
        zeroed = (
            payload[pos : pos + 22]
            + b"\x00\x00\x00\x00"
            + payload[pos + 26 : body_start + body_len]
        )
        if ogg_crc(zeroed) != crc_stored & 0xFFFFFFFF:
            raise ValueError(f"Ogg CRC mismatch on page seq {seq}")
        if header_type & 0x02:
            if not bos_zone:
                raise ValueError(
                    "grouped stream: BOS page after data pages "
                    "(RFC 3533 grouping rule)"
                )
            if serial in state:
                raise ValueError(f"duplicate BOS for serial {serial}")
            if seq != 0:
                raise ValueError("BOS page with nonzero sequence")
            state[serial] = {
                "expected_seq": 0, "packets": [], "partial": None,
                "partial_first_page": None, "n_pages": 0, "eos": False,
            }
            order.append(serial)
        else:
            bos_zone = False
            if serial not in state:
                raise ValueError(
                    f"page for unknown serial {serial} (no BOS)"
                )
            if state[serial]["eos"]:
                raise ValueError(f"page after EOS on serial {serial}")
        st = state[serial]
        if seq != st["expected_seq"]:
            raise ValueError(
                f"serial {serial}: page sequence gap: got {seq}, "
                f"expected {st['expected_seq']}"
            )
        st["expected_seq"] += 1
        if bool(header_type & 0x01) != (st["partial"] is not None):
            raise ValueError(
                "continuation flag disagrees with the packet state"
            )
        if header_type & 0x04:
            st["eos"] = True
        off = body_start
        for v in seg_table:
            if st["partial"] is None:
                st["partial"] = bytearray()
                st["partial_first_page"] = seq
            st["partial"] += payload[off : off + v]
            off += v
            if v < 255:  # the packet completes here
                st["packets"].append(
                    {
                        "idx": len(st["packets"]),
                        "size": len(st["partial"]),
                        "data": bytes(st["partial"]),
                        "first_page": st["partial_first_page"],
                        "last_page": seq,
                        "granule": granule,
                    }
                )
                st["partial"] = None
        st["n_pages"] += 1
        pos = body_start + body_len
    if not order:
        raise ValueError("empty Ogg payload")
    for serial in order:
        st = state[serial]
        if st["partial"] is not None:
            raise ValueError(
                f"serial {serial} ends inside a spanning packet"
            )
        if not st["eos"]:
            raise ValueError(f"serial {serial} has no EOS page")
    return [
        {
            "serial": serial,
            "n_pages": state[serial]["n_pages"],
            "packets": state[serial]["packets"],
        }
        for serial in order
    ]


def _parse_stream(
    payload: bytes, pos: int, used_serials: set[int]
) -> tuple[dict, int]:
    """Parse ONE logical stream starting at ``pos``; stop after its EOS
    page. Returns (stream dict, offset just past the EOS page)."""
    n = len(payload)
    serial = None
    expected_seq = 0
    packets: list[dict] = []
    partial: bytearray | None = None
    partial_first_page: int | None = None
    n_pages = 0
    saw_eos = False
    while pos < n and not saw_eos:
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError("lost Ogg capture pattern")
        if pos + 27 > n:
            raise ValueError("truncated Ogg page header")
        if payload[pos + 4] != 0:
            raise ValueError("unknown Ogg stream structure version")
        header_type = payload[pos + 5]
        granule, pserial, seq, crc_stored = struct.unpack_from(
            "<QIIi", payload, pos + 6
        )
        n_segs = payload[pos + 26]
        seg_table = payload[pos + 27 : pos + 27 + n_segs]
        if len(seg_table) != n_segs:
            raise ValueError("truncated Ogg segment table")
        body_start = pos + 27 + n_segs
        body_len = sum(seg_table)
        if body_start + body_len > n:
            raise ValueError("Ogg page body exceeds the file")
        if serial is None:
            if pserial in used_serials:
                raise ValueError(
                    f"chained Ogg link reuses serial {pserial}"
                )
            if not header_type & 0x02:
                raise ValueError("Ogg logical stream must start with BOS")
            serial = pserial
        elif pserial != serial:
            raise NotImplementedError(
                "grouped (interleaved-serial) Ogg streams"
            )
        if seq != expected_seq:
            raise ValueError(
                f"Ogg page sequence gap: got {seq}, expected {expected_seq}"
            )
        expected_seq += 1
        zeroed = (
            payload[pos : pos + 22]
            + b"\x00\x00\x00\x00"
            + payload[pos + 26 : body_start + body_len]
        )
        if ogg_crc(zeroed) != crc_stored & 0xFFFFFFFF:
            raise ValueError(f"Ogg CRC mismatch on page {seq}")
        if bool(header_type & 0x01) != (partial is not None):
            raise ValueError(
                "continuation flag disagrees with the packet state"
            )
        if header_type & 0x02 and seq != 0:
            raise ValueError("BOS flag on a non-first page")
        if header_type & 0x04:
            saw_eos = True
        off = body_start
        for v in seg_table:
            if partial is None:
                partial = bytearray()
                partial_first_page = seq
            partial += payload[off : off + v]
            off += v
            if v < 255:  # the packet completes here
                packets.append(
                    {
                        "idx": len(packets),
                        "size": len(partial),
                        "data": bytes(partial),
                        "first_page": partial_first_page,
                        "last_page": seq,
                        "granule": granule,
                    }
                )
                partial = None
        pos = body_start + body_len
        n_pages += 1
    if partial is not None:
        raise ValueError("Ogg stream ends inside a spanning packet")
    if not saw_eos:
        raise ValueError("Ogg stream has no EOS page")
    return {"serial": serial, "n_pages": n_pages, "packets": packets}, pos


def probe_ogg_codec(payload: bytes) -> dict:
    """Identify the codec from the FIRST packet (the identification
    header both Opus and Vorbis mandate on the BOS page):

    - OpusHead (RFC 7845 §5.1): version, channel count, pre-skip,
      input sample rate (informational), output gain;
    - \\x01vorbis: version, channels, sample rate.

    -> {codec ('opus'|'vorbis'), channels, sample_rate, pre_skip
    (opus only)}. Chained files are probed on their FIRST link (each
    later link has its own id header — probe those via
    parse_ogg_chain). Unknown first packets raise NotImplementedError —
    identification must never guess."""
    first = parse_ogg_chain(payload)[0]["packets"][0]["data"]
    if first[:8] == b"OpusHead":
        if len(first) < 19:
            raise ValueError("OpusHead shorter than its fixed fields")
        if first[8] >> 4 != 0:  # major version must be 0 per RFC 7845
            raise ValueError(f"unsupported OpusHead version {first[8]}")
        return {
            "codec": "opus",
            "channels": first[9],
            "pre_skip": struct.unpack_from("<H", first, 10)[0],
            "sample_rate": struct.unpack_from("<I", first, 12)[0],
        }
    if first[:7] == b"\x01vorbis":
        if len(first) < 16:
            raise ValueError("vorbis id header too short")
        return {
            "codec": "vorbis",
            "channels": first[11],
            "sample_rate": struct.unpack_from("<I", first, 12)[0],
        }
    raise NotImplementedError(
        f"unknown Ogg codec (first packet starts {first[:8]!r})"
    )


# ------------------------------------------------- metadata tag headers ---
# The VorbisComment block (the tag standard of the Ogg ecosystem,
# Vorbis I §5 / RFC 7845 §5.2): little-endian vendor length + vendor,
# then a count of length-prefixed UTF-8 "KEY=value" fields. Vorbis
# carries it in its second header packet (\x03vorbis..., closed by a
# framing bit); Opus carries it in the OpusTags packet with no framing.


def make_vorbis_comment_packet(vendor: str, tags: list[tuple[str, str]]) -> bytes:
    out = bytearray(b"\x03vorbis")
    vb = vendor.encode("utf-8")
    out += struct.pack("<I", len(vb)) + vb
    out += struct.pack("<I", len(tags))
    for k, v in tags:
        f = f"{k}={v}".encode("utf-8")
        out += struct.pack("<I", len(f)) + f
    out += b"\x01"  # framing bit
    return bytes(out)


def make_opus_tags_packet(vendor: str, tags: list[tuple[str, str]]) -> bytes:
    out = bytearray(b"OpusTags")
    vb = vendor.encode("utf-8")
    out += struct.pack("<I", len(vb)) + vb
    out += struct.pack("<I", len(tags))
    for k, v in tags:
        f = f"{k}={v}".encode("utf-8")
        out += struct.pack("<I", len(f)) + f
    return bytes(out)


def parse_comment_header(packet: bytes) -> dict:
    """Vorbis comment header packet or OpusTags packet -> {codec,
    vendor, tags: [(key, value)]}. Strict: lengths must fit, every
    field must contain '=', the Vorbis framing bit must be set."""
    if packet[:7] == b"\x03vorbis":
        codec, pos, framed = "vorbis", 7, True
    elif packet[:8] == b"OpusTags":
        codec, pos, framed = "opus", 8, False
    else:
        raise ValueError("not a VorbisComment/OpusTags packet")

    def u32(at: int) -> int:
        if at + 4 > len(packet):
            raise ValueError("comment header truncated")
        return struct.unpack_from("<I", packet, at)[0]

    vlen = u32(pos)
    pos += 4
    if pos + vlen > len(packet):
        raise ValueError("vendor string overruns the packet")
    vendor = packet[pos : pos + vlen].decode("utf-8")
    pos += vlen
    count = u32(pos)
    pos += 4
    tags: list[tuple[str, str]] = []
    for _ in range(count):
        flen = u32(pos)
        pos += 4
        if pos + flen > len(packet):
            raise ValueError("comment field overruns the packet")
        field = packet[pos : pos + flen].decode("utf-8")
        pos += flen
        if "=" not in field:
            raise ValueError("comment field without '='")
        k, _, v = field.partition("=")
        if not k or any(not (0x20 <= ord(c) <= 0x7D) or c == "=" for c in k):
            raise ValueError(f"invalid comment key {k!r}")
        tags.append((k.upper(), v))
    if framed:
        if pos >= len(packet) or not (packet[pos] & 1):
            raise ValueError("vorbis comment framing bit missing")
    return {"codec": codec, "vendor": vendor, "tags": tags}


def extract_ogg_tags(payload: bytes) -> list[dict]:
    """Whole Ogg file (possibly chained) -> one tag dict per link:
    {link, codec, vendor, tags} from each link's comment header (the
    second packet of vorbis/opus streams per their mapping specs)."""
    out = []
    for li, link in enumerate(parse_ogg_chain(payload)):
        packets = link["packets"]
        if len(packets) < 2:
            raise ValueError(f"link {li}: no comment header packet")
        parsed = parse_comment_header(packets[1]["data"])
        ident = probe_ogg_codec(make_ogg([packets[0]["data"]]))
        if ident["codec"] != parsed["codec"]:
            raise ValueError(
                f"link {li}: id header says {ident['codec']}, comment "
                f"header says {parsed['codec']}"
            )
        out.append({"link": li, **parsed})
    return out
