"""EBML / Matroska / WebM container probe in pure stdlib — the modern
web-video container (WebM is what browsers record and much of the
video crawl ships).

Implements the real wire format, not a sniff: EBML variable-length
integers for BOTH element IDs (length marker kept, per spec) and
sizes (marker stripped; the all-ones VINT means "unknown size", legal
on Segment/Cluster in streamed files), the EBML header (version,
read-version, DocType + doc-type versions), and the Segment walk a
curation probe needs — Info (TimestampScale, the float Duration,
MuxingApp/WritingApp, the 16-byte SegmentUUID) and Tracks (per
TrackEntry: number, type, CodecID string, language, flags, Video
PixelWidth/PixelHeight + optional Display*, Audio SamplingFrequency /
Channels / BitDepth). Unknown elements skip by their declared size —
the EBML forward-compatibility contract — and Clusters (media data)
are counted, not decoded.

Signed/unsigned integers are big-endian minimal-length; floats are
4- or 8-byte IEEE big-endian; strings are ASCII/UTF-8. The writer
half emits deterministic spec-shaped files so the reader is provable
with closed-form oracles; it is not a muxer anyone should ship.

Honest gates (raise, never guess): EBMLReadVersion > 1, element sizes
exceeding their parent's extent, unknown-size elements anywhere but
Segment/Cluster, and truncated VINTs. Codec PAYLOAD decode (VP8/VP9/
AV1/Opus frames inside Blocks) stays out of scope — this is the demux
probe layer, the same honesty split as the MP4/Ogg demuxes.

Reference parity: ashkangoleh/pyiceberg-lakehouse stores video rows
as opaque binary (main-daft.py:68); this engine reads the container.
"""

from __future__ import annotations

import struct

# -- element IDs (with their length markers, as the spec writes them) --
EBML = 0x1A45DFA3
EBML_VERSION = 0x4286
EBML_READ_VERSION = 0x42F7
DOC_TYPE = 0x4282
DOC_TYPE_VERSION = 0x4287
DOC_TYPE_READ_VERSION = 0x4285
SEGMENT = 0x18538067
SEGMENT_INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
MUXING_APP = 0x4D80
WRITING_APP = 0x5741
SEGMENT_UUID = 0x73A4
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
FLAG_DEFAULT = 0x88
CODEC_ID = 0x86
LANGUAGE = 0x22B59C
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQUENCY = 0xB5
CHANNELS = 0x9F
BIT_DEPTH = 0x6264
CLUSTER = 0x1F43B675
CLUSTER_TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3

_UNKNOWN_OK = {SEGMENT, CLUSTER}


def _write_vint_id(eid: int) -> bytes:
    """IDs are stored verbatim (their length marker is part of the
    constant)."""
    n = max(1, (eid.bit_length() + 7) // 8)
    return eid.to_bytes(n, "big")


def _write_vint_size(value: int) -> bytes:
    """Sizes store value with a length-descriptor prefix bit."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:  # all-ones reserved: unknown
            return (
                (1 << (7 * length)) | value
            ).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int, bool]:
    """-> (value, new_pos, is_unknown). ``keep_marker`` for IDs."""
    if pos >= len(data):
        raise ValueError("truncated EBML VINT")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML VINT (leading zero byte)")
    length = 9 - first.bit_length()
    if pos + length > len(data):
        raise ValueError("truncated EBML VINT body")
    raw = int.from_bytes(data[pos : pos + length], "big")
    if keep_marker:
        return raw, pos + length, False
    value = raw - (1 << (7 * length))
    unknown = value == (1 << (7 * length)) - 1
    return value, pos + length, unknown


def _uint(data: bytes) -> int:
    return int.from_bytes(data, "big")


def _float(data: bytes) -> float:
    if len(data) == 4:
        return struct.unpack(">f", data)[0]
    if len(data) == 8:
        return struct.unpack(">d", data)[0]
    raise ValueError(f"EBML float of {len(data)} bytes")


def _elem(eid: int, payload: bytes) -> bytes:
    return _write_vint_id(eid) + _write_vint_size(len(payload)) + payload


def _uint_elem(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return _elem(eid, value.to_bytes(n, "big"))


def make_matroska(
    *,
    doc_type: str = "webm",
    timestamp_scale: int = 1_000_000,
    duration: float = 0.0,
    muxing_app: str = "lakehouse",
    writing_app: str = "lakehouse",
    tracks: list[dict],
    n_clusters: int = 0,
    blocks_per_cluster: list[list[dict]] | None = None,
    unknown_segment_size: bool = False,
    segment_uuid: bytes | None = None,
) -> bytes:
    """Deterministic Matroska/WebM file for probe verification.

    ``tracks``: [{number, type ('video'|'audio'), codec_id, language?,
    width?, height?, sampling_frequency?, channels?, bit_depth?}].
    ``unknown_segment_size`` writes the streamed form (all-ones size
    VINT on Segment) the probe must handle. ``blocks_per_cluster[c]``:
    SimpleBlocks for cluster c — {track, timecode?, frames: [bytes],
    lacing: 'none'|'xiph'|'fixed'|'ebml', keyframe?}.
    """
    header = b"".join(
        [
            _uint_elem(EBML_VERSION, 1),
            _uint_elem(EBML_READ_VERSION, 1),
            _elem(DOC_TYPE, doc_type.encode("ascii")),
            _uint_elem(DOC_TYPE_VERSION, 4),
            _uint_elem(DOC_TYPE_READ_VERSION, 2),
        ]
    )
    info = b"".join(
        [
            _uint_elem(TIMESTAMP_SCALE, timestamp_scale),
            _elem(DURATION, struct.pack(">d", duration)),
            _elem(MUXING_APP, muxing_app.encode()),
            _elem(WRITING_APP, writing_app.encode()),
        ]
    )
    if segment_uuid is not None:
        if len(segment_uuid) != 16:
            raise ValueError("SegmentUUID must be 16 bytes")
        info += _elem(SEGMENT_UUID, segment_uuid)
    entries = b""
    for t in tracks:
        e = _uint_elem(TRACK_NUMBER, t["number"])
        e += _uint_elem(
            TRACK_TYPE, 1 if t["type"] == "video" else 2
        )
        e += _uint_elem(FLAG_DEFAULT, 1 if t.get("default", True) else 0)
        e += _elem(CODEC_ID, t["codec_id"].encode("ascii"))
        if "language" in t:
            e += _elem(LANGUAGE, t["language"].encode("ascii"))
        if t["type"] == "video":
            v = _uint_elem(PIXEL_WIDTH, t["width"])
            v += _uint_elem(PIXEL_HEIGHT, t["height"])
            e += _elem(VIDEO, v)
        else:
            a = _elem(
                SAMPLING_FREQUENCY,
                struct.pack(">f", float(t["sampling_frequency"])),
            )
            a += _uint_elem(CHANNELS, t["channels"])
            if "bit_depth" in t:
                a += _uint_elem(BIT_DEPTH, t["bit_depth"])
            e += _elem(AUDIO, a)
        # an unknown element the probe must skip by size (forward compat)
        e += _elem(0x7446, b"\x01\x02\x03")
        entries += _elem(TRACK_ENTRY, e)
    body = _elem(SEGMENT_INFO, info) + _elem(TRACKS, entries)
    for c in range(n_clusters):
        cbody = _uint_elem(CLUSTER_TIMESTAMP, c * 1000)
        if blocks_per_cluster is not None and c < len(blocks_per_cluster):
            for blk in blocks_per_cluster[c]:
                cbody += _elem(
                    SIMPLE_BLOCK,
                    _simple_block(
                        blk["track"], blk.get("timecode", 0),
                        blk["frames"], blk.get("lacing", "none"),
                        keyframe=blk.get("keyframe", True),
                    ),
                )
        body += _elem(CLUSTER, cbody)
    if unknown_segment_size:
        seg = (
            _write_vint_id(SEGMENT)
            + b"\x01" + b"\xff" * 7  # 8-byte all-ones: unknown size
            + body
        )
    else:
        seg = _elem(SEGMENT, body)
    return _elem(EBML, header) + seg



def _signed_vint(value: int) -> bytes:
    """EBML-lacing signed VINT: stored as value + (2^(7*len-1) - 1)."""
    for length in range(1, 9):
        bias = (1 << (7 * length - 1)) - 1
        if -bias <= value <= bias:
            return _encode_vint_n(value + bias, length)
    raise ValueError("lace delta out of VINT range")


def _encode_vint_n(value: int, length: int) -> bytes:
    out = bytearray(length)
    for i in range(length - 1, -1, -1):
        out[i] = value & 0xFF
        value >>= 8
    out[0] |= 0x80 >> (length - 1)
    return bytes(out)


def _read_signed_vint(data: bytes, pos: int) -> tuple[int, int]:
    raw, pos2, _ = _read_vint(data, pos, keep_marker=False)
    length = pos2 - pos
    return raw - ((1 << (7 * length - 1)) - 1), pos2


def _simple_block(
    track: int, timecode: int, frames: list[bytes], lacing: str,
    keyframe: bool = True,
) -> bytes:
    """Matroska SimpleBlock payload with all four lacing modes."""
    if not frames:
        raise ValueError("SimpleBlock needs at least one frame")
    flags = 0x80 if keyframe else 0
    body = bytearray()
    body += _write_vint_size(track)
    body += struct.pack(">h", timecode)
    if lacing == "none":
        if len(frames) != 1:
            raise ValueError("unlaced SimpleBlock carries exactly one frame")
        body.append(flags)
        body += frames[0]
        return bytes(body)
    if lacing == "fixed":
        if len({len(f) for f in frames}) != 1:
            raise ValueError("fixed lacing needs equal-size frames")
        body.append(flags | 0x04)
        body.append(len(frames) - 1)
        for f in frames:
            body += f
        return bytes(body)
    if lacing == "xiph":
        body.append(flags | 0x02)
        body.append(len(frames) - 1)
        for f in frames[:-1]:
            n = len(f)
            while n >= 255:
                body.append(255)
                n -= 255
            body.append(n)
        for f in frames:
            body += f
        return bytes(body)
    if lacing == "ebml":
        body.append(flags | 0x06)
        body.append(len(frames) - 1)
        # per the lacing spec the LAST frame's size is implicit, so a
        # 1-frame ebml-laced block carries no size fields at all
        if len(frames) > 1:
            body += _write_vint_size(len(frames[0]))
            prev = len(frames[0])
            for f in frames[1:-1]:
                body += _signed_vint(len(f) - prev)
                prev = len(f)
        for f in frames:
            body += f
        return bytes(body)
    raise ValueError(f"unknown lacing {lacing!r}")


def _parse_simple_block(payload: bytes) -> dict:
    """SimpleBlock -> {track, timecode, keyframe, lacing, frames}."""
    track, pos, _ = _read_vint(payload, 0, keep_marker=False)
    if pos + 3 > len(payload):
        raise ValueError("SimpleBlock header truncated")
    (timecode,) = struct.unpack_from(">h", payload, pos)
    flags = payload[pos + 2]
    pos += 3
    lace_bits = flags & 0x06
    data = payload[pos:]
    if lace_bits == 0:
        return {
            "track": track, "timecode": timecode,
            "keyframe": bool(flags & 0x80), "lacing": "none",
            "frames": [data],
        }
    if not data:
        raise ValueError("laced SimpleBlock without a lace count")
    n_frames = data[0] + 1
    at = 1
    sizes: list[int] = []
    if lace_bits == 0x04:  # fixed
        rest = len(data) - at
        if rest % n_frames:
            raise ValueError("fixed lacing with unequal frame sizes")
        sizes = [rest // n_frames] * n_frames
        lacing = "fixed"
    elif lace_bits == 0x02:  # Xiph
        for _ in range(n_frames - 1):
            size = 0
            while True:
                if at >= len(data):
                    raise ValueError("Xiph lace sizes truncated")
                b = data[at]
                at += 1
                size += b
                if b != 255:
                    break
            sizes.append(size)
        sizes.append(len(data) - at - sum(sizes))
        lacing = "xiph"
    else:  # EBML
        # the last frame's size is always implicit: a 1-frame ebml-laced
        # block has NO size fields (reading one would misparse the frame
        # bytes as a VINT and fabricate a spurious second frame)
        if n_frames > 1:
            first, at2 = _read_vint(data, at, keep_marker=False)[:2]
            at = at2
            sizes.append(first)
            prev = first
            for _ in range(n_frames - 2):
                delta, at = _read_signed_vint(data, at)
                prev += delta
                if prev < 0:
                    raise ValueError("EBML lace size went negative")
                sizes.append(prev)
        sizes.append(len(data) - at - sum(sizes))
        lacing = "ebml"
    if sizes and sizes[-1] < 0:
        raise ValueError("lace sizes exceed the block payload")
    frames = []
    for sz in sizes:
        frames.append(data[at : at + sz])
        at += sz
    if at != len(data):
        raise ValueError("SimpleBlock frame sizes disagree with its extent")
    return {
        "track": track, "timecode": timecode,
        "keyframe": bool(flags & 0x80), "lacing": lacing, "frames": frames,
    }



def probe_matroska(data: bytes) -> dict:
    """-> {doc_type, ebml_version, doc_type_version, timestamp_scale,
    duration_s, muxing_app, writing_app, segment_uuid (hex|None),
    tracks: [...], n_clusters, unknown_segment_size}."""
    pos = 0
    eid, pos, _ = _read_vint(data, pos, keep_marker=True)
    if eid != EBML:
        raise ValueError("not an EBML stream (missing EBML header)")
    size, pos, unknown = _read_vint(data, pos, keep_marker=False)
    if unknown:
        raise ValueError("EBML header with unknown size")
    header = data[pos : pos + size]
    if len(header) < size:
        raise ValueError("truncated EBML header")
    pos += size
    out: dict = {
        "doc_type": "matroska",
        "ebml_version": 1,
        "doc_type_version": 1,
        "tracks": [],
        "n_clusters": 0,
        "block_stats": {},
        "segment_uuid": None,
    }
    read_version = 1
    for heid, payload in _children(header):
        if heid == EBML_VERSION:
            out["ebml_version"] = _uint(payload)
        elif heid == EBML_READ_VERSION:
            read_version = _uint(payload)
        elif heid == DOC_TYPE:
            out["doc_type"] = payload.decode("ascii")
        elif heid == DOC_TYPE_VERSION:
            out["doc_type_version"] = _uint(payload)
    if read_version > 1:
        raise NotImplementedError(
            f"EBMLReadVersion {read_version} (this reader implements 1)"
        )
    eid, pos, _ = _read_vint(data, pos, keep_marker=True)
    if eid != SEGMENT:
        raise ValueError("expected Segment after the EBML header")
    size, pos, unknown = _read_vint(data, pos, keep_marker=False)
    out["unknown_segment_size"] = unknown
    seg = data[pos:] if unknown else data[pos : pos + size]
    if not unknown and len(seg) < size:
        raise ValueError("Segment exceeds the file")
    for seid, payload in _children(seg):
        if seid == SEGMENT_INFO:
            for iid, p in _children(payload):
                if iid == TIMESTAMP_SCALE:
                    out["timestamp_scale"] = _uint(p)
                elif iid == DURATION:
                    out["duration_raw"] = _float(p)
                elif iid == MUXING_APP:
                    out["muxing_app"] = p.decode()
                elif iid == WRITING_APP:
                    out["writing_app"] = p.decode()
                elif iid == SEGMENT_UUID:
                    out["segment_uuid"] = p.hex()
        elif seid == TRACKS:
            for tid, p in _children(payload):
                if tid != TRACK_ENTRY:
                    continue
                t: dict = {"language": "eng"}  # spec default
                for fid, fp in _children(p):
                    if fid == TRACK_NUMBER:
                        t["number"] = _uint(fp)
                    elif fid == TRACK_TYPE:
                        t["type"] = {1: "video", 2: "audio"}.get(
                            _uint(fp), f"type-{_uint(fp)}"
                        )
                    elif fid == CODEC_ID:
                        t["codec_id"] = fp.decode("ascii")
                    elif fid == LANGUAGE:
                        t["language"] = fp.decode("ascii")
                    elif fid == FLAG_DEFAULT:
                        t["default"] = bool(_uint(fp))
                    elif fid == VIDEO:
                        for vid, vp in _children(fp):
                            if vid == PIXEL_WIDTH:
                                t["width"] = _uint(vp)
                            elif vid == PIXEL_HEIGHT:
                                t["height"] = _uint(vp)
                    elif fid == AUDIO:
                        for aid, ap in _children(fp):
                            if aid == SAMPLING_FREQUENCY:
                                t["sampling_frequency"] = _float(ap)
                            elif aid == CHANNELS:
                                t["channels"] = _uint(ap)
                            elif aid == BIT_DEPTH:
                                t["bit_depth"] = _uint(ap)
                out["tracks"].append(t)
        elif seid == CLUSTER:
            out["n_clusters"] += 1
            for cid, cp in _children(payload):
                if cid != SIMPLE_BLOCK:
                    continue
                blk = _parse_simple_block(cp)
                st = out["block_stats"].setdefault(
                    blk["track"],
                    {"n_blocks": 0, "n_frames": 0, "frame_bytes": 0,
                     "lacings": set()},
                )
                st["n_blocks"] += 1
                st["n_frames"] += len(blk["frames"])
                st["frame_bytes"] += sum(len(f) for f in blk["frames"])
                st["lacings"].add(blk["lacing"])
    for st in out["block_stats"].values():
        st["lacings"] = sorted(st["lacings"])
    scale = out.get("timestamp_scale", 1_000_000)
    if "duration_raw" in out:
        # Duration is in TimestampScale units (ns * scale)
        out["duration_s"] = out.pop("duration_raw") * scale / 1e9
    return out


def _children(payload: bytes):
    """Iterate (id, element payload) over a master element's body;
    unknown elements are yielded too (callers skip by id) — the skip
    IS the EBML forward-compatibility contract."""
    pos = 0
    n = len(payload)
    while pos < n:
        eid, pos, _ = _read_vint(payload, pos, keep_marker=True)
        size, pos, unknown = _read_vint(payload, pos, keep_marker=False)
        if unknown:
            if eid not in _UNKNOWN_OK:
                raise ValueError(
                    f"unknown-size element {eid:#x} outside "
                    "Segment/Cluster"
                )
            size = n - pos
        if pos + size > n:
            raise ValueError(
                f"element {eid:#x} exceeds its parent's extent"
            )
        yield eid, payload[pos : pos + size]
        pos += size
