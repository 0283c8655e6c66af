"""Subtitle/caption extraction — SRT, WebVTT, and MP4 tx3g text tracks.

The video->caption path of a training-data pipeline: crawls yield
.srt/.vtt sidecars and MP4s with embedded timed-text traks; curation
wants (start, end, text) cue rows with markup stripped, plus coverage
stats (caption density over the media span) as quality filters.

Scope (honest gates):
- SRT: the de-facto format — numeric cue index, ``HH:MM:SS,mmm -->
  HH:MM:SS,mmm`` timestamps, text until a blank line. Strict: a
  malformed timestamp or a non-monotonic cue raises (a parser that
  guesses generates misaligned caption data).
- WebVTT: the ``WEBVTT`` header, optional cue identifiers, dot-decimal
  timestamps with the hours field optional, cue settings after the
  arrow ignored, NOTE/STYLE/REGION blocks skipped. Voice/class/ruby
  markup (``<v Name>``, ``<c.cls>``, ``<b>``, ``<i>``...) is stripped
  by tag; literal ``<`` in cue text survives only as ``&lt;`` per spec.
- tx3g (3GPP timed text, the QuickTime/MP4 subtitle sample format):
  each sample is a 16-bit big-endian length + UTF-8 text (+ optional
  style boxes, skipped). Composes with demux_mp4_tracks: a 'text'/
  'sbtl' handler trak's samples ARE the cues, with dts/duration from
  the sample tables.

Reference parity: ashkangoleh/pyiceberg-lakehouse ingests media blobs
as opaque binary (main-daft.py:68); this engine extracts the caption
layer from them.
"""

from __future__ import annotations

import re
import struct as _struct

_SRT_TS = re.compile(r"^(\d{2,}):([0-5]\d):([0-5]\d),(\d{3})$")
_VTT_TS = re.compile(r"^(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})$")
_VTT_TAG = re.compile(r"<[^>]*>")


def _srt_ms(ts: str) -> int:
    m = _SRT_TS.match(ts)
    if not m:
        raise ValueError(f"malformed SRT timestamp {ts!r}")
    h, mi, s, ms = (int(g) for g in m.groups())
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def _vtt_ms(ts: str) -> int:
    m = _VTT_TS.match(ts)
    if not m:
        raise ValueError(f"malformed WebVTT timestamp {ts!r}")
    h = int(m.group(1)) if m.group(1) else 0
    mi, s, ms = int(m.group(2)), int(m.group(3)), int(m.group(4))
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def parse_srt(text: str) -> list[dict]:
    """SRT -> [{idx, start_ms, end_ms, text}], strict."""
    cues: list[dict] = []
    blocks = re.split(r"\n\s*\n", text.replace("\r\n", "\n").strip())
    last_start = -1
    for blk in blocks:
        lines = [ln for ln in blk.split("\n")]
        if len(lines) < 2:
            raise ValueError("SRT cue with no timing line")
        if not lines[0].strip().isdigit():
            raise ValueError(f"SRT cue index is not numeric: {lines[0]!r}")
        idx = int(lines[0])
        parts = lines[1].split("-->")
        if len(parts) != 2:
            raise ValueError(f"SRT timing line malformed: {lines[1]!r}")
        start = _srt_ms(parts[0].strip())
        end = _srt_ms(parts[1].strip())
        if end <= start:
            raise ValueError("SRT cue ends before it starts")
        if start < last_start:
            raise ValueError("SRT cues out of order")
        last_start = start
        cues.append(
            {
                "idx": idx,
                "start_ms": start,
                "end_ms": end,
                "text": "\n".join(lines[2:]),
            }
        )
    return cues


def parse_webvtt(text: str, strip_markup: bool = True) -> list[dict]:
    """WebVTT -> [{idx, cue_id, start_ms, end_ms, text}]. ``idx`` is the
    0-based cue position; ``cue_id`` the optional identifier line."""
    norm = text.replace("\r\n", "\n").lstrip("﻿")
    if not norm.startswith("WEBVTT"):
        raise ValueError("missing WEBVTT header")
    blocks = re.split(r"\n\s*\n", norm.strip())
    cues: list[dict] = []
    for blk in blocks[1:] if blocks and blocks[0].startswith("WEBVTT") else blocks:
        lines = blk.split("\n")
        if not lines or lines[0].startswith(("NOTE", "STYLE", "REGION")):
            continue
        cue_id = None
        ti = 0
        if "-->" not in lines[0]:
            cue_id = lines[0].strip()
            ti = 1
            if ti >= len(lines) or "-->" not in lines[ti]:
                raise ValueError(f"WebVTT cue without a timing line: {blk!r}")
        timing = lines[ti].split("-->")
        start = _vtt_ms(timing[0].strip())
        # cue settings (position/line/align...) follow the end timestamp
        end_tok = timing[1].strip().split(" ", 1)[0]
        end = _vtt_ms(end_tok)
        if end <= start:
            raise ValueError("WebVTT cue ends before it starts")
        body = "\n".join(lines[ti + 1 :])
        if strip_markup:
            body = _VTT_TAG.sub("", body)
            body = (
                body.replace("&lt;", "<")
                .replace("&gt;", ">")
                .replace("&amp;", "&")
            )
        cues.append(
            {
                "idx": len(cues),
                "cue_id": cue_id,
                "start_ms": start,
                "end_ms": end,
                "text": body,
            }
        )
    return cues


def make_srt(cues: list[dict]) -> str:
    def ts(ms: int) -> str:
        h, rem = divmod(ms, 3600000)
        mi, rem = divmod(rem, 60000)
        s, frac = divmod(rem, 1000)
        return f"{h:02d}:{mi:02d}:{s:02d},{frac:03d}"

    return "\n\n".join(
        f"{i + 1}\n{ts(c['start_ms'])} --> {ts(c['end_ms'])}\n{c['text']}"
        for i, c in enumerate(cues)
    ) + "\n"


def make_vtt(cues: list[dict], with_note: bool = True) -> str:
    """WebVTT with the SHORT (hour-less) timestamp form whenever the
    time fits under an hour — the wire shape a parser must accept."""

    def ts(ms: int) -> str:
        h, rem = divmod(ms, 3600000)
        mi, rem = divmod(rem, 60000)
        s, frac = divmod(rem, 1000)
        if h:
            return f"{h:02d}:{mi:02d}:{s:02d}.{frac:03d}"
        return f"{mi:02d}:{s:02d}.{frac:03d}"

    parts = ["WEBVTT"]
    if with_note:
        parts.append("NOTE synthesized corpus")
    for c in cues:
        head = f"{c['cue_id']}\n" if c.get("cue_id") else ""
        settings = " align:start" if c.get("settings") else ""
        parts.append(
            f"{head}{ts(c['start_ms'])} --> {ts(c['end_ms'])}{settings}\n"
            f"{c['text']}"
        )
    return "\n\n".join(parts) + "\n"


# ------------------------------------------------------------- tx3g ------


def encode_tx3g_sample(text: str) -> bytes:
    """3GPP timed-text sample: u16 byte length + UTF-8 text."""
    b = text.encode("utf-8")
    if len(b) > 0xFFFF:
        raise ValueError("tx3g sample text too long")
    return _struct.pack(">H", len(b)) + b


def decode_tx3g_sample(data: bytes) -> str:
    """Inverse; trailing style ('styl' etc.) boxes are skipped by
    extent, garbage that is neither text nor a box raises."""
    if len(data) < 2:
        raise ValueError("tx3g sample shorter than its length field")
    n = _struct.unpack_from(">H", data)[0]
    if 2 + n > len(data):
        raise ValueError("tx3g text length exceeds the sample")
    text = data[2 : 2 + n].decode("utf-8")
    pos = 2 + n
    while pos < len(data):  # optional style boxes
        if pos + 8 > len(data):
            raise ValueError("trailing tx3g bytes are not a box")
        size, _btype = _struct.unpack_from(">I4s", data, pos)
        if size < 8 or pos + size > len(data):
            raise ValueError("corrupt tx3g style box")
        pos += size
    return text


def mp4_text_cues(tracks: list[dict], timescale_default: int = 1000) -> list[dict]:
    """Extract caption cues from demuxed MP4 tracks: every 'text'/'sbtl'
    handler trak's samples decode as tx3g -> {track_id, idx, start_ms,
    end_ms, text}. End time comes from the NEXT sample's dts (the 3GPP
    contract: a sample lasts until the next one; the last sample's end
    is its dts — callers with the real media duration can extend it)."""
    cues = []
    for t in tracks:
        if t["handler"] not in ("text", "sbtl"):
            continue
        ts = t["timescale"] or timescale_default
        samples = t["samples"]
        for i, s in enumerate(samples):
            end = samples[i + 1]["dts"] if i + 1 < len(samples) else s["dts"]
            cues.append(
                {
                    "track_id": t["track_id"],
                    "idx": i,
                    "start_ms": s["dts"] * 1000 // ts,
                    "end_ms": end * 1000 // ts,
                    "text": decode_tx3g_sample(s["data"]),
                }
            )
    return cues
