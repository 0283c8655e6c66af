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


# ------------------------------------------------------------- SSA/ASS ---
# Advanced SubStation Alpha — the fansub/anime-corpus subtitle format.
# An INI-shaped file: [Script Info] metadata, [V4+ Styles] with a
# Format: line naming the style columns, [Events] with a Format: line
# naming the event columns and Dialogue: rows whose LAST declared
# field (Text) may itself contain commas. Text carries override tags
# in braces ({\b1}, {\pos(10,20)}...) which strip for curation, \N
# and \n soft/hard line breaks (-> '\n'), \h hard spaces (-> ' '),
# and drawing-mode runs ({\p1}...{\p0}, vector art not prose) whose
# payload must be DROPPED, not emitted as text.


def _ass_ms(ts: str) -> int:
    """H:MM:SS.cc (centiseconds) -> milliseconds; strict."""
    m = re.fullmatch(r"(\d+):([0-5]\d):([0-5]\d)\.(\d\d)", ts.strip())
    if not m:
        raise ValueError(f"bad ASS timestamp {ts!r}")
    h, mi, s, cc = (int(g) for g in m.groups())
    return ((h * 60 + mi) * 60 + s) * 1000 + cc * 10


def ass_strip_text(text: str) -> str:
    """Strip override tags / drawing runs; decode \\N/\\n/\\h."""
    out = []
    drawing = False
    pos = 0
    n = len(text)
    while pos < n:
        ch = text[pos]
        if ch == "{":
            end = text.find("}", pos + 1)
            if end < 0:
                raise ValueError("unterminated ASS override block")
            block = text[pos + 1 : end]
            # drawing mode toggles via \p<digit>; \p0 ends it
            for m in re.finditer(r"\\p(\d+)", block):
                drawing = m.group(1) != "0"
            pos = end + 1
            continue
        if drawing:
            pos += 1
            continue
        if ch == "\\" and pos + 1 < n and text[pos + 1] in "Nnh":
            out.append("\n" if text[pos + 1] in "Nn" else " ")
            pos += 2
            continue
        out.append(ch)
        pos += 1
    return "".join(out)


def parse_ass(text: str) -> dict:
    """-> {info: {key: value}, styles: [style names], cues: [{start_ms,
    end_ms, style, name, text (stripped), raw_text}]}.

    Field order comes from each section's own ``Format:`` line (the
    format is self-describing; hardcoding the default order misreads
    files with extra columns). The Text field is the LAST declared
    field and absorbs all remaining commas. Comment: lines and unknown
    sections skip. Missing [Events] or a Dialogue row with fewer
    fields than the Format declares raises."""
    info: dict[str, str] = {}
    styles: list[str] = []
    cues: list[dict] = []
    section = ""
    ev_fields: list[str] | None = None
    st_fields: list[str] | None = None
    for raw in text.splitlines():
        line = raw.strip().lstrip("\ufeff")
        if not line or line.startswith(";"):
            continue
        if line.startswith("[") and line.endswith("]"):
            section = line[1:-1].strip().lower()
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if section == "script info":
            if key:
                info[key] = val
        elif section in ("v4+ styles", "v4 styles"):
            if key == "format":
                st_fields = [f.strip().lower() for f in val.split(",")]
            elif key == "style":
                if st_fields is None:
                    raise ValueError("Style: before its Format: line")
                vals = val.split(",", len(st_fields) - 1)
                styles.append(vals[st_fields.index("name")].strip())
        elif section == "events":
            if key == "format":
                ev_fields = [f.strip().lower() for f in val.split(",")]
                if ev_fields[-1] != "text":
                    raise ValueError(
                        "ASS Events Format must end with Text "
                        "(it absorbs trailing commas)"
                    )
            elif key == "dialogue":
                if ev_fields is None:
                    raise ValueError("Dialogue: before its Format: line")
                vals = val.split(",", len(ev_fields) - 1)
                if len(vals) < len(ev_fields):
                    raise ValueError(
                        f"Dialogue with {len(vals)} fields; Format "
                        f"declares {len(ev_fields)}"
                    )
                row = dict(zip(ev_fields, vals))
                raw_text = row["text"]
                cues.append(
                    {
                        "start_ms": _ass_ms(row["start"]),
                        "end_ms": _ass_ms(row["end"]),
                        "style": row.get("style", "").strip(),
                        "name": row.get("name", "").strip(),
                        "text": ass_strip_text(raw_text),
                        "raw_text": raw_text,
                    }
                )
            # Comment:/Picture:/Sound: rows skip
    if ev_fields is None:
        raise ValueError("ASS file without an [Events] section")
    return {"info": info, "styles": styles, "cues": cues}


def make_ass(
    cues: list[dict],
    title: str = "t",
    styles: list[str] | None = None,
    extra_event_field: bool = False,
) -> str:
    """Deterministic ASS writer for oracle constructions. ``cues``:
    [{start_ms, end_ms, style?, name?, text (RAW, may carry override
    tags)}]. ``extra_event_field`` inserts a nonstandard column before
    Text so the Format-driven parse is load-bearing."""

    def ts(ms: int) -> str:
        cc = (ms // 10) % 100
        s = ms // 1000
        return f"{s // 3600}:{(s // 60) % 60:02d}:{s % 60:02d}.{cc:02d}"

    out = [
        "[Script Info]",
        f"Title: {title}",
        "ScriptType: v4.00+",
        "",
        "[V4+ Styles]",
        "Format: Name, Fontname, Fontsize",
    ]
    for s in styles or ["Default"]:
        out.append(f"Style: {s},Arial,20")
    out += ["", "[Events]"]
    fields = "Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, "
    if extra_event_field:
        fields += "Custom, "
    out.append("Format: " + fields + "Text")
    for c in cues:
        row = (
            f"Dialogue: 0,{ts(c['start_ms'])},{ts(c['end_ms'])},"
            f"{c.get('style', 'Default')},{c.get('name', '')},0,0,0,,"
        )
        if extra_event_field:
            row += "x,"
        row += c["text"]
        out.append(row)
    return "\n".join(out) + "\n"
