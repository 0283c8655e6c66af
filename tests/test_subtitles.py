"""Subtitle extraction (operators/subtitles.py): SRT/WebVTT wire
formats, strictness on hostile inputs, tx3g sample decode, and the
MP4 text-trak routing composition."""

from __future__ import annotations

import pytest

from pyiceberg_lakehouse_spark.operators.multimodal import (
    make_mp4_media_multi,
    demux_mp4_tracks,
)
from pyiceberg_lakehouse_spark.operators.subtitles import (
    decode_tx3g_sample,
    encode_tx3g_sample,
    make_srt,
    make_vtt,
    mp4_text_cues,
    parse_srt,
    parse_webvtt,
)


def test_srt_roundtrip_multiline():
    cues = [
        {"start_ms": 0, "end_ms": 1500, "text": "hello"},
        {"start_ms": 2000, "end_ms": 3900, "text": "two\nlines"},
        {"start_ms": 3661234, "end_ms": 3662000, "text": "over an hour"},
    ]
    got = parse_srt(make_srt(cues))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == [
        (c["start_ms"], c["end_ms"], c["text"]) for c in cues
    ]
    assert [c["idx"] for c in got] == [1, 2, 3]


def test_srt_strictness():
    with pytest.raises(ValueError, match="not numeric"):
        parse_srt("x\n00:00:00,000 --> 00:00:01,000\nhi")
    with pytest.raises(ValueError, match="malformed SRT timestamp"):
        parse_srt("1\n00:00:00.000 --> 00:00:01,000\nhi")  # dot = VTT
    with pytest.raises(ValueError, match="ends before"):
        parse_srt("1\n00:00:02,000 --> 00:00:01,000\nhi")
    with pytest.raises(ValueError, match="out of order"):
        parse_srt(
            "1\n00:00:05,000 --> 00:00:06,000\na\n\n"
            "2\n00:00:01,000 --> 00:00:02,000\nb"
        )
    with pytest.raises(ValueError, match="no timing line"):
        parse_srt("1")


def test_vtt_header_notes_ids_settings():
    doc = (
        "WEBVTT\n\n"
        "NOTE this block is skipped\nentirely\n\n"
        "intro\n00:05.000 --> 00:07.000 align:start position:10%\nshort form\n\n"
        "01:00:01.500 --> 01:00:02.000\nhour form"
    )
    cues = parse_webvtt(doc)
    assert len(cues) == 2
    assert cues[0]["cue_id"] == "intro"
    assert cues[0]["start_ms"] == 5000 and cues[0]["end_ms"] == 7000
    assert cues[0]["text"] == "short form"
    assert cues[1]["cue_id"] is None
    assert cues[1]["start_ms"] == 3601500
    with pytest.raises(ValueError, match="WEBVTT header"):
        parse_webvtt("1\n00:00:00,000 --> 00:00:01,000\nhi")


def test_vtt_markup_strip_and_entities():
    doc = (
        "WEBVTT\n\n"
        "00:01.000 --> 00:02.000\n"
        "<v Alice>hi <b>there</b></v> &lt;3 &amp; more"
    )
    assert parse_webvtt(doc)[0]["text"] == "hi there <3 & more"
    raw = parse_webvtt(doc, strip_markup=False)[0]["text"]
    assert "<v Alice>" in raw and "&lt;3" in raw


def test_vtt_roundtrip_both_timestamp_forms():
    cues = [
        {"start_ms": 1000, "end_ms": 2500, "text": "a", "cue_id": "c1"},
        {"start_ms": 3600000 + 500, "end_ms": 3600000 + 900, "text": "b",
         "settings": True},
    ]
    got = parse_webvtt(make_vtt(cues))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == [
        (1000, 2500, "a"), (3600500, 3600900, "b"),
    ]
    assert got[0]["cue_id"] == "c1"


def test_tx3g_roundtrip_and_style_skip():
    s = encode_tx3g_sample("héllo 世界")
    assert decode_tx3g_sample(s) == "héllo 世界"
    styl = (8).to_bytes(4, "big") + b"styl"
    assert decode_tx3g_sample(s + styl) == "héllo 世界"
    with pytest.raises(ValueError, match="length exceeds"):
        decode_tx3g_sample(b"\x00\x10hi")
    with pytest.raises(ValueError, match="not a box"):
        decode_tx3g_sample(s + b"junk")
    with pytest.raises(ValueError, match="corrupt tx3g style box"):
        decode_tx3g_sample(s + (99).to_bytes(4, "big") + b"styl")


def test_mp4_text_cue_routing():
    """Only text/sbtl traks yield cues; video/audio are routed away."""
    payload = make_mp4_media_multi(
        [
            {"samples": [b"vv"] * 2, "stts_runs": [(2, 50)],
             "handler": "vide"},
            {"samples": [encode_tx3g_sample(t) for t in ("one", "two", "three")],
             "stts_runs": [(3, 700)], "handler": "text", "codec": "tx3g",
             "sync_every": None},
        ],
        timescale=1000,
    )
    cues = mp4_text_cues(demux_mp4_tracks(payload))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in cues] == [
        (0, 700, "one"), (700, 1400, "two"), (1400, 1400, "three"),
    ]
    assert all(c["track_id"] == 2 for c in cues)


class TestAss:
    """SSA/ASS (r14): Format-driven fields, override strip, drawing."""

    def test_format_driven_field_order(self):
        from pyiceberg_lakehouse_spark.operators.subtitles import (
            make_ass,
            parse_ass,
        )

        cues = [{"start_ms": 0, "end_ms": 1000, "text": "a,b"}]
        for extra in (False, True):
            r = parse_ass(make_ass(cues, extra_event_field=extra))
            assert r["cues"][0]["text"] == "a,b"

    def test_override_strip_breaks_and_hard_space(self):
        from pyiceberg_lakehouse_spark.operators.subtitles import (
            ass_strip_text,
        )

        assert (
            ass_strip_text(r"{\b1}Hi{\b0}\Nthere\hx")
            == "Hi\nthere x"
        )

    def test_drawing_payload_dropped(self):
        from pyiceberg_lakehouse_spark.operators.subtitles import (
            ass_strip_text,
        )

        assert (
            ass_strip_text(r"pre {\p1}m 0 0 l 9 9 b 1 2 3{\p0}post")
            == "pre post"
        )

    def test_comment_rows_and_unknown_sections_skip(self):
        from pyiceberg_lakehouse_spark.operators.subtitles import (
            parse_ass,
        )

        r = parse_ass(
            "[Script Info]\nTitle: x\n\n[Fonts]\njunk: y\n\n[Events]\n"
            "Format: Layer, Start, End, Text\n"
            "Comment: 0,0:00:00.00,0:00:01.00,hidden\n"
            "Dialogue: 0,0:00:00.00,0:00:01.50,shown\n"
        )
        assert [c["text"] for c in r["cues"]] == ["shown"]
        assert r["cues"][0]["end_ms"] == 1500

    def test_hostile_inputs_raise(self):
        import pytest as _pt

        from pyiceberg_lakehouse_spark.operators.subtitles import (
            ass_strip_text,
            parse_ass,
        )

        with _pt.raises(ValueError, match="Events"):
            parse_ass("[Script Info]\nTitle: x\n")
        with _pt.raises(ValueError, match="before its Format"):
            parse_ass("[Events]\nDialogue: 0,0:00:00.00,0:00:01.00,x\n")
        with _pt.raises(ValueError, match="unterminated"):
            ass_strip_text("{\\b1 oops")
        with _pt.raises(ValueError, match="timestamp"):
            parse_ass(
                "[Events]\nFormat: Start, End, Text\n"
                "Dialogue: 0:00:60.00,0:00:61.00,x\n"
            )
