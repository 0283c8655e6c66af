"""ID3v1/v2 tag layer: wire-format roundtrips (v2.3 plain vs v2.4
synchsafe frame sizes), text encodings, tag stripping composition with
the MP3 frame walk, and hostile inputs."""

from __future__ import annotations

import struct

import pytest

from pyiceberg_lakehouse_spark.operators.multimodal import (
    _synchsafe,
    _unsynchsafe,
    demux_mp3_frames,
    make_id3v1,
    make_id3v2,
    make_mp3,
    mp3_strip_tags,
    parse_id3v1,
    parse_id3v2,
    probe_mp3,
)


def test_synchsafe_roundtrip():
    for n in (0, 1, 127, 128, 255, 0x0FFFFF, (1 << 28) - 1):
        assert _unsynchsafe(_synchsafe(n)) == n
    with pytest.raises(ValueError, match="out of range"):
        _synchsafe(1 << 28)
    with pytest.raises(ValueError, match="bit 7"):
        _unsynchsafe(b"\x80\x00\x00\x00")


@pytest.mark.parametrize("version", [3, 4])
def test_id3v2_roundtrip(version):
    frames = {
        "TIT2": "My Title",
        "TPE1": "Artist Name",
        "TALB": "Album",
        "TCON": "genre-3",
    }
    tag = make_id3v2(frames, version=version)
    total, parsed = parse_id3v2(tag + b"\xff\xfbrest")
    assert total == len(tag)
    assert parsed == frames
    # closed-form size: 10 header + per frame 10 + 1 + len(text)
    assert len(tag) == 10 + sum(11 + len(v) for v in frames.values())


def test_id3v2_wire_formats_differ():
    """A text long enough that synchsafe and plain sizes disagree (>127)
    must still roundtrip in BOTH versions — the parser really branches."""
    frames = {"TIT2": "x" * 200}
    for version in (3, 4):
        tag = make_id3v2(frames, version=version)
        _, parsed = parse_id3v2(tag)
        assert parsed["TIT2"] == "x" * 200
    # and the size bytes on the wire genuinely differ
    t3, t4 = make_id3v2(frames, 3), make_id3v2(frames, 4)
    assert t3[14:18] != t4[14:18]


def test_id3v2_utf16_and_utf8_texts():
    """Foreign encodings decode (we emit latin-1 but must read 1/3)."""
    text = "café – têtes"
    body = b""
    for enc, blob in ((1, "﻿".encode("utf-16-le")[:0] + text.encode("utf-16")), (3, text.encode("utf-8"))):
        payload = bytes([enc]) + blob
        body += b"TIT2" + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    tag = b"ID3" + bytes([3, 0, 0]) + _synchsafe(len(body)) + body
    _, parsed = parse_id3v2(tag)
    assert parsed["TIT2"] == text  # last one wins; both decoded
    with pytest.raises(NotImplementedError, match="encoding"):
        bad = bytes([2]) + text.encode("utf-16-be")
        body2 = b"TIT2" + struct.pack(">I", len(bad)) + b"\x00\x00" + bad
        parse_id3v2(b"ID3" + bytes([3, 0, 0]) + _synchsafe(len(body2)) + body2)


def test_id3v2_padding_and_unknown_frames_skipped():
    apic = b"APIC" + struct.pack(">I", 5) + b"\x00\x00" + b"\x01binz"
    tit = b"TIT2" + struct.pack(">I", 3) + b"\x00\x00" + b"\x00hi"
    body = apic + tit + b"\x00" * 16  # trailing padding
    tag = b"ID3" + bytes([3, 0, 0]) + _synchsafe(len(body)) + body
    total, parsed = parse_id3v2(tag)
    assert parsed == {"TIT2": "hi"}
    assert total == len(tag)


def test_id3v2_hostile_inputs():
    with pytest.raises(ValueError, match="exceeds the file"):
        parse_id3v2(b"ID3" + bytes([3, 0, 0]) + _synchsafe(1000))
    # v2.4's tag-level unsync flag is informational as of r14 — an
    # empty tag carrying it parses instead of gating
    assert parse_id3v2(
        b"ID3" + bytes([4, 0, 0x80]) + _synchsafe(0)
    ) == (10, {})
    # v2.2 compression flag — gated
    with pytest.raises(NotImplementedError, match="compression"):
        parse_id3v2(b"ID3" + bytes([2, 0, 0x40]) + _synchsafe(0))
    # frame overrunning the tag body
    body = b"TIT2" + struct.pack(">I", 99) + b"\x00\x00" + b"\x00x"
    with pytest.raises(ValueError, match="frame exceeds"):
        parse_id3v2(b"ID3" + bytes([3, 0, 0]) + _synchsafe(len(body)) + body)
    assert parse_id3v2(b"\xff\xfbno tag here") == (0, {})


def test_id3v1_roundtrip_and_absence():
    blk = make_id3v1("Title", "Artist", "Album", "1999", 17)
    assert len(blk) == 128
    v1 = parse_id3v1(b"audio" + blk)
    assert v1 == {
        "title": "Title", "artist": "Artist", "album": "Album",
        "year": "1999", "genre": 17,
    }
    assert parse_id3v1(b"no trailer") is None


def test_strip_tags_composes_with_frame_walk():
    audio = make_mp3(n_frames=7, bitrate_kbps=96, sample_rate=32000,
                     fill_seed=5)
    tag = make_id3v2({"TIT2": "t"}, version=4)
    payload = tag + audio + make_id3v1("v1", "", "", "2000", 3)
    bare, v2_len, v2, v1 = mp3_strip_tags(payload)
    assert bare == audio
    assert v2_len == len(tag)
    assert v2 == {"TIT2": "t"}
    assert v1["title"] == "v1" and v1["genre"] == 3
    assert len(demux_mp3_frames(bare)) == 7
    assert probe_mp3(bare)[0] == 7
    # untagged files pass through unchanged
    bare2, z, v2b, v1b = mp3_strip_tags(audio)
    assert bare2 == audio and z == 0 and v2b == {} and v1b is None
    # a raw tagged payload still refuses the DIRECT frame walk (the
    # strictness that motivated the strip layer)
    with pytest.raises(ValueError, match="lost MP3 frame sync"):
        demux_mp3_frames(payload)


def test_overlapping_tags_rejected():
    # an ID3v2 header whose declared size swallows the v1 trailer
    tag = make_id3v2({"TIT2": "t"}, version=3)
    v1 = make_id3v1("x", "", "", "2000", 1)
    # total payload shorter than v2_len + 128
    payload = tag[: len(tag)] + v1[:100] + v1  # garbage midsection
    crafted = b"ID3" + bytes([3, 0, 0]) + _synchsafe(len(payload) - 10 - 100) + payload[10:]
    with pytest.raises(ValueError, match="overlap|exceeds|frame"):
        mp3_strip_tags(crafted)


@pytest.mark.parametrize("unsync", [False, True])
def test_id3v22_roundtrip(unsync):
    """v2.2: 3-char frame ids (TT2/TP1/TAL/TYE/TCO) with 3-byte plain
    sizes and no frame flags, parsed back under their canonical 4-char
    names; optional tag-level unsynchronisation on top."""
    frames = {
        "TIT2": "Old Title" + ("ÿÿ" if unsync else ""),
        "TPE1": "Old Artist",
        "TALB": "Old Album",
        "TYER": "1987",
        "TCON": "genre-1",
    }
    tag = make_id3v2(frames, version=2, unsync=unsync)
    assert b"TT2" in tag and b"TIT2" not in tag
    total, parsed = parse_id3v2(tag + b"\xff\xfbrest")
    assert total == len(tag)
    assert parsed == frames
    # closed-form: 10 header + per frame 6 + 1 + len(text) (+1 stuffed)
    assert len(tag) == 10 + sum(
        7 + len(v.encode("latin-1")) for v in frames.values()
    ) + (1 if unsync else 0)
    # TDRC has no v2.2 equivalent — refuse rather than invent an id
    with pytest.raises(ValueError, match="no ID3v2.2 id"):
        make_id3v2({"TDRC": "2001"}, version=2)


def test_id3v2_unsynchronisation():
    """Tag-level unsync (v2.3): 0x00 stuffed after every 0xFF, header
    size counts stuffed bytes, the frame walk sees decoded bytes."""
    from pyiceberg_lakehouse_spark.operators.multimodal import (
        _id3_deunsync,
        _id3_unsync,
    )

    # stuffing rules: before >= 0xE0, before 0x00, at tag end
    assert _id3_unsync(b"\xff\xe0") == b"\xff\x00\xe0"
    assert _id3_unsync(b"\xff\x00") == b"\xff\x00\x00"
    assert _id3_unsync(b"ab\xff") == b"ab\xff\x00"
    assert _id3_unsync(b"\xff\x41") == b"\xff\x41"
    for blob in (b"\xff\xe0\xff\xff\x00\x12", b"", b"\xff" * 9):
        assert _id3_deunsync(_id3_unsync(blob)) == blob
    # a title full of 0xFF bytes roundtrips through a v2.3 unsync tag
    frames = {"TIT2": "ÿÿÿ", "TPE1": "a"}
    tag = make_id3v2(frames, version=3, unsync=True)
    assert tag[5] & 0x80
    total, parsed = parse_id3v2(tag)
    assert total == len(tag) and parsed == frames
    # v2.4 unsync is PER-FRAME (r14): same frames roundtrip there too
    tag4 = make_id3v2(frames, version=4, unsync=True)
    assert tag4[5] & 0x80  # informational tag-level flag
    total4, parsed4 = parse_id3v2(tag4)
    assert total4 == len(tag4) and parsed4 == frames


class TestV24Forms:
    """r14: per-frame unsynchronisation, data-length indicators and
    the footer — the remaining v2.4 wire forms."""

    def test_per_frame_unsync_roundtrip(self):
        from pyiceberg_lakehouse_spark.operators.multimodal import (
            make_id3v2,
            parse_id3v2,
        )

        tag = make_id3v2({"TIT2": "a\xffb\xff"}, version=4, unsync=True)
        # both 0xFFs stuff: mid-payload (followed by 'b'? no — only
        # before >=0xE0/0x00/end) ... the final 0xFF stuffs at end
        total, out = parse_id3v2(tag)
        assert out["TIT2"] == "a\xffb\xff" and total == len(tag)

    def test_data_length_indicator_validated(self):
        from pyiceberg_lakehouse_spark.operators.multimodal import (
            make_id3v2,
            parse_id3v2,
        )

        tag = make_id3v2(
            {"TIT2": "t\xff"}, version=4, unsync=True,
            data_length_indicator=True,
        )
        _, out = parse_id3v2(tag)
        assert out["TIT2"] == "t\xff"
        # corrupt the DLI -> strict error
        bad = bytearray(tag)
        at = tag.index(b"TIT2") + 10  # frame header, then DLI
        bad[at + 3] ^= 0x01
        import pytest as _pt

        with _pt.raises(ValueError, match="disagrees"):
            parse_id3v2(bytes(bad))

    def test_footer_counted_in_total(self):
        from pyiceberg_lakehouse_spark.operators.multimodal import (
            make_id3v2,
            parse_id3v2,
        )

        plain = make_id3v2({"TIT2": "x"}, version=4)
        with_f = make_id3v2({"TIT2": "x"}, version=4, footer=True)
        assert len(with_f) == len(plain) + 10
        assert with_f.rindex(b"3DI") == len(with_f) - 10
        total, _ = parse_id3v2(with_f + b"\xff\xfb")
        assert total == len(with_f)

    def test_compressed_encrypted_frames_gated(self):
        from pyiceberg_lakehouse_spark.operators.multimodal import (
            make_id3v2,
            parse_id3v2,
        )
        import pytest as _pt

        for version, bit in ((3, 0x80), (3, 0x40), (4, 0x08), (4, 0x04)):
            tag = bytearray(make_id3v2({"TIT2": "x"}, version=version))
            at = tag.index(b"TIT2") + 9  # format flags byte
            tag[at] |= bit
            with _pt.raises(NotImplementedError, match="compressed"):
                parse_id3v2(bytes(tag))


class TestMp4Itunes:
    """r14: the M4A/M4B ilst tag layer (the audio sibling of ID3)."""

    def _blob(self, plain):
        from pyiceberg_lakehouse_spark.operators.multimodal import (
            make_mp4_itunes,
        )

        return make_mp4_itunes(
            {"title": "T é", "artist": "A", "album": "B",
             "year": "1999", "genre": "G"},
            track=(3, 12), plain_meta=plain,
        )

    def test_both_meta_forms(self):
        from pyiceberg_lakehouse_spark.operators.multimodal import (
            parse_mp4_itunes,
        )

        for plain in (False, True):
            r = parse_mp4_itunes(self._blob(plain))
            assert r["title"] == "T é" and r["year"] == "1999"
            assert (r["track"], r["track_total"]) == (3, 12)

    def test_png_cover_roundtrips_through_the_codec(self):
        import numpy as np

        from pyiceberg_lakehouse_spark.operators.multimodal import (
            decode_png,
            encode_png,
            make_mp4_itunes,
            parse_mp4_itunes,
        )

        px = ((np.arange(35).reshape(5, 7) * 9) % 256).astype(np.uint8)
        r = parse_mp4_itunes(
            make_mp4_itunes({"title": "x"}, cover=encode_png(px))
        )
        assert r["cover_fmt"] == "png"
        assert (decode_png(r["cover"]).squeeze() == px).all()

    def test_wrong_data_type_raises(self):
        import pytest as _pt

        from pyiceberg_lakehouse_spark.operators.multimodal import (
            parse_mp4_itunes,
        )

        blob = bytearray(self._blob(False))
        # flip the title data atom's type flags from 1 to 7
        at = blob.index(b"\xa9nam")
        # fourcc(4) + size(4) + 'data'(4) -> flags at +12..16
        blob[at + 15] = 7
        with _pt.raises(ValueError, match="data type"):
            parse_mp4_itunes(bytes(blob))

    def test_oversized_child_raises(self):
        import pytest as _pt
        import struct as _st

        from pyiceberg_lakehouse_spark.operators.multimodal import (
            parse_mp4_itunes,
        )

        blob = bytearray(self._blob(False))
        at = blob.index(b"ilst") - 4
        _st.pack_into(">I", blob, at, 1 << 24)
        with _pt.raises(ValueError, match="exceeds"):
            parse_mp4_itunes(bytes(blob))


class TestImageDhash:
    """r14: dHash — resampling-invariant perceptual image dedup."""

    def _px(self, h=20, w=30):
        import numpy as np

        return ((np.arange(h * w).reshape(h, w) * 7) % 256).astype(
            np.uint8
        )

    def test_non_sampled_perturbation_collides(self):
        import numpy as np

        from pyiceberg_lakehouse_spark.operators.multimodal import (
            image_dhash,
        )

        px = self._px()
        h1 = image_dhash(px)
        xi = set(((np.arange(9) * 30) // 9).tolist())
        yi = set(((np.arange(8) * 20) // 8).tolist())
        px2 = px.copy()
        mask = np.ones(px.shape, dtype=bool)
        mask[np.ix_(sorted(yi), sorted(xi))] = False
        px2[mask] = (px2[mask].astype(int) + 3) % 256
        assert image_dhash(px2) == h1

    def test_sampled_change_flips(self):
        from pyiceberg_lakehouse_spark.operators.multimodal import (
            image_dhash,
        )

        px = self._px()
        px2 = px.copy()
        px2[0, 0] = 255
        assert image_dhash(px2) != image_dhash(px)

    def test_too_small_and_multichannel_gated(self):
        import numpy as np
        import pytest as _pt

        from pyiceberg_lakehouse_spark.operators.multimodal import (
            image_dhash,
        )

        with _pt.raises(ValueError, match="9x8"):
            image_dhash(np.zeros((4, 4), dtype=np.uint8))
        with _pt.raises(ValueError, match="single-channel"):
            image_dhash(np.zeros((20, 20, 3), dtype=np.uint8))
