"""Ogg container (operators/ogg.py): lacing, spanning, CRC, flags,
hostile inputs."""

from __future__ import annotations

import struct

import pytest

from pyiceberg_lakehouse_spark.operators.ogg import (
    make_ogg,
    ogg_crc,
    parse_ogg,
)


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        sizes=st.lists(st.integers(0, 1200), min_size=1, max_size=8),
        ms=st.integers(1, 255),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(sizes, ms, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        packets = [rng.bytes(s) for s in sizes]
        out = parse_ogg(make_ogg(packets, max_segments=ms))
        assert [p["data"] for p in out["packets"]] == packets
        # page arithmetic: nsegs = size//255 + 1, split every ms
        cum = 0
        for p, s in zip(out["packets"], sizes):
            nsegs = s // 255 + 1
            assert p["first_page"] == cum // ms
            assert p["last_page"] == (cum + nsegs - 1) // ms
            cum += nsegs
        assert out["n_pages"] == (cum + ms - 1) // ms

    check()


def test_zero_lacing_terminator_for_exact_multiples():
    """A 510-byte packet laces as 255,255,0 — dropping the 0 would glue
    it to the next packet."""
    out = parse_ogg(make_ogg([b"x" * 510, b"y" * 3]))
    assert [p["size"] for p in out["packets"]] == [510, 3]
    # empty packet = single 0 lacing
    out2 = parse_ogg(make_ogg([b"", b"z"]))
    assert [p["size"] for p in out2["packets"]] == [0, 1]


def test_flags_and_granules():
    raw = make_ogg([b"a" * 600, b"b"], max_segments=2)
    out = parse_ogg(raw)
    assert out["packets"][0]["first_page"] == 0
    assert out["packets"][0]["last_page"] == 1
    # page 1 header: continuation set, BOS clear
    second = raw.index(b"OggS", 4)
    assert raw[second + 5] & 0x01
    assert not raw[second + 5] & 0x02
    assert raw[4 + 1] & 0x02 or raw[5] & 0x02  # first page BOS
    # custom granules land on the completing page
    out3 = parse_ogg(make_ogg([b"p", b"q"], granules=[100, 200],
                              max_segments=1))
    assert [p["granule"] for p in out3["packets"]] == [100, 200]


def test_crc_and_hostile_inputs():
    raw = bytearray(make_ogg([b"hello" * 30]))
    raw[40] ^= 0xFF  # flip a lacing/body byte
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_ogg(bytes(raw))
    good = make_ogg([b"hello"])
    with pytest.raises(ValueError, match="capture pattern"):
        parse_ogg(b"XggS" + good[1:])
    with pytest.raises(ValueError, match="no EOS"):
        # strip the EOS flag and refresh the CRC
        raw2 = bytearray(good)
        raw2[5] &= ~0x04
        raw2[22:26] = b"\x00\x00\x00\x00"
        crc = ogg_crc(bytes(raw2))
        raw2[22:26] = struct.pack("<I", crc)
        parse_ogg(bytes(raw2))
    with pytest.raises(ValueError, match="sequence gap"):
        three = make_ogg([b"a" * 600], max_segments=1)  # 3 pages
        p1 = three.index(b"OggS", 4)
        p2 = three.index(b"OggS", p1 + 4)
        parse_ogg(three[:p1] + three[p2:])  # drop the middle page
    # truncated mid-packet
    with pytest.raises(ValueError, match="exceeds the file|inside a spanning"):
        parse_ogg(make_ogg([b"a" * 600], max_segments=2)[:-5])
    # second serial = multiplexed -> honest gate
    a = make_ogg([b"a"], serial=1)
    b = make_ogg([b"b"], serial=2)
    raw3 = bytearray(a[:5]) ; raw3 = bytearray(a)
    raw3[5] &= ~0x04  # page 0 no longer EOS
    raw3[22:26] = b"\x00\x00\x00\x00"
    crc = ogg_crc(bytes(raw3))
    raw3[22:26] = struct.pack("<I", crc)
    fixed_b = bytearray(b)
    fixed_b[18:22] = struct.pack("<I", 1)  # page seq 1
    fixed_b[5] &= ~0x02
    fixed_b[22:26] = b"\x00\x00\x00\x00"
    fixed_b[22:26] = struct.pack("<I", ogg_crc(bytes(fixed_b)))
    with pytest.raises(NotImplementedError, match="serial"):
        parse_ogg(bytes(raw3) + bytes(fixed_b))


def test_probe_ogg_codec():
    from pyiceberg_lakehouse_spark.operators.ogg import probe_ogg_codec

    opus_head = (
        b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + b"\x00"
    )
    m = probe_ogg_codec(make_ogg([opus_head, b"OpusTags....", b"audio"]))
    assert m == {
        "codec": "opus", "channels": 2, "pre_skip": 312,
        "sample_rate": 48000,
    }
    vorbis_id = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
        + struct.pack("<I", 44100) + bytes(12)
    )
    m2 = probe_ogg_codec(make_ogg([vorbis_id, b"rest"]))
    assert m2 == {"codec": "vorbis", "channels": 2, "sample_rate": 44100}
    with pytest.raises(NotImplementedError, match="unknown Ogg codec"):
        probe_ogg_codec(make_ogg([b"FLAC....."]))
    with pytest.raises(ValueError, match="OpusHead version"):
        bad = b"OpusHead" + bytes([0x10, 2]) + bytes(10)
        probe_ogg_codec(make_ogg([bad]))


def test_chained_streams():
    """RFC 3533 chaining (VERDICT r13 task #4): EOS ends a link, a BOS
    page with a fresh serial begins the next, page numbering restarts.
    parse_ogg_chain walks every link; parse_ogg stays strict."""
    from pyiceberg_lakehouse_spark.operators.ogg import parse_ogg_chain

    p1 = [b"A" * 100, b"B" * 510, b"C" * 300]
    p2 = [b"D" * 255, b"E" * 40]
    p3 = [b"F" * 7]
    chain = (
        make_ogg(p1, serial=11, max_segments=2)
        + make_ogg(p2, serial=22, max_segments=3)
        + make_ogg(p3, serial=33)
    )
    links = parse_ogg_chain(chain)
    assert [ln["serial"] for ln in links] == [11, 22, 33]
    assert [p["data"] for p in links[0]["packets"]] == p1
    assert [p["data"] for p in links[1]["packets"]] == p2
    assert [p["data"] for p in links[2]["packets"]] == p3
    # per-link page numbering restarts at 0
    assert links[1]["packets"][0]["first_page"] == 0
    # the single-stream form refuses chains, pointing at the chain API
    with pytest.raises(ValueError, match="parse_ogg_chain"):
        parse_ogg(chain)
    # a reused serial across links is corruption, not chaining
    with pytest.raises(ValueError, match="reuses serial"):
        parse_ogg_chain(
            make_ogg(p1, serial=5) + make_ogg(p2, serial=5)
        )
    # a link must open with BOS: clear it on link 2's first page, re-CRC
    second = bytearray(make_ogg(p3, serial=44))
    second[5] &= ~0x02
    second[22:26] = b"\x00\x00\x00\x00"
    second[22:26] = struct.pack("<I", ogg_crc(bytes(second)))
    with pytest.raises(ValueError, match="must start with BOS"):
        parse_ogg_chain(make_ogg(p1, serial=11) + bytes(second))
    with pytest.raises(ValueError, match="empty Ogg payload"):
        parse_ogg_chain(b"")


def test_probe_chained_first_link():
    """A chained file identifies from its first link's id header."""
    from pyiceberg_lakehouse_spark.operators.ogg import probe_ogg_codec

    opus_head = (
        b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
        + struct.pack("<I", 48000) + b"\x00\x00\x00"
    )
    chain = (
        make_ogg([opus_head, b"data"], serial=1)
        + make_ogg([b"\x01vorbis" + b"\x00" * 4 + bytes([2])
                    + struct.pack("<I", 44100) + b"\x00" * 5], serial=2)
    )
    got = probe_ogg_codec(chain)
    assert got["codec"] == "opus" and got["pre_skip"] == 312


class TestGroupedStreams:
    def _mux(self, interleave=1, max_segments=255):
        from pyiceberg_lakehouse_spark.operators.ogg import make_ogg_group

        a = [bytes([1]) * 30, bytes([2]) * 600, bytes([3]) * 10]
        v = [bytes([9]) * 700, bytes([8]) * 5]
        blob = make_ogg_group(
            [
                {"serial": 11, "packets": a,
                 "max_segments": max_segments},
                {"serial": 22, "packets": v,
                 "max_segments": max_segments},
            ],
            interleave=interleave,
        )
        return a, v, blob

    def test_roundtrip_various_interleaves(self):
        from pyiceberg_lakehouse_spark.operators.ogg import (
            parse_ogg_group,
        )

        for interleave in (1, 2, 3):
            for max_segments in (1, 2, 255):
                a, v, blob = self._mux(interleave, max_segments)
                streams = parse_ogg_group(blob)
                assert [s["serial"] for s in streams] == [11, 22]
                assert [p["data"] for p in streams[0]["packets"]] == a
                assert [p["data"] for p in streams[1]["packets"]] == v

    def test_single_stream_also_parses_as_group(self):
        from pyiceberg_lakehouse_spark.operators.ogg import (
            make_ogg,
            parse_ogg_group,
        )

        blob = make_ogg([b"xy", b"z" * 300], serial=7, max_segments=2)
        (s,) = parse_ogg_group(blob)
        assert [p["data"] for p in s["packets"]] == [b"xy", b"z" * 300]

    def test_bos_after_data_rejected(self):
        from pyiceberg_lakehouse_spark.operators.ogg import (
            make_ogg,
            parse_ogg_group,
        )

        # two complete single-stream files concatenated = a CHAIN, not
        # a group: the second BOS arrives after data pages
        blob = make_ogg([b"a", b"b"], serial=1, max_segments=1)
        blob += make_ogg([b"c"], serial=2)
        with pytest.raises(ValueError, match="grouping rule|after data"):
            parse_ogg_group(blob)

    def test_per_stream_sequence_and_crc(self):
        from pyiceberg_lakehouse_spark.operators.ogg import (
            parse_ogg_group,
        )

        _a, _v, blob = self._mux(1, 2)
        bad = bytearray(blob)
        bad[-3] ^= 0x40  # flip a bit in the last page body
        with pytest.raises(ValueError, match="CRC"):
            parse_ogg_group(bytes(bad))

    def test_unknown_serial_rejected(self):
        from pyiceberg_lakehouse_spark.operators.ogg import (
            make_ogg,
            parse_ogg_group,
        )

        blob = bytearray(make_ogg([b"a", b"bb"], serial=5, max_segments=1))
        # strip the BOS flag from the first page and fix its CRC
        import struct as _st

        from pyiceberg_lakehouse_spark.operators.ogg import ogg_crc

        n_segs = blob[26]
        body_len = sum(blob[27 : 27 + n_segs])
        end = 27 + n_segs + body_len
        blob[5] &= ~0x02
        zeroed = bytes(blob[:22]) + b"\x00" * 4 + bytes(blob[26:end])
        _st.pack_into("<I", blob, 22, ogg_crc(zeroed))
        with pytest.raises(ValueError, match="no BOS|must start"):
            parse_ogg_group(bytes(blob))

    def test_duplicate_serial_rejected(self):
        from pyiceberg_lakehouse_spark.operators.ogg import make_ogg_group

        with pytest.raises(ValueError, match="distinct serials"):
            make_ogg_group(
                [
                    {"serial": 1, "packets": [b"a"]},
                    {"serial": 1, "packets": [b"b"]},
                ]
            )
