"""Opus probe/TOC layer (operators/opus.py) — RFC 6716 §3 packet
parsing, RFC 7845 §5.1 OpusHead and §4 Ogg framing rules."""

from __future__ import annotations

import pytest

from pyiceberg_lakehouse_spark.operators import opus as O
from pyiceberg_lakehouse_spark.operators.ogg import (
    make_ogg,
    make_opus_tags_packet,
)


class TestOpusHead:
    def test_family0_roundtrip(self):
        h = O.parse_opus_head(O.build_opus_head(
            channels=2, pre_skip=312, input_rate=44100,
            output_gain_q8=-512,
        ))
        assert h["channels"] == 2
        assert h["pre_skip"] == 312
        assert h["input_sample_rate"] == 44100
        assert h["output_gain_q8"] == -512  # signed Q7.8 (-2 dB)
        assert h["mapping_family"] == 0
        # family 0 implies one stream, coupled iff stereo
        assert (h["stream_count"], h["coupled_count"]) == (1, 1)

    def test_family1_surround(self):
        h = O.parse_opus_head(O.build_opus_head(
            channels=6, pre_skip=100, mapping_family=1,
            stream_count=4, coupled_count=2,
            channel_mapping=[0, 4, 1, 2, 3, 5],
        ))
        assert h["stream_count"] == 4
        assert h["coupled_count"] == 2
        assert h["channel_mapping"] == [0, 4, 1, 2, 3, 5]

    def test_rejections(self):
        with pytest.raises(ValueError, match="version"):
            O.parse_opus_head(b"OpusHead" + bytes([0x10]) + b"\x01" + b"\x00" * 9)
        # family 0 with 3 channels
        bad = bytearray(O.build_opus_head(channels=2))
        bad[9] = 3
        with pytest.raises(ValueError, match="family 0"):
            O.parse_opus_head(bytes(bad))
        # mapping index out of range
        with pytest.raises(ValueError, match="out of range"):
            O.parse_opus_head(O.build_opus_head(
                channels=2, mapping_family=1,
                stream_count=1, coupled_count=0,
                channel_mapping=[0, 5],
            ))
        # coupled > streams
        with pytest.raises(ValueError, match="coupled_count"):
            O.parse_opus_head(O.build_opus_head(
                channels=2, mapping_family=1,
                stream_count=1, coupled_count=2,
                channel_mapping=[0, 1],
            ))


class TestToc:
    def test_config_table_shape(self):
        # RFC 6716 §3.1 anchors
        assert O.parse_opus_toc(0)["mode"] == "SILK"
        assert O.parse_opus_toc(0)["bandwidth"] == "NB"
        assert O.parse_opus_toc(0)["frame_us"] == 10000
        assert O.parse_opus_toc(11 << 3)["frame_us"] == 60000
        assert O.parse_opus_toc(12 << 3)["mode"] == "HYBRID"
        assert O.parse_opus_toc(15 << 3)["bandwidth"] == "FB"
        assert O.parse_opus_toc(16 << 3)["mode"] == "CELT"
        assert O.parse_opus_toc(16 << 3)["frame_us"] == 2500
        assert O.parse_opus_toc(31 << 3)["bandwidth"] == "FB"
        assert O.parse_opus_toc((31 << 3) | 0x04)["stereo"]
        assert O.parse_opus_toc((31 << 3) | 3)["code"] == 3

    def test_samples_integral_for_all_configs(self):
        for cfg in range(32):
            info = O.parse_opus_packet(bytes([(cfg << 3)]) + b"x" * 9)
            assert info["samples48"] * 1000 == info["frame_us"] * 48


class TestPacketCodes:
    def test_code0(self):
        i = O.parse_opus_packet(O.build_opus_packet(28, [b"x" * 50]))
        assert (i["code"], i["n_frames"], i["samples48"]) == (0, 1, 120)

    def test_code1_equal_split(self):
        i = O.parse_opus_packet(O.build_opus_packet(1, [b"a" * 30] * 2))
        assert (i["code"], i["frame_sizes"]) == (1, [30, 30])
        with pytest.raises(ValueError, match="R3"):
            O.parse_opus_packet(bytes([(1 << 3) | 1]) + b"x" * 31)

    def test_code2_explicit_first(self):
        i = O.parse_opus_packet(
            O.build_opus_packet(14, [b"a" * 10, b"b" * 300])
        )
        assert (i["code"], i["frame_sizes"]) == (2, [10, 300])
        # 2-byte length for the first frame
        i2 = O.parse_opus_packet(
            O.build_opus_packet(14, [b"a" * 400, b"b" * 3])
        )
        assert i2["frame_sizes"] == [400, 3]
        with pytest.raises(ValueError, match="R4"):
            O.parse_opus_packet(bytes([(14 << 3) | 2, 200]) + b"x" * 50)

    def test_code3_cbr_padding(self):
        i = O.parse_opus_packet(
            O.build_opus_packet(16, [b"c" * 40] * 5, padding=7)
        )
        assert (i["code"], i["n_frames"], i["padding"], i["vbr"]) == \
            (3, 5, 7, False)
        assert i["frame_sizes"] == [40] * 5

    def test_code3_vbr(self):
        i = O.parse_opus_packet(O.build_opus_packet(
            19, [b"c" * 40, b"d" * 260, b"e" * 5], vbr=True
        ))
        assert i["vbr"] and i["frame_sizes"] == [40, 260, 5]

    def test_code3_long_padding_255_chain(self):
        i = O.parse_opus_packet(
            O.build_opus_packet(16, [b"c" * 10] * 2, padding=300)
        )
        assert i["padding"] == 300

    def test_rules(self):
        with pytest.raises(ValueError, match="R1"):
            O.parse_opus_packet(b"")
        with pytest.raises(ValueError, match="R5"):
            O.parse_opus_packet(O.build_opus_packet(1, [b"x"] * 48))
        # 48 x 2.5ms = 120ms is LEGAL at the boundary
        i = O.parse_opus_packet(O.build_opus_packet(16, [b"x"] * 48))
        assert i["n_frames"] == 48 and i["samples48"] == 5760
        with pytest.raises(ValueError, match="R6"):
            O.parse_opus_packet(bytes([(16 << 3) | 3, 3]) + b"x" * 10)
        with pytest.raises(ValueError, match="R2"):
            O.parse_opus_packet(bytes([16 << 3]) + b"x" * 1276)


class TestOggFraming:
    def _stream(self, max_segments=255):
        head = O.build_opus_head(channels=1, pre_skip=64)
        tags = make_opus_tags_packet("v", [("A", "b")])
        audio = [
            O.build_opus_packet(28, [b"x" * 50]),
            O.build_opus_packet(1, [b"y" * 20] * 2),
        ]
        return head, tags, audio, O.make_ogg_opus(
            head, tags, audio, max_segments=max_segments
        )

    def test_probe(self):
        _h, _t, audio, blob = self._stream()
        pr = O.probe_ogg_opus(blob)
        assert pr["n_packets"] == 2
        assert pr["samples48"] == 120 + 1920
        assert pr["out_samples48"] == 120 + 1920 - 64
        assert pr["duration_us"] == (120 + 1920) * 1000 // 48
        assert pr["n_celt"] == 1 and pr["n_silk"] == 1
        assert pr["tags"] == [("A", "b")]

    def test_head_alone_on_bos_page_enforced(self):
        head, tags, audio, _ = self._stream()
        # mux WITHOUT the page break: header page also holds tags
        bad = make_ogg([head, tags] + audio, granules=[0, 0, 120, 2040])
        with pytest.raises(ValueError, match="ALONE"):
            O.probe_ogg_opus(bad)

    def test_final_granule_cross_check(self):
        head, tags, audio, _ = self._stream()
        from pyiceberg_lakehouse_spark.operators.ogg import make_ogg as mk
        bad = mk(
            [head, tags] + audio,
            granules=[0, 0, 120, 999999],  # wrong final granule
            page_break_after={0, 1},
        )
        with pytest.raises(ValueError, match="final granule"):
            O.probe_ogg_opus(bad)

    def test_spanning_pages(self):
        # tiny max_segments forces packets to span pages; probe still
        # reassembles and the granule math holds
        _h, _t, _a, blob = self._stream(max_segments=1)
        pr = O.probe_ogg_opus(blob)
        assert pr["n_packets"] == 2 and pr["samples48"] == 2040

    def test_decode_gate(self):
        with pytest.raises(NotImplementedError, match="SILK"):
            O.decode_opus_packet(b"\x00")
