"""EBML/Matroska/WebM probe pins: VINTs, walk, gates."""

import pytest

from pyiceberg_lakehouse_spark.operators.ebml import (
    _read_vint,
    _write_vint_size,
    make_matroska,
    probe_matroska,
)


class TestVint:
    def test_size_roundtrip_all_lengths(self):
        for v in (0, 1, 126, 127, 128, 16382, 16383, 16384,
                  (1 << 21) - 2, (1 << 21), (1 << 49) - 2):
            enc = _write_vint_size(v)
            got, pos, unknown = _read_vint(enc, 0, keep_marker=False)
            assert (got, pos, unknown) == (v, len(enc), False), v

    def test_boundary_values_widen(self):
        # 127 needs 2 bytes (1-byte all-ones is reserved for unknown)
        assert len(_write_vint_size(126)) == 1
        assert len(_write_vint_size(127)) == 2

    def test_unknown_size_detected(self):
        got, _pos, unknown = _read_vint(b"\xff", 0, keep_marker=False)
        assert unknown and got == 127

    def test_leading_zero_rejected(self):
        with pytest.raises(ValueError, match="VINT"):
            _read_vint(b"\x00\x80", 0, keep_marker=False)


class TestProbe:
    def _tracks(self):
        return [
            {"number": 1, "type": "video", "codec_id": "V_VP9",
             "width": 640, "height": 360},
            {"number": 2, "type": "audio", "codec_id": "A_OPUS",
             "language": "deu", "sampling_frequency": 48000.0,
             "channels": 2, "bit_depth": 16},
        ]

    def test_full_probe(self):
        blob = make_matroska(
            doc_type="matroska", duration=3000.0,
            muxing_app="m", writing_app="w",
            tracks=self._tracks(), n_clusters=4,
            segment_uuid=bytes(range(16)),
        )
        r = probe_matroska(blob)
        assert r["doc_type"] == "matroska" and r["duration_s"] == 3.0
        assert r["n_clusters"] == 4
        assert r["segment_uuid"] == bytes(range(16)).hex()
        v, a = r["tracks"]
        assert (v["codec_id"], v["width"], v["height"]) == ("V_VP9", 640, 360)
        assert v["language"] == "eng"  # spec default when absent
        assert (a["language"], a["channels"], a["bit_depth"]) == ("deu", 2, 16)
        assert a["sampling_frequency"] == 48000.0

    def test_streamed_unknown_segment_size(self):
        blob = make_matroska(
            tracks=self._tracks()[:1], unknown_segment_size=True,
            n_clusters=2,
        )
        r = probe_matroska(blob)
        assert r["unknown_segment_size"] and r["n_clusters"] == 2

    def test_unknown_elements_skipped_by_size(self):
        # the writer plants an unknown element in every TrackEntry —
        # a probe missing the skip contract would desync there
        r = probe_matroska(make_matroska(tracks=self._tracks()))
        assert len(r["tracks"]) == 2

    def test_read_version_gated(self):
        blob = bytearray(make_matroska(tracks=self._tracks()[:1]))
        at = blob.index(b"\x42\xf7")  # EBMLReadVersion element
        blob[at + 3] = 9
        with pytest.raises(NotImplementedError, match="EBMLReadVersion"):
            probe_matroska(bytes(blob))

    def test_not_ebml(self):
        with pytest.raises(ValueError, match="EBML"):
            probe_matroska(b"RIFFxxxxWEBP")

    def test_oversized_child_rejected(self):
        blob = bytearray(make_matroska(tracks=self._tracks()[:1]))
        # corrupt the TrackEntry size to exceed its parent (the first
        # 0xAE byte is inside the Tracks ID itself — skip past it)
        tracks_at = blob.index(b"\x16\x54\xae\x6b")
        at = blob.index(b"\xae", tracks_at + 4)  # TrackEntry id
        blob[at + 1] = 0xFE  # huge 1-byte size
        with pytest.raises(ValueError, match="exceeds"):
            probe_matroska(bytes(blob))


class TestSimpleBlockLacing:
    """r15: cluster SimpleBlock walk with all four lacing modes (the
    'EBML lacing depths' gate from VERDICT r14)."""

    def _mkv(self):
        from pyiceberg_lakehouse_spark.operators import ebml as E

        return E.make_matroska(
            tracks=[{"number": 1, "type": "video", "codec_id": "V_VP9",
                     "width": 64, "height": 48},
                    {"number": 2, "type": "audio", "codec_id": "A_OPUS",
                     "sampling_frequency": 48000, "channels": 2}],
            n_clusters=3,
            blocks_per_cluster=[
                [{"track": 1, "frames": [b"only"], "lacing": "none"},
                 {"track": 1, "frames": [b"xx", b"yy", b"zz"],
                  "lacing": "fixed"}],
                [{"track": 2, "frames": [b"aaaa", b"b" * 300, b"cc"],
                  "lacing": "xiph"}],
                [{"track": 2,
                  "frames": [bytes(300), b"q" * 5, b"r" * 700],
                  "lacing": "ebml"}],
            ],
        )

    def test_all_lacings_roundtrip(self):
        from pyiceberg_lakehouse_spark.operators import ebml as E

        r = E.probe_matroska(self._mkv())
        v, a = r["block_stats"][1], r["block_stats"][2]
        assert (v["n_blocks"], v["n_frames"], v["frame_bytes"]) == (2, 4, 10)
        assert v["lacings"] == ["fixed", "none"]
        assert (a["n_blocks"], a["n_frames"]) == (2, 6)
        assert a["frame_bytes"] == 4 + 300 + 2 + 300 + 5 + 700
        assert a["lacings"] == ["ebml", "xiph"]

    def test_xiph_255_boundary(self):
        # a 255-byte frame needs the 255+0 two-byte Xiph size form
        from pyiceberg_lakehouse_spark.operators import ebml as E

        mkv = E.make_matroska(
            tracks=[{"number": 1, "type": "video", "codec_id": "V_VP8",
                     "width": 16, "height": 16}],
            n_clusters=1,
            blocks_per_cluster=[[{"track": 1, "lacing": "xiph",
                                  "frames": [b"x" * 255, b"y" * 510, b"z"]}]],
        )
        st = E.probe_matroska(mkv)["block_stats"][1]
        assert st["n_frames"] == 3 and st["frame_bytes"] == 255 + 510 + 1

    def test_corrupt_lace_sizes_raise(self):
        import pytest as _pt

        from pyiceberg_lakehouse_spark.operators import ebml as E

        payload = bytearray(E._simple_block(1, 0, [b"abc", b"defg"], "xiph"))
        payload[4] = 200  # first lace size now exceeds the block extent
        with _pt.raises(ValueError):
            E._parse_simple_block(bytes(payload))
