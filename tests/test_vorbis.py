"""Vorbis decode tests (operators/vorbis.py): codeword assignment,
bitpack convention, floor1 integer algorithms, residue2, gates."""

from __future__ import annotations

import math

import pytest

from pyiceberg_lakehouse_spark.operators import vorbis as V
from pyiceberg_lakehouse_spark.operators.ogg import make_ogg


class TestBitpack:
    def test_lsb_first_roundtrip(self):
        w = V.LsbWriter()
        w.write(0b101, 3)
        w.write(0x5A3, 12)
        w.write(1, 1)
        data = w.to_bytes()
        bits = V.LsbBits(data)
        assert bits.read(3) == 0b101
        assert bits.read(12) == 0x5A3
        assert bits.read1() == 1

    def test_ilog_spec_examples(self):
        assert [V.ilog(x) for x in (0, 1, 2, 3, 4, 7)] == [0, 1, 2, 2, 3, 3]

    def test_float32_pack_unpack(self):
        for mant in (0, 1, -4, 100, -0x1FFFFF):
            assert V.float32_unpack(V.float32_pack(mant)) == float(mant)


class TestCodebooks:
    def test_spec_assignment_example(self):
        # the Vorbis I spec §3.2.1 worked example: lengths
        # [2,4,4,4,4,2,3,3] -> codewords 00,0100,0101,0110,0111,10,110,111
        codes = V.assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
        assert codes == [0b00, 0b0100, 0b0101, 0b0110, 0b0111,
                         0b10, 0b110, 0b111]

    def test_overspecified_raises(self):
        with pytest.raises(ValueError, match="overspecified"):
            V.assign_codewords([1, 1, 1])

    def test_unused_entries_skip(self):
        codes = V.assign_codewords([1, 0, 1])
        assert codes == [0b0, None, 0b1]

    def test_scalar_roundtrip_through_packed_header(self):
        w = V.LsbWriter()
        V.write_codebook(w, dim=2, lengths=[2, 2, 3, 3, 2])
        book = V.read_codebook(V.LsbBits(w.to_bytes()))
        for e in range(5):
            ww = V.LsbWriter()
            book.encode_scalar(ww, e)
            assert book.decode_scalar(V.LsbBits(ww.to_bytes())) == e

    def test_vq_lookup_type2_values(self):
        w = V.LsbWriter()
        V.write_codebook(
            w, dim=4, lengths=[3] * 8,
            lookup={"type": 2, "minimum_mant": -4, "delta_mant": 1,
                    "value_bits": 4, "sequence_p": 0,
                    "multiplicands": list(V._FIX_MULT)},
        )
        book = V.read_codebook(V.LsbBits(w.to_bytes()))
        for e in range(8):
            assert book.vq[e] == [
                ((4 * e + j) * 5) % 16 - 4 for j in range(4)
            ]

    def test_sparse_lengths_roundtrip(self):
        w = V.LsbWriter()
        V.write_codebook(w, dim=1, lengths=[1, 0, 2, 0, 2])
        book = V.read_codebook(V.LsbBits(w.to_bytes()))
        assert book.lengths == [1, 0, 2, 0, 2]


class TestFloor1:
    def test_inverse_db_table_pins(self):
        # the published endpoints agree with the generating curve
        # 10^((i-255)*7/256) to ~1e-6 relative (module docstring's
        # honesty note: the absolute anchor's 7th digit is unsettled
        # on this box); the step ratio is exact
        assert math.isclose(V.FLOOR1_INVERSE_DB[0], 1.0649863e-07,
                            rel_tol=1e-5)
        assert math.isclose(V.FLOOR1_INVERSE_DB[1], 1.1341951e-07,
                            rel_tol=1e-5)
        assert V.FLOOR1_INVERSE_DB[255] == 1.0
        step = V.FLOOR1_INVERSE_DB[100] / V.FLOOR1_INVERSE_DB[99]
        assert math.isclose(step, 10.0 ** (7.0 / 256.0), rel_tol=1e-12)

    def test_render_line_matches_closed_form(self):
        for y0, y1 in ((10, 90), (90, 10), (5, 5), (0, 127)):
            v = [0] * 128
            V.render_line(0, y0, 128, y1, v)
            sgn = -1 if y1 < y0 else 1
            want = [y0 + sgn * ((abs(y1 - y0) * x) // 128)
                    for x in range(128)]
            assert v == want

    def test_render_point_neighbors(self):
        xs = [0, 128, 32, 96]
        assert V._low_neighbor(xs, 2) == 0
        assert V._high_neighbor(xs, 2) == 1
        assert V.render_point(0, 40, 128, 20, 32) == 40 - (20 * 32) // 128


class TestEndToEnd:
    def _spec(self, d, g):
        classes = [1 if (d + g + p) % 3 == 0 else 0 for p in range(16)]
        entries = [([(d + g + p) % 8, (d + g + p + 3) % 8] if c else [])
                   for p, c in enumerate(classes)]
        return {"y0": 20 + (d + g) % 40, "y1": 10 + (d + g) % 50,
                "classes": classes, "entries": entries}

    @pytest.mark.parametrize("mult", [1, 2, 3, 4])
    def test_fixture_roundtrip_all_multipliers(self, mult):
        d = 7
        packets = V.encode_vorbis_fixture(
            [self._spec(d, g) for g in range(3)], multiplier=mult
        )
        out = V.decode_vorbis(packets)
        assert out["n_samples"] == 2 * 128
        for g in range(3):
            y0, y1 = 20 + (d + g) % 40, 10 + (d + g) % 50
            sgn = -1 if y1 < y0 else 1
            want = [min(255, mult * y0
                        + sgn * ((mult * abs(y1 - y0) * x) // 128))
                    for x in range(128)]
            assert out["floor_db"][g] == want

    def test_ogg_transport(self):
        packets = V.encode_vorbis_fixture(
            [self._spec(3, g) for g in range(4)], multiplier=2
        )
        out = V.decode_ogg_vorbis(make_ogg(packets))
        assert out["n_samples"] == 3 * 128
        # non-trivial audio came out
        assert max(abs(x) for x in out["pcm"]) > 0

    def test_spanning_pages_do_not_change_decode(self):
        packets = V.encode_vorbis_fixture(
            [self._spec(9, g) for g in range(3)], multiplier=1
        )
        a = V.decode_ogg_vorbis(make_ogg(packets))
        b = V.decode_ogg_vorbis(make_ogg(packets, max_segments=2))
        assert a["pcm"] == b["pcm"]

    def test_gates(self):
        packets = V.encode_vorbis_fixture(
            [self._spec(1, 0)], multiplier=1
        )
        # r17: stereo and two-blocksize are FEATURES now — a stereo id
        # header over the mono setup (no coupling, mux both to submap
        # 0) must parse and decode to an empty two-channel stream
        stereo_id = V.write_id_header(2, 8000, 256)
        out = V.decode_vorbis([stereo_id, packets[1], packets[2]])
        assert out["channels"] == 2 and out["n_samples"] == 0
        # two-blocksize id headers parse too
        two_id = V.write_id_header(1, 8000, 256, 2048)
        out = V.decode_vorbis([two_id, packets[1], packets[2]])
        assert (out["blocksize"], out["blocksize1"]) == (256, 2048)
        # an invalid coupling pair (mag == ang) still rejects cleanly
        w = V.LsbWriter()
        w.write(5, 8)
        for bch in b"vorbis":
            w.write(bch, 8)
        w.write(0, 8)  # one codebook...
        with pytest.raises(ValueError):
            V.read_setup_header(w.to_bytes(), 2)

    def test_hostile_truncation(self):
        packets = V.encode_vorbis_fixture(
            [self._spec(2, 0)], multiplier=1
        )
        with pytest.raises(ValueError):
            V.decode_vorbis([packets[0][:-2], packets[1], packets[2]])
