"""Vorbis stereo coupling + two-blocksize decode (operators/vorbis.py,
VERDICT r16 task #2). Everything here validates against CLOSED-FORM
spec math computed independently in this file — square-polar inverse
coupling restated as the literal §4.3.5 table, window shapes and the
lapped overlap-add restated as an absolute-timeline NumPy pipeline
(not the decoder's incremental formula), floor curves restated from
the Bresenham closed form."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators import vorbis as V
from pyiceberg_lakehouse_spark.operators.ogg import make_ogg


def vq_vector(e: int) -> list[int]:
    """The fixture VQ book's dim-4 value vector for entry e."""
    return [((4 * e + j) * 5) % 16 - 4 for j in range(4)]


def ref_inverse_coupling(m: float, a: float) -> tuple[float, float]:
    """Spec §4.3.5, restated literally."""
    if m > 0:
        if a > 0:
            return m, m - a
        return m + a, m
    if a > 0:
        return m, m + a
    return m - a, m


def planted_residues(spec: dict, n2: int) -> tuple[list, list]:
    """Interleaved fixture residue -> per-channel vectors BEFORE
    coupling."""
    size = 2 * n2
    vec = [0.0] * size
    for p, c in enumerate(spec["classes"]):
        if not c:
            continue
        for k, e in enumerate(spec["entries"][p]):
            for j, val in enumerate(vq_vector(e)):
                vec[8 * p + 4 * k + j] = float(val)
    ch0 = [vec[2 * i] for i in range(n2)]
    ch1 = [vec[2 * i + 1] for i in range(n2)]
    return ch0, ch1


def ref_floor_curve(y0: int, y1: int, mult: int, n2: int) -> list[int]:
    """Closed-form fixture floor: one rendered line 0..127 then flat at
    m*y1 (posts at x=32/96 are zero-valued, so they sit on the line and
    render nothing)."""
    sgn = -1 if y1 < y0 else 1
    out = [
        min(255, mult * y0 + sgn * ((mult * abs(y1 - y0) * x) // 128))
        for x in range(min(128, n2))
    ]
    out.extend([min(255, mult * y1)] * (n2 - len(out)))
    return out


def ref_decode(specs: list[dict], mult: int, bs0=256, bs1=512):
    """Independent absolute-timeline reference: windowed blocks are
    ADDED into one long buffer at their absolute start offsets; the
    returned PCM is the region between the first and last window
    centers (the spec's definition), not the decoder's incremental
    prev_right formula."""
    table = np.array(V.FLOOR1_INVERSE_DB)
    bases = {}
    for n in (bs0, bs1):
        n2 = n // 2
        J, K = np.meshgrid(np.arange(n), np.arange(n2), indexing="ij")
        bases[n] = np.cos(np.pi / (2.0 * n) * (2 * J + 1 + n2) * (2 * K + 1))

    def win(n, prev_short, next_short):
        left_n = bs0 // 2 if prev_short else n // 2
        left_start = n // 4 - bs0 // 4 if prev_short else 0
        right_n = bs0 // 2 if next_short else n // 2
        right_start = 3 * n // 4 - bs0 // 4 if next_short else n // 2
        w = np.zeros(n)
        i = np.arange(left_n)
        w[left_start : left_start + left_n] = np.sin(
            0.5 * np.pi * np.sin(np.pi / (2 * left_n) * (i + 0.5)) ** 2
        )
        w[left_start + left_n : right_start] = 1.0
        i = np.arange(right_n)
        w[right_start : right_start + right_n] = np.sin(
            0.5 * np.pi * np.cos(np.pi / (2 * right_n) * (i + 0.5)) ** 2
        )
        return w

    total = sum((bs1 if s["mode"] else bs0) for s in specs) + bs1
    out = [np.zeros(total), np.zeros(total)]
    center = None
    first_center = last_center = None
    prev_n = None
    for s in specs:
        n = bs1 if s["mode"] else bs0
        n2 = n // 2
        if center is None:
            center = n // 2
            first_center = center
        else:
            center = center + prev_n // 4 + n // 4
        start = center - n // 2
        last_center = center
        prev_n = n
        long_block = bool(s["mode"]) and bs1 != bs0
        w = win(
            n,
            long_block and not s.get("prev_flag", 1),
            long_block and not s.get("next_flag", 1),
        )
        r0, r1 = planted_residues(s, n2)
        res = [list(r0), list(r1)]
        for i in range(n2):
            res[0][i], res[1][i] = ref_inverse_coupling(res[0][i], res[1][i])
        for ch in range(2):
            fl = s["floors"][ch]
            if fl is None:
                continue
            curve = ref_floor_curve(fl["y0"], fl["y1"], mult, n2)
            spec_vec = table[np.array(curve)] * np.array(res[ch])
            y = (bases[n] @ spec_vec) * w
            out[ch][start : start + n] += y
    return [o[first_center:last_center] for o in out]


def _spec(mode: int, d: int, floors=None, prev_flag=1, next_flag=1):
    n2 = 256 if mode else 128
    nparts = (2 * n2) // 8
    classes = [1 if (d + p) % 3 == 0 else 0 for p in range(nparts)]
    entries = [
        ([(d + p) % 8, (d + p + 5) % 8] if c else [])
        for p, c in enumerate(classes)
    ]
    return {
        "mode": mode, "prev_flag": prev_flag, "next_flag": next_flag,
        "floors": floors if floors is not None
        else [{"y0": 20 + d % 40, "y1": 15 + d % 50},
              {"y0": 30 + d % 30, "y1": 5 + d % 60}],
        "classes": classes, "entries": entries,
    }


class TestWindowShapes:
    def test_full_slope_matches_vorbis_window(self):
        for n in (256, 512):
            assert V.vorbis_window_shaped(n, False, False, 256) == \
                pytest.approx(V.vorbis_window(n))

    def test_narrowed_slopes(self):
        n, bs0 = 512, 256
        w = V.vorbis_window_shaped(n, True, False, bs0)
        # zeros before the narrowed left slope, 1.0 plateau after it
        assert all(v == 0.0 for v in w[: n // 4 - bs0 // 4])
        assert w[n // 4 + bs0 // 4] == pytest.approx(1.0)
        # right half is the full slope
        assert w[n // 2 :] == pytest.approx(
            V.vorbis_window(n)[n // 2 :]
        )
        w = V.vorbis_window_shaped(n, False, True, bs0)
        assert all(v == 0.0 for v in w[3 * n // 4 + bs0 // 4 :])
        assert w[: n // 2] == pytest.approx(V.vorbis_window(n)[: n // 2])

    def test_slope_complementarity(self):
        # Princen-Bradley power complementarity: w[i]^2 + w[n/2+i]^2 = 1
        # (sin(pi/n(n/2+i+.5)) = cos(pi/n(i+.5)), so the two shaped
        # slopes are sin/cos of the same angle) — the lapped
        # overlap-add reconstructs exactly because of this identity
        n = 256
        w = V.vorbis_window(n)
        for i in range(n // 2):
            assert w[i] ** 2 + w[n // 2 + i] ** 2 == pytest.approx(1.0)


class TestInverseCoupling:
    @pytest.mark.parametrize(
        "m,a", [(3, 1), (3, -2), (-3, 1), (-3, -2), (0, 2), (0, -2),
                (2, 0), (-2, 0), (0, 0)]
    )
    def test_table(self, m, a):
        mag, ang = [float(m)], [float(a)]
        V.inverse_coupling(mag, ang)
        assert (mag[0], ang[0]) == ref_inverse_coupling(m, a)

    def test_magnitude_angle_roundtrip_domain(self):
        # forward coupling (encoder side): M = max, A = difference in
        # the square-polar square; inverse must restore every integer
        # pair in a small box
        for x in range(-5, 6):
            for y in range(-5, 6):
                # forward per the spec's encoder convention
                if abs(x) >= abs(y):
                    m = x
                    a = x - y if x > 0 else y - x
                else:
                    m = y
                    a = x - y if y > 0 else y - x
                got_m, got_a = [float(m)], [float(a)]
                V.inverse_coupling(got_m, got_a)
                assert (got_m[0], got_a[0]) == (float(x), float(y)), (x, y)


class TestStereoDecode:
    def test_residues_and_coupling_closed_form(self):
        specs = [_spec(0, d) for d in range(3)]
        packets = V.encode_vorbis_fixture_stereo(specs)
        out = V.decode_vorbis(packets)
        assert out["channels"] == 2
        assert out["block_sizes"] == [256, 256, 256]
        for g, s in enumerate(specs):
            r0, r1 = planted_residues(s, 128)
            exp = [list(r0), list(r1)]
            for i in range(128):
                exp[0][i], exp[1][i] = ref_inverse_coupling(
                    exp[0][i], exp[1][i]
                )
            assert out["residues"][g][0] == exp[0]
            assert out["residues"][g][1] == exp[1]

    def test_floor_curves_per_channel(self):
        specs = [_spec(0, 7)]
        out = V.decode_vorbis(V.encode_vorbis_fixture_stereo(specs))
        for ch in range(2):
            fl = specs[0]["floors"][ch]
            assert out["floor_db"][0][ch] == ref_floor_curve(
                fl["y0"], fl["y1"], 1, 128
            )

    def test_silent_channel_coupling_propagation(self):
        # channel 0 floor unused, channel 1 nonzero: the coupled pair
        # still decodes residue (§4.3.2) and channel 0 stays silent
        specs = [_spec(0, 1), _spec(0, 4, floors=[None, {"y0": 9, "y1": 3}])]
        out = V.decode_vorbis(V.encode_vorbis_fixture_stereo(specs))
        assert out["floors"][1][0] is None
        # residue WAS decoded for both channels of packet 2
        r0, r1 = planted_residues(specs[1], 128)
        exp = [list(r0), list(r1)]
        for i in range(128):
            exp[0][i], exp[1][i] = ref_inverse_coupling(exp[0][i], exp[1][i])
        assert out["residues"][1][0] == exp[0]
        # the silent channel's PCM contribution is zero (its spectrum
        # is zeroed by the unused floor even though residue decoded)
        ref = ref_decode(specs, 1)
        assert np.allclose(out["pcm"][0], ref[0], rtol=1e-9, atol=1e-12)

    def test_all_silent_packet_consumes_no_residue(self):
        specs = [_spec(0, 2),
                 {"mode": 0, "floors": [None, None], "classes": [],
                  "entries": []},
                 _spec(0, 5)]
        out = V.decode_vorbis(V.encode_vorbis_fixture_stereo(specs))
        assert out["floors"][1] == [None, None]
        assert all(v == 0.0 for v in out["residues"][1][0])
        # decode stayed in sync: packet 3's residues still exact
        r0, _r1 = planted_residues(specs[2], 128)
        got = out["residues"][2]
        exp0 = list(r0)
        _, r1 = planted_residues(specs[2], 128)
        exp1 = list(r1)
        for i in range(128):
            exp0[i], exp1[i] = ref_inverse_coupling(exp0[i], exp1[i])
        assert got[0] == exp0 and got[1] == exp1


class TestTwoBlocksize:
    def test_sample_accounting_across_transitions(self):
        # short, long(prev short, next long), long(prev long, next
        # short), short: returned = 128, 192, 256, 192
        specs = [
            _spec(0, 1),
            _spec(1, 2, prev_flag=0, next_flag=1),
            _spec(1, 3, prev_flag=1, next_flag=0),
            _spec(0, 4),
        ]
        out = V.decode_vorbis(V.encode_vorbis_fixture_stereo(specs))
        assert out["block_sizes"] == [256, 512, 512, 256]
        assert out["n_samples"] == 128 + 192 + 256 + 192 - 128
        # (the first 128-sample half primes the lap; output starts at
        # the first window center: total = 192 + 256 + 192)
        assert out["n_samples"] == 640

    def test_pcm_matches_absolute_timeline_reference(self):
        specs = [
            _spec(0, 1),
            _spec(1, 2, prev_flag=0, next_flag=1),
            _spec(1, 3, prev_flag=1, next_flag=0),
            _spec(0, 4),
            _spec(0, 5),
        ]
        out = V.decode_vorbis(V.encode_vorbis_fixture_stereo(specs))
        ref = ref_decode(specs, 1)
        for ch in range(2):
            assert len(out["pcm"][ch]) == len(ref[ch])
            assert np.allclose(out["pcm"][ch], ref[ch],
                               rtol=1e-9, atol=1e-12), f"channel {ch}"

    def test_all_long_stream(self):
        specs = [_spec(1, d, prev_flag=1, next_flag=1) for d in range(3)]
        out = V.decode_vorbis(V.encode_vorbis_fixture_stereo(specs))
        assert out["n_samples"] == 2 * 256
        ref = ref_decode(specs, 1)
        for ch in range(2):
            assert np.allclose(out["pcm"][ch], ref[ch],
                               rtol=1e-9, atol=1e-12)

    def test_ogg_transport_stereo(self):
        specs = [_spec(0, 1), _spec(1, 2, prev_flag=0, next_flag=0),
                 _spec(0, 3)]
        a = V.decode_vorbis(V.encode_vorbis_fixture_stereo(specs))
        b = V.decode_ogg_vorbis(
            make_ogg(V.encode_vorbis_fixture_stereo(specs))
        )
        assert a["pcm"] == b["pcm"]
        assert max(abs(x) for x in a["pcm"][0]) > 0


class TestMonoContractUnchanged:
    def test_mono_output_shapes(self):
        # the r16 driver row consumes flat mono shapes — pin them
        classes = [1 if p % 3 == 0 else 0 for p in range(16)]
        entries = [([p % 8, (p + 3) % 8] if c else [])
                   for p, c in enumerate(classes)]
        packets = V.encode_vorbis_fixture(
            [{"y0": 20, "y1": 10, "classes": classes,
              "entries": entries}] * 2
        )
        out = V.decode_vorbis(packets)
        assert out["channels"] == 1
        assert isinstance(out["pcm"], list)
        assert out["pcm"] == [] or isinstance(out["pcm"][0], float)
        assert isinstance(out["residues"][0][0], float)
        assert isinstance(out["floor_db"][0][0], int)
        assert isinstance(out["floors"][0][0], int)


class TestLookupType1SequenceP:
    def test_vq_values_closed_form(self):
        """r17 narrows the lookup gates: type-1 (lattice) VQ with
        sequence_p — multiplicand index (entry // lv^j) % lv per
        §3.2.1, each element accumulating the previous (sequence_p).
        Pinned against the closed form computed independently here."""
        w = V.LsbWriter()
        # dim 2, 9 entries -> lookup_values lv = 3
        V.write_codebook(
            w, dim=2, lengths=[4] * 9,
            lookup={"type": 1, "minimum_mant": 2, "delta_mant": 3,
                    "value_bits": 4, "sequence_p": 1,
                    "multiplicands": [0, 5, 11]},
        )
        book = V.read_codebook(V.LsbBits(w.to_bytes()))
        assert book.lookup["lookup_values"] == 3
        mult = [0, 5, 11]
        for e in range(9):
            v0 = 2 + 3 * mult[e % 3]
            v1 = 2 + 3 * mult[(e // 3) % 3] + v0  # sequence_p adds v0
            assert book.vq[e] == [v0, v1], e

    def test_sequence_p_off_matches_independent(self):
        w = V.LsbWriter()
        V.write_codebook(
            w, dim=2, lengths=[4] * 9,
            lookup={"type": 1, "minimum_mant": -1, "delta_mant": 2,
                    "value_bits": 4, "sequence_p": 0,
                    "multiplicands": [1, 4, 9]},
        )
        book = V.read_codebook(V.LsbBits(w.to_bytes()))
        mult = [1, 4, 9]
        for e in range(9):
            assert book.vq[e] == [
                -1 + 2 * mult[e % 3], -1 + 2 * mult[(e // 3) % 3]
            ], e

    def test_lattice_book_decodes_in_residue(self):
        """A type-1 sequence_p book carried as the residue VQ book of a
        mono stream decodes end to end."""
        floor_cfg = V.fixture_floor_cfg(1)
        res_cfg = {
            "begin": 0, "end": 128, "partition_size": 8,
            "classifications": 2, "classbook": 0, "cascade": [0, 1],
            "books": [[-1] * 8, [1] + [-1] * 7],
        }
        books_spec = [
            {"dim": 2, "lengths": [2, 2, 2, 2], "lookup": None},
            # dim 4, 16 entries -> lv = 2; sequence_p on
            {"dim": 4, "lengths": [4] * 16,
             "lookup": {"type": 1, "minimum_mant": 1, "delta_mant": 1,
                        "value_bits": 3, "sequence_p": 1,
                        "multiplicands": [0, 3]}},
            {"dim": 2, "lengths": [5] * 32, "lookup": None},
        ]
        setup = V.write_setup_header_full(
            books_spec, [floor_cfg], [res_cfg],
            [{"submaps": [{"floor": 0, "residue": 0}], "mux": [0],
              "coupling": []}],
            [{"blockflag": 0, "mapping": 0}], nch=1,
        )
        books = V.read_setup_header(setup, 1)["books"]
        w = V.LsbWriter()
        w.write(0, 1)
        V.encode_floor1(w, floor_cfg, books, [10, 20, 0, 0])
        classes = [1] + [0] * 15
        entries = [[5, 10]] + [[]] * 15
        V.encode_residue2_mono(w, res_cfg, books, classes, entries)
        from pyiceberg_lakehouse_spark.operators.ogg import (
            make_vorbis_comment_packet,
        )

        packets = [V.write_id_header(1, 8000, 256),
                   make_vorbis_comment_packet("t", []),
                   setup]
        out = V.decode_vorbis(packets + [w.to_bytes()])

        def lattice(e):
            mult = [0, 3]
            vals = []
            last = 0
            idx = 1
            for _j in range(4):
                v = 1 + mult[(e // idx) % 2] + last
                vals.append(v)
                last = v
                idx *= 2
            return vals

        want = lattice(5) + lattice(10)
        assert out["residues"][0][:8] == [float(x) for x in want]
