"""Vorbis floor0 + residue types 0/1 (r18, VERDICT r17 task #3 —
operators/vorbis.py).

Validation posture (the r17 stereo methodology): codebooks are
in-band so fixtures are spec-complete; the floor0 curve pins against
an INDEPENDENT derivation — the spec's product formulas vs direct
|P(e^jw)|^2 + |Q(e^jw)|^2 polynomial evaluation of the LSP
polynomials (two different numerical routes to the same quantity);
residue formats 0 and 1 share a bitstream, so the decoded vectors'
placement difference is the format pin.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.operators import vorbis as V
from pyiceberg_lakehouse_spark.operators.ogg import (
    make_vorbis_comment_packet,
)

LSP_MULT = [(i * 7) % 16 for i in range(32)]
RES_VALS = [(i * 5) % 16 - 4 for i in range(32)]


def _books():
    return [
        {"dim": 2, "lengths": [2, 2, 2, 2], "lookup": None},
        {"dim": 4, "lengths": [3] * 8,
         "lookup": {"type": 2, "minimum_mant": -4, "delta_mant": 1,
                    "value_bits": 4, "sequence_p": 0,
                    "multiplicands": [(i * 5) % 16
                                      for i in range(32)]}},
        {"dim": 2, "lengths": [5] * 32, "lookup": None},
        # LSP book: values 1/16 + mult/8 (dyadic, float-exact)
        {"dim": 2, "lengths": [4] * 16,
         "lookup": {"type": 2, "minimum_mant": 1, "minimum_exp": 784,
                    "delta_mant": 1, "delta_exp": 785,
                    "value_bits": 4, "sequence_p": 0,
                    "multiplicands": LSP_MULT}},
    ]


def _floor0_cfg(order, bark=77, amp_bits=6, amp_off=120):
    return {"ftype": 0, "order": order, "rate": 8000,
            "bark_map_size": bark, "amplitude_bits": amp_bits,
            "amplitude_offset": amp_off, "book_list": [3]}


def _res_cfg(rtype):
    return {"rtype": rtype, "begin": 0, "end": 128,
            "partition_size": 8, "classifications": 2,
            "classbook": 0, "cascade": [0, 1],
            "books": [[-1] * 8, [1] + [-1] * 7]}


def _stream(order, rtype, amp=37, n_pkts=3):
    f0 = _floor0_cfg(order)
    res = _res_cfg(rtype)
    setup = V.write_setup_header_full(
        _books(), [f0], [res],
        [{"submaps": [{"floor": 0, "residue": 0}], "mux": [0],
          "coupling": []}],
        [{"blockflag": 0, "mapping": 0}], nch=1)
    parsed = V.read_setup_header(setup, 1)
    bks = parsed["books"]
    pkts = [V.write_id_header(1, 8000, 256),
            make_vorbis_comment_packet("v", [("A", "b")]), setup]
    lsp_entries = [2, 9, 14][: (order + 1) // 2]
    classes = [1 if p % 3 == 0 else 0 for p in range(16)]
    entries = [[p % 8, (p + 3) % 8] if classes[p] else []
               for p in range(16)]
    for _ in range(n_pkts):
        w = V.LsbWriter()
        w.write(0, 1)
        V.encode_floor0(w, f0, bks, amp, 0, lsp_entries)
        V.encode_residue01_mono(w, res, bks, classes, entries)
        pkts.append(w.to_bytes())
    return pkts, lsp_entries, classes, entries


def _expected_coeffs(lsp_entries, order):
    coeffs, last = [], 0.0
    for e in lsp_entries:
        for j in range(2):
            coeffs.append(1 / 16 + LSP_MULT[e * 2 + j] / 8 + last)
        last = coeffs[-1]
    return coeffs[:order]


class TestFloor0Config:
    def test_header_roundtrip(self):
        f0 = _floor0_cfg(6, bark=128, amp_bits=5, amp_off=200)
        w = V.LsbWriter()
        V.write_floor0_config(w, f0)
        back = V.read_floor0_config(V.LsbBits(w.to_bytes()))
        assert back == f0

    def test_setup_header_carries_types(self):
        pkts, *_ = _stream(4, 0)
        parsed = V.read_setup_header(pkts[2], 1)
        assert parsed["floors"][0]["ftype"] == 0
        assert parsed["residues"][0]["rtype"] == 0

    def test_reserved_types_reject(self):
        w = V.LsbWriter()
        w.write(5, 8)
        for b in b"vorbis":
            w.write(b, 8)
        w.write(0, 8)
        V.write_codebook(w, 2, [2, 2, 2, 2])
        w.write(0, 6)
        w.write(0, 16)
        w.write(0, 6)
        w.write(2, 16)  # floor type 2: reserved
        with pytest.raises(ValueError, match="reserved floor"):
            V.read_setup_header(w.to_bytes(), 1)


class TestFloor0Curve:
    @pytest.mark.parametrize("order", [4, 5, 6, 7])
    def test_product_formula_matches_polynomial_eval(self, order):
        """Spec product formulas vs |P|^2,|Q|^2 from the actual LSP
        polynomial factorization — two independent routes."""
        coeffs = _expected_coeffs([2, 9, 14, 5][: (order + 1) // 2],
                                  order)
        cfg = _floor0_cfg(order)
        amp = 41
        got = np.array(V.floor0_curve(amp, coeffs, cfg, 128))
        mp = np.array(V.floor0_map(8000, 77, 128))
        z = np.exp(-1j * np.pi * mp / 77)
        fac = [1 - 2 * np.cos(t) * z + z ** 2 for t in coeffs]
        if order % 2:
            P = (1 - z ** 2)
            for t in coeffs[1::2]:
                P = P * (1 - 2 * np.cos(t) * z + z ** 2)
            Q = np.ones_like(z)
            for t in coeffs[0::2]:
                Q = Q * (1 - 2 * np.cos(t) * z + z ** 2)
        else:
            P = (1 - z)
            for t in coeffs[1::2]:
                P = P * (1 - 2 * np.cos(t) * z + z ** 2)
            Q = (1 + z)
            for t in coeffs[0::2]:
                Q = Q * (1 - 2 * np.cos(t) * z + z ** 2)
        pq = (np.abs(P) ** 2 + np.abs(Q) ** 2) / 4
        want = np.exp(
            0.11512925 * (amp * 120 / (63 * np.sqrt(pq)) - 120)
        )
        assert np.allclose(got, want, rtol=1e-9)

    def test_map_is_monotone_and_clamped(self):
        mp = V.floor0_map(8000, 77, 128)
        assert mp[0] == 0
        assert all(a <= b for a, b in zip(mp, mp[1:]))
        assert mp[-1] <= 76
        # the step-run optimization means equal map -> equal curve
        coeffs = _expected_coeffs([2, 9], 4)
        cv = V.floor0_curve(10, coeffs, _floor0_cfg(4), 128)
        for i in range(1, 128):
            if mp[i] == mp[i - 1]:
                assert cv[i] == cv[i - 1]

    def test_amplitude_zero_is_unused_channel(self):
        f0 = _floor0_cfg(4)
        w = V.LsbWriter()
        V.encode_floor0(w, f0, [], 0, 0, [])
        amp, cv = V.decode_floor0(
            V.LsbBits(w.to_bytes() + b"\x00"), f0, [], 128
        )
        assert amp is None and cv is None


class TestResidue01:
    def test_format_placement_differs(self):
        """Same bitstream, different scatter: the format pin."""
        outs = {}
        for rtype in (0, 1):
            pkts, _e, classes, entries = _stream(4, rtype, n_pkts=1)
            outs[rtype] = V.decode_vorbis(pkts)["residues"][0]
        rv0, rv1 = np.array(outs[0]), np.array(outs[1])
        assert not np.array_equal(rv0, rv1)
        # partitions hold the same multiset of values
        for p in range(16):
            assert sorted(rv0[p * 8:(p + 1) * 8]) == \
                sorted(rv1[p * 8:(p + 1) * 8])
        # closed-form placement
        classes = [1 if p % 3 == 0 else 0 for p in range(16)]
        for p in range(16):
            off = p * 8
            if not classes[p]:
                assert not rv0[off:off + 8].any()
                continue
            e0, e1 = p % 8, (p + 3) % 8
            # format 1: sequential lay-down
            for k, e in enumerate((e0, e1)):
                for j in range(4):
                    assert rv1[off + k * 4 + j] == RES_VALS[e * 4 + j]
            # format 0: vector i of 2, scatter j*step (step=2)
            for i, e in enumerate((e0, e1)):
                for j in range(4):
                    assert rv0[off + i + j * 2] == RES_VALS[e * 4 + j]

    def test_full_pcm_dual_derivation(self):
        """decode_vorbis PCM vs a numpy matrix pipeline built from the
        closed-form curve and residue."""
        order, rtype, amp = 5, 0, 37
        pkts, lsp_entries, classes, entries = _stream(
            order, rtype, amp=amp, n_pkts=3
        )
        out = V.decode_vorbis(pkts)
        assert out["floors"] == [amp] * 3  # floor0 reports amplitude
        coeffs = _expected_coeffs(lsp_entries, order)
        lin = np.array(V.floor0_curve(amp, coeffs, _floor0_cfg(order),
                                      128))
        rv = np.zeros(128)
        for p in range(16):
            if not classes[p]:
                continue
            for i, e in enumerate(entries[p]):
                for j in range(4):
                    rv[p * 8 + i + j * 2] += RES_VALS[e * 4 + j]
        n, n2 = 256, 128
        spec = lin * rv
        i_ = np.arange(n)
        k_ = np.arange(n2)
        basis = np.cos(2 * np.pi / n * (i_[:, None] + 0.5 + n / 4)
                       * (k_[None, :] + 0.5))
        win = np.sin(np.pi / 2
                     * np.sin(np.pi / n * (i_ + 0.5)) ** 2)
        yw = (basis @ spec) * win
        want = np.concatenate([yw[n2:] + yw[:n2]] * 2)
        got = np.array(out["pcm"])
        assert np.allclose(got, want, atol=1e-9)

    def test_residue0_indivisible_partition_rejects(self):
        res = _res_cfg(0)
        res["partition_size"] = 6  # not divisible by book dim 4
        f0 = _floor0_cfg(4)
        setup = V.write_setup_header_full(
            _books(), [f0], [res],
            [{"submaps": [{"floor": 0, "residue": 0}], "mux": [0],
              "coupling": []}],
            [{"blockflag": 0, "mapping": 0}], nch=1)
        parsed = V.read_setup_header(setup, 1)
        bks = parsed["books"]
        w = V.LsbWriter()
        w.write(0, 1)
        V.encode_floor0(w, f0, bks, 7, 0, [2, 9])
        # hand-roll one classword + one VQ codeword
        bks[0].encode_scalar(w, 3)  # classes (1,1)
        bks[1].encode_scalar(w, 0)
        pkts = [V.write_id_header(1, 8000, 256),
                make_vorbis_comment_packet("v", []), setup,
                w.to_bytes()]
        with pytest.raises(ValueError, match="divisible"):
            V.decode_vorbis(pkts)
