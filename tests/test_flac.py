"""FLAC codec pins: bit-level primitives, roundtrips, CRCs, gates."""

import pytest

from pyiceberg_lakehouse_spark.operators.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _read_utf8_number,
    _unzigzag,
    _utf8_number,
    _zigzag,
    decode_flac,
    encode_flac,
)


def _sig(d, n, c, a, b, scale=1):
    return [
        scale * (c if t < 64 else ((d * a + b * t) % 2048) - 1024)
        for t in range(n)
    ]


class TestPrimitives:
    def test_crc8_known_vector(self):
        # CRC-8/ATM ("123456789" -> 0xF4 for poly 0x07, init 0)
        assert _crc8(b"123456789") == 0xF4

    def test_crc16_known_vector(self):
        # CRC-16/BUYPASS (poly 0x8005, init 0, no reflection) -> 0xFEE8
        assert _crc16(b"123456789") == 0xFEE8

    def test_zigzag_roundtrip(self):
        for v in (0, 1, -1, 2, -2, 1000, -1000, 131071, -131072):
            assert _unzigzag(_zigzag(v)) == v

    def test_utf8_number_roundtrip(self):
        for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
                  0x1FFFFF, 0x3FFFFFF):
            w = _BitWriter()
            _utf8_number(w, n)
            assert _read_utf8_number(_BitReader(w.bytes())) == n

    def test_bit_io_signed(self):
        w = _BitWriter()
        w.write_signed(-5, 17)
        w.write_signed(300, 12)
        w.align()
        r = _BitReader(w.bytes())
        assert r.read_signed(17) == -5
        assert r.read_signed(12) == 300


class TestRoundtrip:
    @pytest.mark.parametrize("mode", [
        "independent", "left_side", "right_side", "mid_side",
    ])
    def test_stereo_modes(self, mode):
        ch = [_sig(9, 128, 40, 7, 3), _sig(9, 128, -25, 5, 11)]
        got, meta = decode_flac(encode_flac(ch, stereo_mode=mode))
        assert got == ch and meta["md5_match"]
        assert meta["stereo_modes"] == [mode]

    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_fixed_orders(self, order):
        ch = [_sig(3, 96, 10, 7, 3)]
        got, meta = decode_flac(
            encode_flac(ch, subframe="fixed", fixed_order=order)
        )
        assert got == ch and meta["md5_match"]
        assert f"fixed{order}" in meta["subframe_types"]

    def test_lpc(self):
        ch = [_sig(4, 96, 10, 7, 3)]
        got, meta = decode_flac(
            encode_flac(ch, subframe="lpc", lpc_coeffs=[3, -2],
                        lpc_shift=1)
        )
        assert got == ch and "lpc2" in meta["subframe_types"]

    def test_constant_falls_back_on_varying_frames(self):
        ch = [_sig(5, 128, 77, 7, 3)]
        got, meta = decode_flac(encode_flac(ch, subframe="constant"))
        assert got == ch
        assert meta["subframe_types"] == ["constant", "verbatim"]

    def test_verbatim(self):
        ch = [_sig(6, 96, 1, 7, 3)]
        got, meta = decode_flac(encode_flac(ch, subframe="verbatim"))
        assert got == ch and meta["subframe_types"] == ["verbatim"]

    def test_wasted_bits(self):
        ch = [[2 * s for s in _sig(7, 96, 9, 7, 3)]]
        got, meta = decode_flac(encode_flac(ch))
        assert got == ch and meta["md5_match"]

    def test_rice_partitions_and_escape(self):
        ch = [_sig(8, 128, 3, 7, 3)]
        for po in (0, 1, 2):
            got, _ = decode_flac(encode_flac(ch, part_order=po))
            assert got == ch
        got, _ = decode_flac(encode_flac(ch, escape_rawbits=18))
        assert got == ch

    def test_tags_and_meta(self):
        ch = [_sig(2, 96, 5, 7, 3)]
        _, meta = decode_flac(
            encode_flac(ch, sample_rate=22050, tags={"TITLE": "doc 2"})
        )
        assert meta["tags"] == {"title": "doc 2"}
        assert meta["sample_rate"] == 22050
        assert meta["total_samples"] == 96
        assert meta["n_frames"] == 2

    def test_8_and_24_bit(self):
        ch8 = [[(t % 200) - 100 for t in range(96)]]
        got, meta = decode_flac(encode_flac(ch8, bits=8))
        assert got == ch8 and meta["bits"] == 8 and meta["md5_match"]
        ch24 = [[((t * 99991) % 100000) - 50000 for t in range(96)]]
        got, meta = decode_flac(
            encode_flac(ch24, bits=24, rice_param=12)
        )
        assert got == ch24 and meta["bits"] == 24 and meta["md5_match"]

    def test_short_tail_frame_verbatim_fallback(self):
        ch = [_sig(1, 66, 4, 7, 3)]  # tail frame of 2 < fixed order 4
        got, meta = decode_flac(
            encode_flac(ch, subframe="fixed", fixed_order=4)
        )
        assert got == ch and "verbatim" in meta["subframe_types"]


class TestHostile:
    def test_not_flac(self):
        with pytest.raises(ValueError, match="fLaC"):
            decode_flac(b"RIFFjunk")

    def test_frame_crc_detects_corruption(self):
        blob = bytearray(encode_flac([_sig(3, 96, 10, 7, 3)]))
        # flip a bit in the last frame's payload (before its CRC-16)
        blob[-5] ^= 0x10
        with pytest.raises(ValueError, match="CRC"):
            decode_flac(bytes(blob))

    def test_truncated(self):
        blob = encode_flac([_sig(3, 96, 10, 7, 3)])
        with pytest.raises(ValueError):
            decode_flac(blob[: len(blob) // 2])

    def test_rice_method_1_gated(self):
        from pyiceberg_lakehouse_spark.operators.flac import (
            _read_rice_partitioned,
        )

        w = _BitWriter()
        w.write(1, 2)  # method 1
        w.write(0, 4)
        w.align()
        with pytest.raises(NotImplementedError, match="method 1"):
            _read_rice_partitioned(_BitReader(w.bytes()), 16, 0)
