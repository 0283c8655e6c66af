"""Iceberg partition transforms, single-value serde and the
metadata-time prune calculus (lakehouse/iceberg_transforms.py).

The murmur3 implementation is pinned against BOTH the widely
published MurmurHash3 x86-32 vectors and the Apache Iceberg table
spec's Appendix B hash-requirement vectors — the pair proves the
algorithm AND the spec's value-serialization rule (ints hash as
8-byte longs) simultaneously, so bucket values agree with real
Iceberg writers.
"""

from __future__ import annotations

import struct

import pytest

from pyiceberg_lakehouse_spark.lakehouse.iceberg_transforms import (
    apply_transform,
    bounds_may_match,
    bucket_hash,
    deserialize_single_value,
    murmur3_32,
    parse_transform,
    partition_may_match,
    serialize_single_value,
)


class TestMurmur3:
    def test_public_vectors(self):
        # canonical murmur3_x86_32 test vectors (public domain algo)
        assert murmur3_32(b"") == 0
        assert murmur3_32(b"hello") & 0xFFFFFFFF == 0x248BFA47
        assert (
            murmur3_32(
                b"The quick brown fox jumps over the lazy dog",
                0x9747B28C,
            )
            & 0xFFFFFFFF
            == 0x2FA826CD
        )

    def test_iceberg_appendix_b_vectors(self):
        # Apache Iceberg spec Appendix B "32-bit Hash Requirements"
        assert bucket_hash(34, "int") == 2017239379
        assert bucket_hash(34, "long") == 2017239379
        assert bucket_hash("iceberg", "string") == 1210000089
        # date 2017-11-16 = 17486 days from epoch
        assert bucket_hash(17486, "date") == -653330422

    def test_int_long_bucket_agree(self):
        for v in (0, 1, -1, 34, 10**12, -(10**12)):
            for n in (2, 16, 101):
                assert apply_transform(f"bucket[{n}]", v, "int" if -(2**31) <= v < 2**31 else "long") == apply_transform(
                    f"bucket[{n}]", v, "long"
                )

    def test_signed_range(self):
        for data in (b"", b"a", b"ab", b"abc", b"abcd", b"abcde"):
            h = murmur3_32(data)
            assert -(2**31) <= h < 2**31


class TestSingleValue:
    @pytest.mark.parametrize(
        "value,ice_type",
        [
            (True, "boolean"),
            (False, "boolean"),
            (42, "int"),
            (-7, "int"),
            (17486, "date"),
            (2**40, "long"),
            (-(2**40), "long"),
            (1.5, "float"),
            (3.14159, "double"),
            ("héllo", "string"),
            (b"\x00\xff", "binary"),
        ],
    )
    def test_roundtrip(self, value, ice_type):
        blob = serialize_single_value(value, ice_type)
        back = deserialize_single_value(blob, ice_type)
        if ice_type == "float":
            assert back == struct.unpack("<f", struct.pack("<f", value))[0]
        else:
            assert back == value

    def test_little_endian_layout(self):
        assert serialize_single_value(1, "int") == b"\x01\x00\x00\x00"
        assert serialize_single_value(1, "long") == b"\x01" + b"\x00" * 7
        assert serialize_single_value("abc", "string") == b"abc"

    def test_null_bound_raises(self):
        with pytest.raises(ValueError):
            serialize_single_value(None, "int")


class TestTransforms:
    def test_parse(self):
        assert parse_transform("identity") == ("identity", None)
        assert parse_transform("bucket[16]") == ("bucket", 16)
        assert parse_transform("truncate[4]") == ("truncate", 4)
        assert parse_transform("Day") == ("day", None)

    def test_truncate_int_floor_mod(self):
        # spec: truncate is floor-based, so negatives round DOWN
        assert apply_transform("truncate[10]", 17, "int") == 10
        assert apply_transform("truncate[10]", -3, "int") == -10
        assert apply_transform("truncate[10]", -10, "int") == -10
        assert apply_transform("truncate[3]", "iceberg", "string") == "ice"

    def test_temporal(self):
        # 2017-11-16 = day 17486
        assert apply_transform("day", 17486, "date") == 17486
        assert apply_transform("year", 17486, "date") == 47
        assert apply_transform("month", 17486, "date") == 47 * 12 + 10
        us = 17486 * 86_400_000_000 + 3 * 3_600_000_000
        assert apply_transform("hour", us, "timestamp") == 17486 * 24 + 3
        assert apply_transform("day", us, "timestamp") == 17486
        assert apply_transform("year", us, "timestamp") == 47

    def test_null_passes_through(self):
        assert apply_transform("bucket[16]", None, "int") is None
        assert apply_transform("identity", None, "string") is None

    def test_void(self):
        assert apply_transform("void", 123, "int") is None


class TestPruneCalculus:
    def test_identity(self):
        assert partition_may_match("identity", 5, "=", 5, "int")
        assert not partition_may_match("identity", 5, "=", 6, "int")
        assert partition_may_match("identity", 5, "<", 6, "int")
        assert not partition_may_match("identity", 5, "<", 5, "int")
        assert partition_may_match("identity", 5, "in", [1, 5], "int")

    def test_bucket_equality_only(self):
        b = apply_transform("bucket[16]", 34, "int")
        assert partition_may_match("bucket[16]", b, "=", 34, "int")
        other = (b + 1) % 16
        assert not partition_may_match("bucket[16]", other, "=", 34, "int")
        # ranges cannot be served by a hash — must conservatively keep
        assert partition_may_match("bucket[16]", other, "<", 34, "int")

    def test_truncate_interval_arithmetic(self):
        # partition 10 with width 10 holds rows 10..19
        assert partition_may_match("truncate[10]", 10, "=", 15, "int")
        assert not partition_may_match("truncate[10]", 10, "=", 20, "int")
        assert partition_may_match("truncate[10]", 10, ">", 15, "int")
        assert not partition_may_match("truncate[10]", 10, ">", 19, "int")
        assert partition_may_match("truncate[10]", 10, ">=", 19, "int")
        assert not partition_may_match("truncate[10]", 10, "<", 10, "int")
        assert partition_may_match("truncate[10]", 10, "<=", 10, "int")

    def test_truncate_string(self):
        assert partition_may_match("truncate[3]", "ice", "=", "iceberg", "string")
        assert not partition_may_match("truncate[3]", "fir", "=", "iceberg", "string")
        assert partition_may_match("truncate[3]", "fir", "<", "iceberg", "string")

    def test_temporal_boundary_conservative(self):
        # day partition 17486; predicate ts < start-of-that-day must
        # KEEP the file (conservative at the boundary)
        us = 17486 * 86_400_000_000
        assert partition_may_match("day", 17486, "<", us, "timestamp")
        assert not partition_may_match("day", 17487, "<", us, "timestamp")
        assert partition_may_match("day", 17486, ">=", us, "timestamp")

    def test_null_partition_keeps(self):
        assert partition_may_match("bucket[4]", None, "=", 1, "int")

    def test_bounds(self):
        assert bounds_may_match(10, 20, "=", 15)
        assert not bounds_may_match(10, 20, "=", 21)
        assert not bounds_may_match(10, 20, ">", 20)
        assert bounds_may_match(10, 20, ">", 19)
        assert bounds_may_match(10, 20, ">=", 20)
        assert not bounds_may_match(10, 20, "<", 10)
        assert bounds_may_match(10, 20, "<=", 10)
        assert bounds_may_match(None, None, "=", 999)
        assert bounds_may_match(10, None, ">", 10**9)
        assert not bounds_may_match(10, 20, "in", [5, 25])
        assert bounds_may_match(10, 20, "in", [5, 15])

    def test_bad_op_raises(self):
        with pytest.raises(ValueError):
            partition_may_match("identity", 1, "!=", 1, "int")
        with pytest.raises(ValueError):
            bounds_may_match(1, 2, "!=", 1)


class TestStructuralRejection18:
    """r18 ADVICE pins: corrupt manifest bytes reject structurally."""

    def test_boolean_rejects_wrong_length(self):
        # Appendix D: exactly one byte. b'' and multi-byte blobs are
        # corrupt bounds, not truthy values.
        for bad in (b"", b"\x00\x00", b"\x01\x00", b"abc"):
            with pytest.raises(ValueError, match="boolean"):
                deserialize_single_value(bad, "boolean")
        assert deserialize_single_value(b"\x00", "boolean") is False
        assert deserialize_single_value(b"\x01", "boolean") is True
        # any nonzero byte is true (spec stores 0x00/0x01; read leniently)
        assert deserialize_single_value(b"\xff", "boolean") is True
