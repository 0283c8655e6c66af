"""Roaring bitmaps (operators/roaring.py), Puffin container and
Iceberg v3 deletion-vector blobs (lakehouse/puffin.py) — the r18
format stack under v3 DV support. All from the public
RoaringFormatSpec / Puffin / Iceberg v3 specs; validation is
round-trip exactness plus structural pins on every format constant
(no roaring/puffin library exists in this sandbox)."""

from __future__ import annotations

import json
import os
import random
import struct
import zlib

import pytest

from pyiceberg_lakehouse_spark.lakehouse import puffin as P
from pyiceberg_lakehouse_spark.operators import roaring as R
from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir


class TestRoaring32:
    @pytest.mark.parametrize("case", [
        [],
        [0], [65535], [65536], [2 ** 32 - 1],
        list(range(100)),
        list(range(0, 2 ** 20, 7)),
        list(range(2 ** 31, 2 ** 31 + 200_000)),
    ])
    def test_roundtrip(self, case):
        blob = R.serialize_roaring32(case)
        back, at = R.deserialize_roaring32(blob)
        assert at == len(blob)
        assert back == sorted(set(case))

    def test_random_mixes_roundtrip(self):
        rng = random.Random(42)
        for _ in range(5):
            vals = rng.sample(range(2 ** 32), 5000) + \
                list(range(10_000, 14_000))
            blob = R.serialize_roaring32(vals)
            back, _ = R.deserialize_roaring32(blob)
            assert back == sorted(set(vals))

    def test_container_type_selection(self):
        # dense run -> run container (cookie 12347)
        blob = R.serialize_roaring32(list(range(100)))
        assert struct.unpack_from("<I", blob, 0)[0] & 0xFFFF == \
            R.SERIAL_COOKIE
        # sparse scatter -> array (no-run cookie 12346)
        blob = R.serialize_roaring32([1, 5, 9])
        assert struct.unpack_from("<I", blob, 0)[0] == \
            R.SERIAL_COOKIE_NO_RUN
        # >4096 alternating values -> bitmap container (8 KiB body)
        vals = list(range(0, 2 * 4100, 2))
        blob = R.serialize_roaring32(vals)
        # no-run cookie + count + 1 descriptor + 1 offset + bitmap
        assert len(blob) == 8 + 4 + 4 + 8192

    def test_corrupt_rejects(self):
        with pytest.raises(ValueError, match="cookie"):
            R.deserialize_roaring32(b"\x00\x00\x00\x00")
        good = R.serialize_roaring32([1, 5, 9])
        with pytest.raises(ValueError):
            R.deserialize_roaring32(good[:-1])

    def test_out_of_range(self):
        with pytest.raises(ValueError, match="u32"):
            R.serialize_roaring32([2 ** 32])


class TestRoaring64:
    def test_bucket_straddle(self):
        vals = list(range(2 ** 32 - 100, 2 ** 32 + 100)) + [0, 2 ** 63]
        back = R.deserialize_roaring64(R.serialize_roaring64(vals))
        assert back == sorted(set(vals))

    def test_layout(self):
        blob = R.serialize_roaring64([1, 2 ** 40])
        # u64 LE bucket count = 2, first bucket key 0
        assert struct.unpack_from("<Q", blob, 0)[0] == 2
        assert struct.unpack_from("<I", blob, 8)[0] == 0

    def test_trailing_bytes_reject(self):
        blob = R.serialize_roaring64([1, 2, 3])
        with pytest.raises(ValueError, match="trailing"):
            R.deserialize_roaring64(blob + b"\x00")


class TestPuffin:
    def test_container_roundtrip(self):
        td = session_tmpdir(prefix="puffin_")
        path = os.path.join(td, "t.puffin")
        metas = P.write_puffin(path, [
            {"type": "x", "data": b"hello", "fields": [1]},
            {"type": "y", "data": b"world!", "snapshot-id": 7},
        ], properties={"created-by": "test"})
        assert metas[0]["offset"] == 4 and metas[0]["length"] == 5
        assert metas[1]["offset"] == 9
        meta = P.read_puffin_footer(path)
        assert [b["type"] for b in meta["blobs"]] == ["x", "y"]
        assert meta["properties"] == {"created-by": "test"}
        assert P.read_puffin_blob(path, 4, 5) == b"hello"
        assert P.read_puffin_blob(path, 9, 6) == b"world!"

    def test_magic_layout(self):
        td = session_tmpdir(prefix="puffin_")
        path = os.path.join(td, "t2.puffin")
        P.write_puffin(path, [{"type": "x", "data": b"ab"}])
        raw = open(path, "rb").read()
        assert raw[:4] == b"PFA1" and raw[-4:] == b"PFA1"
        size, flags = struct.unpack_from("<II", raw, len(raw) - 12)
        assert flags == 0
        payload = raw[len(raw) - 12 - size: len(raw) - 12]
        assert json.loads(payload)["blobs"][0]["length"] == 2
        # footer magic right before the payload
        assert raw[len(raw) - 16 - size: len(raw) - 12 - size] == b"PFA1"

    def test_compressed_footer_gated(self):
        td = session_tmpdir(prefix="puffin_")
        path = os.path.join(td, "t3.puffin")
        P.write_puffin(path, [{"type": "x", "data": b"ab"}])
        raw = bytearray(open(path, "rb").read())
        struct.pack_into("<I", raw, len(raw) - 8, 1)  # set compressed
        open(path, "wb").write(raw)
        with pytest.raises(NotImplementedError, match="LZ4"):
            P.read_puffin_footer(path)


class TestDeletionVectorBlob:
    def test_framing(self):
        pos = [0, 5, 7, 2 ** 33, 2 ** 33 + 1]
        blob = P.encode_deletion_vector(pos)
        (ln,) = struct.unpack_from(">I", blob, 0)
        assert blob[4:8] == bytes([0xD1, 0xD3, 0x39, 0x64])
        body = blob[4: 4 + ln]
        (crc,) = struct.unpack_from(">I", blob, 4 + ln)
        assert crc == zlib.crc32(body) & 0xFFFFFFFF
        assert P.decode_deletion_vector(blob) == sorted(pos)

    def test_corrupt_rejects(self):
        blob = bytearray(P.encode_deletion_vector([1, 2, 3]))
        blob[5] ^= 0xFF
        with pytest.raises(ValueError):
            P.decode_deletion_vector(bytes(blob))
        blob2 = bytearray(P.encode_deletion_vector([1, 2, 3]))
        blob2[-1] ^= 0x01
        with pytest.raises(ValueError, match="CRC"):
            P.decode_deletion_vector(bytes(blob2))
        with pytest.raises(ValueError, match="length"):
            P.decode_deletion_vector(
                P.encode_deletion_vector([1]) + b"x"
            )

    def test_dv_file_roundtrip(self):
        td = session_tmpdir(prefix="puffin_")
        path = os.path.join(td, "dv.puffin")
        entries = P.write_deletion_vector_file(path, [
            {"data_file": "/data/a.parquet",
             "positions": list(range(0, 5000, 3))},
            {"data_file": "/data/b.parquet", "positions": [7]},
        ], snapshot_id=5, sequence_number=4)
        assert entries[0]["records"] == len(range(0, 5000, 3))
        back = P.read_deletion_vectors(path)
        assert back["/data/a.parquet"] == list(range(0, 5000, 3))
        assert back["/data/b.parquet"] == [7]
        # manifest-offset path agrees with the footer path
        got = P.decode_deletion_vector(P.read_puffin_blob(
            path, entries[1]["content_offset"],
            entries[1]["content_size_in_bytes"],
        ))
        assert got == [7]
        # cardinality property recorded
        meta = P.read_puffin_footer(path)
        assert meta["blobs"][1]["properties"]["cardinality"] == "1"
        assert meta["blobs"][0]["snapshot-id"] == 5
