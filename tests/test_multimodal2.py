

# ----------------------------------------------------------- AVIF/HEIF --


class TestAvifProbe:
    def _items(self):
        import numpy as np  # noqa: F401

        return [
            {"id": 1, "type": b"av01", "width": 320, "height": 200,
             "data": b"\x12\x00obu", "primary": True},
            {"id": 2, "type": b"Exif", "width": 0, "height": 0,
             "data": b"Exif\x00\x00II*\x00"},
        ]

    def test_roundtrip(self):
        from pyiceberg_lakehouse_spark.operators.multimodal import (
            make_avif,
            probe_avif,
        )

        r = probe_avif(make_avif(self._items()))
        assert r["brand"] == "avif" and r["primary_item"] == 1
        assert r["items"][0]["type"] == "av01"
        assert (r["items"][0]["width"], r["items"][0]["height"]) == (320, 200)
        assert r["items"][0]["size"] == len(b"\x12\x00obu")
        assert r["items"][1]["type"] == "Exif"
        assert r["items"][1]["is_primary"] is False

    def test_heic_brand_and_hostile(self):
        import pytest as _pt

        from pyiceberg_lakehouse_spark.operators.multimodal import (
            make_avif,
            probe_avif,
        )

        blob = make_avif(self._items(), brand=b"heic")
        assert probe_avif(blob)["brand"] == "heic"
        with _pt.raises(ValueError, match="ftyp"):
            probe_avif(b"\x00\x00\x00\x08free" + blob)
        with _pt.raises(ValueError, match="brand"):
            probe_avif(blob.replace(b"heic", b"mp42", 1))
        # corrupt an iloc extent length so it points outside the file
        cut = blob[: len(blob) - 6]
        with _pt.raises(ValueError):
            probe_avif(cut)
