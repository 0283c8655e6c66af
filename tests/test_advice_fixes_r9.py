"""Regression tests for the five r8-advisor (ADVICE.md round 9) findings.

1. tmpdirs stale sweep never age-deletes a live-pid root
   -> tests/test_tmpdirs.py::test_live_pid_root_never_age_swept
2. log.py v1->v2 migration: values decoded only when re-encoding with
   Spark's path-escape charset round-trips (no double-decode of
   already-decoded user data)
3. multimodal decode_stub / decode_image_codec: non-baseline JPEG falls
   through to Pillow when importable instead of raising
4. traindata.numeric_profile: below-range values get sentinel bucket -2,
   never conflated with the NULL bucket -1
5. similarity.resolve_rerank_factor / resolve_n_probe: below-table
   recall targets resolve to the cheapest anchor, never StopIteration
"""

import io

import numpy as np
import pytest

from pyiceberg_lakehouse_spark.lakehouse.log import _v1_safe_unquote
from pyiceberg_lakehouse_spark.operators import multimodal
from pyiceberg_lakehouse_spark.operators.similarity import (
    resolve_n_probe,
    resolve_rerank_factor,
)


# ------------------------------------------------------------------ #2 --


def test_v1_unquote_decodes_exact_encoder_images():
    # genuine v1-encoded values (Spark escapes /, =, %) decode once
    assert _v1_safe_unquote("a%2Fb") == "a/b"
    assert _v1_safe_unquote("x%3Dy") == "x=y"
    assert _v1_safe_unquote("50%25") == "50%"


def test_v1_unquote_leaves_plain_values_alone():
    assert _v1_safe_unquote("2024-01") == "2024-01"
    assert _v1_safe_unquote("hello world") == "hello world"  # space unescaped


def test_v1_unquote_skips_non_encoder_images():
    # already-decoded user data containing literal %XX that is NOT an
    # exact image of the Spark path encoder: space is never escaped by
    # Spark, so "100%20off" cannot be v1 output -> must pass through
    assert _v1_safe_unquote("100%20off") == "100%20off"
    # bare % would have been stored as %25 by the v1 writer
    assert _v1_safe_unquote("a%zz") == "a%zz"


# ------------------------------------------------------------------ #3 --


class _FakePILImage:
    """Minimal stand-in for PIL.Image: open().convert().tobytes()."""

    marker = b"pil-decoded"

    @staticmethod
    def open(buf):
        return _FakePILImage()

    def convert(self, mode):
        return self

    def tobytes(self):
        return self.marker

    width, height, mode = 7, 5, "RGB"


def _lossless_jpeg() -> bytes:
    # SOI + SOF3 (lossless sequential) header: a frame type the native
    # paths genuinely do not support (progressive SOF2 decodes natively
    # since round 9, so it no longer exercises the fallthrough)
    return bytes.fromhex("ffd8ffc3000b08000500070300110001ffd9")


def test_jpeg_falls_through_to_pillow_when_present(monkeypatch):
    monkeypatch.setattr(multimodal, "HAS_PIL", True)
    monkeypatch.setattr(multimodal, "_PILImage", _FakePILImage, raising=False)
    out = multimodal.decode_stub(_lossless_jpeg(), "image/jpeg")
    assert out == _FakePILImage.marker
    w, h, mode = multimodal.decode_image_codec(_lossless_jpeg())
    assert (w, h, mode) == (7, 5, "RGB")


def test_jpeg_raises_honestly_without_pillow(monkeypatch):
    monkeypatch.setattr(multimodal, "HAS_PIL", False)
    # the fixture's SOF3 declares 3 components but carries 1 — the r12
    # native lossless decoder rejects it as malformed, and with no
    # Pillow to fall through to, the full decode raises
    with pytest.raises((NotImplementedError, ValueError)):
        multimodal.decode_stub(_lossless_jpeg(), "image/jpeg")
    # the HEADER probe, by contrast, no longer needs Pillow at all:
    # jpeg_header reads SOF3 frame dims natively since r12
    assert multimodal.decode_image_codec(_lossless_jpeg()) == (7, 5, "RGB")


def test_progressive_jpeg_decodes_natively_no_pillow_needed(monkeypatch):
    import numpy as np

    from pyiceberg_lakehouse_spark.operators.jpeg_progressive import (
        encode_progressive,
    )

    monkeypatch.setattr(multimodal, "HAS_PIL", False)
    px = np.full((8, 8), 90, dtype=np.uint8)
    out = multimodal.decode_stub(encode_progressive(px), "image/jpeg")
    assert len(out) == 8 * 8 * 3
    w, h, mode = multimodal.decode_image_codec(encode_progressive(px))
    assert (w, h, mode) == (8, 8, "L")


def test_baseline_jpeg_still_native_even_with_pillow(monkeypatch):
    # native-first dispatch: a baseline JPEG must NOT touch Pillow
    from pyiceberg_lakehouse_spark.operators import jpeg

    monkeypatch.setattr(multimodal, "HAS_PIL", True)
    monkeypatch.setattr(multimodal, "_PILImage", None, raising=False)  # would crash
    px = np.full((8, 8), 128, dtype=np.uint8)
    payload = jpeg.encode_jpeg(px)
    out = multimodal.decode_stub(payload, "image/jpeg")
    assert len(out) == 8 * 8 * 3  # decoded natively to RGB bytes


# ------------------------------------------------------------------ #4 --


def test_numeric_profile_below_range_sentinel(spark):
    from pyiceberg_lakehouse_spark.operators.traindata import numeric_profile

    df = spark.createDataFrame(
        [(float(v),) for v in (-5.0, -0.1, 0.0, 5.0, 9.9, 10.0, 15.0)]
        + [(None,)],
        "x double",
    )
    prof = numeric_profile(df, "x", n_buckets=10, lo=0.0, hi=10.0)
    counts = {r["bucket"]: r["n"] for r in prof.collect()}
    assert counts[-1] == 1  # the NULL row only
    assert counts[-2] == 2  # -5.0 and -0.1 — below range, NOT in -1
    assert counts[10] == 1  # 15.0 above range
    assert counts[0] == 1  # 0.0
    assert counts[9] == 2  # 9.9 and hi==10.0 (hi lands in last real bucket)
    assert counts[5] == 1  # 5.0
    assert sum(counts.values()) == 8


# ------------------------------------------------------------------ #5 --


def test_recall_dials_never_raise_on_below_table_targets():
    # caller bug: negative target -> cheapest anchor, not StopIteration
    assert resolve_rerank_factor(None, -1.0) == 8
    assert resolve_n_probe(633, None, recall_target=-1.0) >= 4
    # NaN compares False against every threshold -> same guard path
    assert resolve_rerank_factor(None, float("nan")) == 8
    assert resolve_n_probe(633, None, recall_target=float("nan")) >= 4
    # in-range targets unchanged
    assert resolve_rerank_factor(None, 0.99) == 32
    assert resolve_rerank_factor(None, 0.5) == 8
