"""Fuzz pin across every binary parser: random bytes (and truncated
valid files) must be REJECTED with structured errors (ValueError /
NotImplementedError / KeyError-free crashes), never an uncontrolled
exception — a 100 TB crawl feeds every parser garbage eventually, and
an AttributeError deep in a codec kills the executor task where a
ValueError routes to the quarantine path."""

from hypothesis import given, settings
from hypothesis import strategies as st

_CLEAN = (ValueError, NotImplementedError, EOFError)


def _parsers():
    from pyiceberg_lakehouse_spark.operators import (
        archives,
        ebml,
        flac,
        multimodal,
        ogg,
        pdf,
        tiff,
        warc,
    )

    return [
        ("tiff", tiff.decode_tiff),
        ("flac", flac.decode_flac),
        ("pdf", pdf.extract_pdf_text),
        ("ebml", ebml.probe_matroska),
        ("ogg", ogg.parse_ogg),
        ("ogg_group", ogg.parse_ogg_group),
        ("warc", warc.parse_warc),
        ("http", warc.parse_http_response),
        ("zip", archives.parse_zip),
        ("tar", archives.parse_tar),
        ("png", multimodal.decode_png),
        ("itunes", multimodal.parse_mp4_itunes),
        ("id3", multimodal.parse_id3v2),
    ]


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_random_bytes_rejected_cleanly(data):
    for name, fn in _parsers():
        try:
            fn(data)
        except _CLEAN:
            pass
        except Exception as exc:  # noqa: BLE001 — the assertion itself
            raise AssertionError(
                f"{name} raised {type(exc).__name__} on garbage: {exc}"
            ) from exc


@settings(max_examples=30, deadline=None)
@given(cut=st.integers(min_value=1, max_value=10_000))
def test_truncated_valid_files_rejected_cleanly(cut):
    """Truncation anywhere in a VALID file of each format must reject
    cleanly too (truncated network fetches are crawl reality)."""
    import numpy as np

    from pyiceberg_lakehouse_spark.operators import (
        ebml,
        flac,
        multimodal,
        tiff,
    )

    samples = [
        (
            "tiff",
            tiff.decode_tiff,
            tiff.encode_tiff(
                np.arange(64, dtype=np.uint8).reshape(8, 8),
                compression=5,
            ),
        ),
        (
            "flac",
            flac.decode_flac,
            flac.encode_flac([[(t * 37) % 500 - 250 for t in range(96)]]),
        ),
        (
            "ebml",
            ebml.probe_matroska,
            ebml.make_matroska(
                tracks=[
                    {
                        "number": 1, "type": "video",
                        "codec_id": "V_VP9", "width": 64, "height": 48,
                    }
                ]
            ),
        ),
        (
            "itunes",
            multimodal.parse_mp4_itunes,
            multimodal.make_mp4_itunes({"title": "x"}, track=(1, 2)),
        ),
    ]
    for name, fn, blob in samples:
        at = cut % len(blob)
        if at == 0:
            continue
        try:
            fn(blob[:at])
        except _CLEAN:
            pass
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(
                f"{name} raised {type(exc).__name__} on truncation at "
                f"{at}/{len(blob)}: {exc}"
            ) from exc
