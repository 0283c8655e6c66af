"""Regression tests for the four r12-advisor (ADVICE.md round 12) findings.

1. (medium) The driver corpora for multimodal_mp4_multitrack /
   multimodal_audio_decode filtered on doc_id % 4 == 1, pinning the
   synthetic audio codec cycle ('ulaw','alaw','sowt','twos')[d % 4] to
   'alaw' — three of the four decode branches were dead in the driver
   check. The filter is now doc_id % 5 == 1 (coprime with the codec
   cycle), so all four fourccs — and all four decoder routes — reach
   the driver-hashed rows.
2. (low) decode_jpeg_lossless's docstring claimed point transforms stay
   gated while the code implements them — the docstring now matches the
   code (substance re-pinned here: Al > 0 roundtrips exactly on the
   kept bits).
3. (low) decode_jpeg_lossless ignored the SOF3 Hi/Vi sampling byte
   (subsampled components walked the full raster and failed late with a
   misleading truncation error) and keyed DHT tables by th only (a
   stray AC-class table with the same id clobbered the DC table). Now:
   Hi/Vi != 1x1 raises NotImplementedError up front, and tables are
   keyed by (tc, th) so an AC-class shadow is inert.
4. (low) refresh_media_samples crash window: a crash between
   idx.append(delta) and the cursor set_properties re-appended the same
   delta on the next refresh, permanently duplicating per-(id, track,
   sample) rows (the sample table has no downstream dedup, unlike the
   neardup index). Appends now record media.covers-snapshot in their
   commit summary and refresh repairs a lagging cursor from it —
   metadata-only, no re-demux, no duplicates.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.media import (
    create_media_sample_table,
    refresh_media_samples,
)
from pyiceberg_lakehouse_spark.operators.jpeg import (
    decode_jpeg_lossless,
    encode_jpeg_lossless,
)
from pyiceberg_lakehouse_spark.operators.multimodal import (
    decode_mp4_audio,
    demux_mp4_multitrack,
)
from pyiceberg_lakehouse_spark.sources.testdata import load_table


# ---------------------------------------------------------------- finding 1


def test_driver_corpus_cycles_all_four_audio_codecs(spark, sf_dir):
    """The registered filter (doc_id % 5 == 1) must surface every codec
    fourcc, i.e. the modulus is coprime with the d % 4 codec cycle."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 1
    )
    fourccs = {
        r["codec"]
        for r in demux_mp4_multitrack(docs)
        .filter(F.col("handler") == "soun")
        .select("codec")
        .distinct()
        .collect()
    }
    assert fourccs == {"ulaw", "alaw", "sowt", "twos"}


def test_audio_decode_driver_corpus_runs_every_branch(spark, sf_dir):
    """decode_mp4_audio over the registered corpus produces rows for all
    four codec residues, so no oracle decode branch is dead."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 1
    )
    residues = {
        r["res"]
        for r in decode_mp4_audio(docs)
        .select((F.col("doc_id") % 4).alias("res"))
        .distinct()
        .collect()
    }
    assert residues == {0, 1, 2, 3}


# ---------------------------------------------------------------- finding 2


def test_lossless_docstring_matches_point_transform_support():
    doc = decode_jpeg_lossless.__doc__ or ""
    assert "point transform" in doc.lower()
    # the stale claim said point transforms "stay gated"
    assert "point transforms (Al > 0) and restart intervals stay gated" not in doc
    # substance: Al > 0 decodes exactly on the kept bits
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    out = decode_jpeg_lossless(
        encode_jpeg_lossless(px, predictor=4, point_transform=2)
    )
    assert np.array_equal(out, (px >> 2) << 2)


# ---------------------------------------------------------------- finding 3


def _patch_sof3_sampling(payload: bytes, sampling: int) -> bytes:
    """Rewrite every SOF3 component's Hi/Vi byte."""
    out = bytearray(payload)
    pos = 2
    while pos + 4 <= len(out):
        marker = out[pos + 1]
        (seglen,) = struct.unpack(">H", bytes(out[pos + 2 : pos + 4]))
        if marker == 0xC3:
            nc = out[pos + 4 + 5]
            for ci in range(nc):
                out[pos + 4 + 6 + ci * 3 + 1] = sampling
            return bytes(out)
        pos += 2 + seglen
        if marker == 0xDA:
            break
    raise AssertionError("no SOF3 found")


def test_subsampled_lossless_component_rejected_up_front():
    px = np.arange(35, dtype=np.uint8).reshape(5, 7)
    payload = _patch_sof3_sampling(encode_jpeg_lossless(px), 0x21)
    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_jpeg_lossless(payload)


def test_stray_ac_class_dht_does_not_clobber_dc_table():
    """Insert an AC-class (tc=1) DHT with the same table id ahead of the
    scan; decode must still be bit-exact (keyed by (tc, th), the AC
    shadow is inert rather than clobbering the DC table)."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(6, 4), dtype=np.uint8)
    payload = encode_jpeg_lossless(px, predictor=7)
    # a legal 1-code AC table: one 1-bit code mapping to symbol 0
    bits = bytes([1] + [0] * 15)
    ac = bytes([0x10]) + bits + bytes([0])
    dht = b"\xff\xc4" + struct.pack(">H", 2 + len(ac)) + ac
    sos_at = payload.index(b"\xff\xda")
    patched = payload[:sos_at] + dht + payload[sos_at:]
    assert np.array_equal(decode_jpeg_lossless(patched), px)


def test_scan_referencing_undefined_dc_table_rejected():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = bytearray(encode_jpeg_lossless(px))
    sos_at = payload.index(b"\xff\xda")
    # component's Td nibble -> table 3 (never defined)
    payload[sos_at + 6] = 0x30
    with pytest.raises(ValueError, match="undefined DC table"):
        decode_jpeg_lossless(bytes(payload))


# ---------------------------------------------------------------- finding 4


def _media_source(spark, tmp_path, n=8):
    lh = Lakehouse(spark, str(tmp_path))
    docs = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .withColumn("title", F.concat(F.lit("doc-"), F.col("doc_id")))
    )
    src = lh.create_table("ns.media_src", docs.schema)
    src.append(docs)
    return lh, src


@pytest.mark.slow
def test_media_refresh_crash_window_does_not_duplicate(spark, tmp_path):
    """Simulate the crash: append the delta WITH its covers summary but
    skip the cursor write; the next refresh must repair the cursor from
    the summary and append nothing."""
    lh, src = _media_source(spark, tmp_path)
    idx = create_media_sample_table(lh, src, "ns.media_idx")
    clean = idx.scan().count()

    delta = (
        spark.range(8, 12)
        .select(F.col("id").alias("doc_id"))
        .withColumn("title", F.concat(F.lit("doc-"), F.col("doc_id")))
    )
    src.append(delta)
    head = src.log.current_snapshot_id()
    cursor = int(idx.log.properties["media.last-snapshot"])

    # the crashed half-refresh: append committed, cursor write lost
    crashed_rows = demux_mp4_multitrack(src.read_incremental(cursor, head))
    idx.append(
        crashed_rows, summary={"media.covers-snapshot": str(head)}
    )
    after_crash = idx.scan().count()
    assert after_crash > clean

    res = refresh_media_samples(idx, src)
    assert res["mode"] == "noop-repair"
    assert res["covered_snapshot"] == head
    assert int(idx.log.properties["media.last-snapshot"]) == head
    assert idx.scan().count() == after_crash  # nothing re-appended

    dupes = (
        idx.scan()
        .groupBy("doc_id", "track_id", "sample_idx")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0


@pytest.mark.slow
def test_media_refresh_repair_then_advance(spark, tmp_path):
    """A repair with MORE source appends pending both fixes the cursor and
    ingests only the genuinely-new delta."""
    lh, src = _media_source(spark, tmp_path)
    idx = create_media_sample_table(lh, src, "ns.media_idx2")

    d1 = (
        spark.range(8, 11)
        .select(F.col("id").alias("doc_id"))
        .withColumn("title", F.concat(F.lit("doc-"), F.col("doc_id")))
    )
    src.append(d1)
    mid = src.log.current_snapshot_id()
    cursor = int(idx.log.properties["media.last-snapshot"])
    idx.append(
        demux_mp4_multitrack(src.read_incremental(cursor, mid)),
        summary={"media.covers-snapshot": str(mid)},
    )
    d2 = (
        spark.range(11, 14)
        .select(F.col("id").alias("doc_id"))
        .withColumn("title", F.concat(F.lit("doc-"), F.col("doc_id")))
    )
    src.append(d2)

    res = refresh_media_samples(idx, src)
    assert res["mode"] == "incremental-repair"
    expected = demux_mp4_multitrack(src.scan()).count()
    assert idx.scan().count() == expected
    dupes = (
        idx.scan()
        .groupBy("doc_id", "track_id", "sample_idx")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0


def test_media_create_cursor_moves_after_initial_append(spark, tmp_path):
    """The create path uses the same ordering: the initial append carries
    its covers summary and the property lands after it."""
    lh, src = _media_source(spark, tmp_path)
    idx = create_media_sample_table(lh, src, "ns.media_idx3")
    head = src.log.current_snapshot_id()
    assert int(idx.log.properties["media.last-snapshot"]) == head
    snaps = idx.log.snapshots
    assert snaps[-1].operation == "append"
    assert snaps[-1].summary["media.covers-snapshot"] == str(head)
