"""Regression tests for the three r11-advisor (ADVICE.md round 11) findings.

1. (low) MP4 box walks: a truncated size==1 box (largesize field cut off
   by the extent) raises the documented ValueError, not struct.error, in
   all three walkers (demux_mp4, probe_mp4, mp4_mdat_start).
2. (low) Index refresh cursors survive an append conflict retry: the
   commit retry resets in-memory properties from disk, so the cursor must
   be persisted via set_properties AFTER the append commits — otherwise a
   concurrent writer on the index table silently reverts the cursor and
   the next refresh re-appends the same delta (and, for the text index,
   double-counts the BM25 corpus stats).
3. (low) plant_exact_duplicates checks its id_offset invariant: a corpus
   whose max id reaches the offset fails loudly instead of corrupting the
   planted-pair oracles.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.neardup import (
    create_neardup_index,
    refresh_neardup_index,
)
from pyiceberg_lakehouse_spark.lakehouse.text_index import (
    create_text_index,
    refresh_text_index,
)
from pyiceberg_lakehouse_spark.operators.multimodal import (
    demux_mp4,
    make_mp4,
    make_mp4_media,
    mp4_mdat_start,
    probe_mp4,
)
from pyiceberg_lakehouse_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"

# a box claiming the 64-bit largesize form with the largesize itself
# truncated: 8 bytes remain, the >Q field needs 8 more
TRUNCATED_LARGESIZE = struct.pack(">I4s", 1, b"free")


def test_truncated_largesize_raises_valueerror_not_struct_error():
    media = make_mp4_media([bytes(20)] * 3, stts_runs=[(3, 10)])
    with pytest.raises(ValueError, match="corrupt MP4 box"):
        demux_mp4(media + TRUNCATED_LARGESIZE)
    with pytest.raises(ValueError, match="corrupt MP4 box"):
        probe_mp4(media + TRUNCATED_LARGESIZE)
    # mdat_start: use the probe-only file (no mdat), so the walk reaches
    # the hostile trailing box instead of returning at mdat
    probe_only = make_mp4(duration_ms=1000, width=64, height=48)
    with pytest.raises(ValueError, match="corrupt MP4 box"):
        mp4_mdat_start(probe_only + TRUNCATED_LARGESIZE)


@pytest.mark.slow
def test_neardup_cursor_survives_append_conflict_retry(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    docs = load_table(spark, SF, "documents")
    src = lh.create_table("ns.adv_nd_docs", docs.schema)
    src.append(docs.filter(F.col("doc_id") % 2 == 0))
    idx = create_neardup_index(lh, src, "ns.adv_nd_idx")

    # a concurrent writer advances the INDEX table's log between this
    # handle's load and its refresh append -> the refresh's append hits
    # the optimistic-conflict retry path, which resets in-memory
    # properties from disk
    other = lh.load_table("ns.adv_nd_idx")
    other.append(
        spark.createDataFrame(
            [(10_000_000, 0, 123456789)], schema=idx.schema()
        )
    )

    src.append(docs.filter(F.col("doc_id") % 2 == 1))
    head = src.log.current_snapshot_id()
    assert refresh_neardup_index(idx, src)["mode"] == "incremental"

    # the cursor must be persisted ON DISK despite the conflict retry
    fresh = lh.load_table("ns.adv_nd_idx")
    assert fresh.log.properties["neardup.last-snapshot"] == str(head)
    # and a second refresh through a fresh handle is a noop, not a
    # duplicate re-append of the same delta
    assert refresh_neardup_index(fresh, src)["mode"] == "noop"


@pytest.mark.slow
def test_text_index_stats_survive_append_conflict_retry(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    docs = load_table(spark, SF, "documents")
    src = lh.create_table("ns.adv_ti_docs", docs.schema)
    src.append(docs.filter(F.col("doc_id") % 2 == 0))
    idx = create_text_index(lh, src, "ns.adv_ti_idx")
    n0 = int(idx.log.properties["textindex.n-docs"])

    other = lh.load_table("ns.adv_ti_idx")
    other.append(idx.scan().limit(1))  # concurrent index-table writer

    src.append(docs.filter(F.col("doc_id") % 2 == 1))
    head = src.log.current_snapshot_id()
    delta_docs = docs.filter(F.col("doc_id") % 2 == 1).count()
    assert refresh_text_index(idx, src)["mode"] == "incremental"

    fresh = lh.load_table("ns.adv_ti_idx")
    assert fresh.log.properties["textindex.last-snapshot"] == str(head)
    # BM25 corpus stats advanced exactly once (no revert, no double count)
    assert int(fresh.log.properties["textindex.n-docs"]) == n0 + delta_docs
    assert refresh_text_index(fresh, src)["mode"] == "noop"


def test_plant_exact_duplicates_rejects_colliding_id_range(spark):
    from pyiceberg_lakehouse_spark.operators.dedup import plant_exact_duplicates

    df = spark.createDataFrame(
        [(2_000_000, "some text"), (3, "other text")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="id_offset"):
        plant_exact_duplicates(df, modulus=5, residue=3)
    # under the offset: fine
    ok = plant_exact_duplicates(
        df.filter(F.col("doc_id") < 100), modulus=1, residue=0
    )
    assert ok.count() == 1
