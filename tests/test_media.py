"""Incrementally-maintained media sample table (lakehouse/media.py). The
differential queries pin the demux values (multimodal_mp4_multitrack
ad-hoc, stream_lh_media_demux streamed — same oracle template); these
tests pin the maintenance semantics: refresh equals rebuild, delta-only
planning, non-append fallback, and exactly-once streaming restart."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.media import (
    create_media_sample_table,
    refresh_media_samples,
)
from pyiceberg_lakehouse_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select("doc_id")
    )


def test_incremental_refresh_equals_full_rebuild(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    docs = _docs(spark)
    t = lh.create_table("ns.med_docs", docs.schema)
    t.append(docs.filter(F.col("doc_id") % 2 == 0))
    idx = create_media_sample_table(lh, t, "ns.med_idx")
    t.append(docs.filter(F.col("doc_id") % 2 == 1))
    assert refresh_media_samples(idx, t)["mode"] == "incremental"
    full = create_media_sample_table(lh, t, "ns.med_idx_full")
    assert idx.scan().exceptAll(full.scan()).count() == 0
    assert full.scan().exceptAll(idx.scan()).count() == 0
    assert refresh_media_samples(idx, t)["mode"] == "noop"


def test_refresh_plans_delta_files_only(spark, warehouse):
    """The refresh must demux only the appended files — the 100 TB
    economics, proven from the source table's snapshot metadata."""
    lh = Lakehouse(spark, warehouse)
    docs = _docs(spark)
    t = lh.create_table("ns.med_docs2", docs.schema)
    t.append(docs.filter(F.col("doc_id") % 2 == 0))
    idx = create_media_sample_table(lh, t, "ns.med_idx2")
    cursor = int(idx.log.properties["media.last-snapshot"])
    t.append(docs.filter(F.col("doc_id") % 2 == 1).limit(20))
    head = t.log.current_snapshot_id()
    assert t.read_incremental(cursor, head).count() == 20
    assert refresh_media_samples(idx, t)["mode"] == "incremental"


def test_non_append_history_falls_back_to_rebuild(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    docs = _docs(spark)
    t = lh.create_table("ns.med_docs3", docs.schema)
    t.append(docs)
    idx = create_media_sample_table(lh, t, "ns.med_idx3")
    t.delete_where(F.col("doc_id") % 10 == 7)
    assert refresh_media_samples(idx, t)["mode"] == "full"
    assert idx.scan().filter(F.col("doc_id") % 10 == 7).count() == 0


@pytest.mark.slow
def test_streaming_maintenance_converges_and_restart_is_idempotent(
    spark, warehouse, tmp_path
):
    from pyiceberg_lakehouse_spark.streaming.lakehouse_io import (
        write_stream_with_media_samples,
    )

    lh = Lakehouse(spark, warehouse)
    docs = _docs(spark)
    t = lh.create_table("ns.med_sdocs", docs.schema)
    t.append(docs.filter(F.col("doc_id") % 5 == 0))
    idx = create_media_sample_table(lh, t, "ns.med_sidx")

    feed = str(tmp_path / "feed")
    docs.filter(F.col("doc_id") % 5 != 0).repartition(3).write.parquet(feed)

    def run_stream():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        write_stream_with_media_samples(
            stream, t, idx, str(tmp_path / "ckpt")
        ).awaitTermination()

    run_stream()
    before = idx.scan().count()
    run_stream()  # restart over the same checkpoint replays nothing new
    assert idx.scan().count() == before
    # converged sample table == from-scratch demux over the final corpus
    full = create_media_sample_table(lh, t, "ns.med_sidx_full")
    assert idx.scan().exceptAll(full.scan()).count() == 0
    assert full.scan().exceptAll(idx.scan()).count() == 0
