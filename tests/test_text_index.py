"""Inverted text index + BM25 (lakehouse/text_index.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.text_index import (
    bm25_topk,
    create_text_index,
    refresh_text_index,
    search_all_terms,
)
from pyiceberg_lakehouse_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _corpus(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    docs = load_table(spark, SF, "documents")
    t = lh.create_table("ns.ti_docs", docs.schema)
    t.append(docs.filter(F.col("doc_id") % 2 == 0))
    return lh, docs, t


def test_incremental_refresh_equals_full_rebuild(spark, warehouse):
    lh, docs, t = _corpus(spark, warehouse)
    idx = create_text_index(lh, t, "ns.ti_idx")
    t.append(docs.filter(F.col("doc_id") % 2 == 1))
    assert refresh_text_index(idx, t)["mode"] == "incremental"
    full = create_text_index(lh, t, "ns.ti_idx_full")
    a, b = idx.scan(), full.scan()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_non_append_history_falls_back_to_rebuild(spark, warehouse):
    lh, docs, t = _corpus(spark, warehouse)
    idx = create_text_index(lh, t, "ns.ti_idx2")
    t.delete_where(F.col("doc_id") % 10 == 0)
    assert refresh_text_index(idx, t)["mode"] == "full"
    # deleted docs' postings are gone
    assert idx.scan().filter(F.col("doc_id") % 10 == 0).count() == 0
    assert refresh_text_index(idx, t)["mode"] == "noop"


def test_and_search_matches_direct_scan(spark, warehouse):
    lh, docs, t = _corpus(spark, warehouse)
    t.append(docs.filter(F.col("doc_id") % 2 == 1))
    idx = create_text_index(lh, t, "ns.ti_idx3")
    got = sorted(r.doc_id for r in search_all_terms(idx, ["table", "join"]).collect())
    direct = docs.filter(
        F.col("text").rlike(r"(^|\s)table(\s|$)")
        & F.col("text").rlike(r"(^|\s)join(\s|$)")
    )
    expect = sorted(r.doc_id for r in direct.select("doc_id").collect())
    assert got == expect


def test_bm25_prefers_higher_tf_and_rarer_terms(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    df = spark.createDataFrame(
        [
            (1, "apple apple apple pear"),
            (2, "apple pear pear pear"),
            (3, "banana banana banana banana"),
            (4, "apple banana pear kiwi"),
        ],
        "doc_id long, text string",
    )
    t = lh.create_table("ns.ti_rank", df.schema)
    t.append(df)
    idx = create_text_index(lh, t, "ns.ti_rank_idx")
    top = bm25_topk(idx, ["apple"], k=4).collect()
    assert top[0].doc_id == 1  # highest tf wins for a single term
    ids = [r.doc_id for r in top]
    assert 3 not in ids  # no 'apple' -> never retrieved
    # rarer term outweighs common one at equal tf
    kiwi = bm25_topk(idx, ["kiwi"], k=1).collect()[0]
    assert kiwi.doc_id == 4


@pytest.mark.slow
def test_streaming_maintenance_converges_and_restart_is_idempotent(
    spark, warehouse, tmp_path
):
    from pyiceberg_lakehouse_spark.streaming.lakehouse_io import (
        write_stream_with_text_index,
    )

    lh = Lakehouse(spark, warehouse)
    docs = load_table(spark, SF, "documents")
    t = lh.create_table("ns.ti_sdocs", docs.schema)
    t.append(docs.filter(F.col("doc_id") % 5 == 0))
    idx = create_text_index(lh, t, "ns.ti_sidx")

    feed = str(tmp_path / "feed")
    docs.filter(F.col("doc_id") % 5 != 0).repartition(3).write.parquet(feed)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    ckpt = str(tmp_path / "ckpt")
    write_stream_with_text_index(stream, t, idx, ckpt).awaitTermination()
    # a RESTART over the same checkpoint replays nothing new
    before = idx.scan().count()
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    write_stream_with_text_index(stream2, t, idx, ckpt).awaitTermination()
    assert idx.scan().count() == before
    # converged index == from-scratch index over the final corpus
    full = create_text_index(lh, t, "ns.ti_sidx_full")
    assert idx.scan().exceptAll(full.scan()).count() == 0
    assert full.scan().exceptAll(idx.scan()).count() == 0
    assert (
        idx.log.properties["textindex.n-docs"]
        == full.log.properties["textindex.n-docs"]
    )
