"""Incrementally-maintained near-dup signature index
(lakehouse/neardup.py). The differential query
lh_neardup_index_selfcheck pins planted-duplicate recall against a
closed-form oracle; these tests pin the maintenance semantics: refresh
equals rebuild, delta-only planning, non-append fallback, probe-mode
candidates, and the deterministic hash-family contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.neardup import (
    create_neardup_index,
    neardup_candidates,
    refresh_neardup_index,
)
from pyiceberg_lakehouse_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _corpus(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    docs = load_table(spark, SF, "documents")
    t = lh.create_table("ns.nd_docs", docs.schema)
    t.append(docs.filter(F.col("doc_id") % 2 == 0))
    return lh, docs, t


def _planted(docs):
    from pyiceberg_lakehouse_spark.operators.dedup import plant_exact_duplicates

    return plant_exact_duplicates(docs, modulus=5, residue=3)


def test_incremental_refresh_equals_full_rebuild(spark, warehouse):
    lh, docs, t = _corpus(spark, warehouse)
    idx = create_neardup_index(lh, t, "ns.nd_idx")
    t.append(docs.filter(F.col("doc_id") % 2 == 1))
    assert refresh_neardup_index(idx, t)["mode"] == "incremental"
    full = create_neardup_index(lh, t, "ns.nd_idx_full")
    a, b = idx.scan(), full.scan()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert refresh_neardup_index(idx, t)["mode"] == "noop"


def test_refresh_plans_delta_files_only(spark, warehouse):
    """The refresh must read only the appended files — the 100 TB
    economics. Proven from the source table's file metadata: the delta
    interval plans a strict subset of the table's files."""
    lh, docs, t = _corpus(spark, warehouse)
    idx = create_neardup_index(lh, t, "ns.nd_idx2")
    cursor = int(idx.log.properties["neardup.last-snapshot"])
    t.append(docs.filter(F.col("doc_id") % 2 == 1).limit(50))
    head = t.log.current_snapshot_id()
    delta_rows = t.read_incremental(cursor, head).count()
    total_rows = t.scan().count()
    assert delta_rows == 50 and delta_rows < total_rows
    assert refresh_neardup_index(idx, t)["mode"] == "incremental"


def test_non_append_history_falls_back_to_rebuild(spark, warehouse):
    lh, docs, t = _corpus(spark, warehouse)
    idx = create_neardup_index(lh, t, "ns.nd_idx3")
    t.delete_where(F.col("doc_id") % 10 == 0)
    assert refresh_neardup_index(idx, t)["mode"] == "full"
    assert idx.scan().filter(F.col("doc_id") % 10 == 0).count() == 0


def test_planted_duplicates_all_found_and_nothing_fabricated(spark, warehouse):
    lh, docs, t = _corpus(spark, warehouse)
    idx = create_neardup_index(lh, t, "ns.nd_idx4")
    t.append(docs.filter(F.col("doc_id") % 2 == 1).unionByName(_planted(docs)))
    refresh_neardup_index(idx, t)
    cand = neardup_candidates(idx)
    expect = {
        (r.doc_id, r.doc_id + 1000000)
        for r in docs.filter(F.col("doc_id") % 5 == 3).select("doc_id").collect()
    }
    got = {(r.id_a, r.id_b) for r in cand.collect()}
    # identical normalized text => identical signature => candidate in
    # every band: recall over planted pairs is deterministically 1
    assert expect <= got
    # banding may add near-collisions, but exact text-verification of the
    # extras must reject them: no candidate pair outside the planted set
    # shares normalized text (the corpus has no natural exact dups)
    from pyiceberg_lakehouse_spark.operators.dedup import normalize_text

    corpus = t.scan().select("doc_id", normalize_text(F.col("text")).alias("n"))
    na = corpus.select(F.col("doc_id").alias("id_a"), F.col("n").alias("ta"))
    nb = corpus.select(F.col("doc_id").alias("id_b"), F.col("n").alias("tb"))
    verified = {
        (r.id_a, r.id_b)
        for r in cand.join(na, "id_a").join(nb, "id_b")
        .filter(F.col("ta") == F.col("tb")).collect()
    }
    assert verified == expect


def test_probe_mode_restricts_to_probe_pairs(spark, warehouse):
    lh, docs, t = _corpus(spark, warehouse)
    idx = create_neardup_index(lh, t, "ns.nd_idx5")
    t.append(docs.filter(F.col("doc_id") % 2 == 1).unionByName(_planted(docs)))
    refresh_neardup_index(idx, t)
    probe = (
        docs.filter(F.col("doc_id") % 5 == 3)
        .select((F.col("doc_id") + F.lit(1000000).cast("long")).alias("doc_id"))
    )
    got = neardup_candidates(idx, probe_ids=probe).collect()
    probe_ids = {r.doc_id for r in probe.collect()}
    assert got, "probe batch must surface its duplicates"
    for r in got:
        assert r.id_a in probe_ids or r.id_b in probe_ids
        assert r.id_a < r.id_b


def test_bands_must_divide_hashes(spark, warehouse):
    lh, docs, t = _corpus(spark, warehouse)
    import pytest

    with pytest.raises(ValueError):
        create_neardup_index(lh, t, "ns.nd_bad", num_hashes=32, bands=7)


@pytest.mark.slow
def test_streaming_maintenance_converges_and_restart_is_idempotent(
    spark, warehouse, tmp_path
):
    from pyiceberg_lakehouse_spark.streaming.lakehouse_io import (
        write_stream_with_neardup_index,
    )

    lh = Lakehouse(spark, warehouse)
    docs = load_table(spark, SF, "documents")
    t = lh.create_table("ns.nd_sdocs", docs.schema)
    t.append(docs.filter(F.col("doc_id") % 5 == 0))
    idx = create_neardup_index(lh, t, "ns.nd_sidx")

    feed = str(tmp_path / "feed")
    docs.filter(F.col("doc_id") % 5 != 0).repartition(3).write.parquet(feed)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    ckpt = str(tmp_path / "ckpt")
    write_stream_with_neardup_index(stream, t, idx, ckpt).awaitTermination()
    # a RESTART over the same checkpoint replays nothing new
    before = idx.scan().count()
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    write_stream_with_neardup_index(stream2, t, idx, ckpt).awaitTermination()
    assert idx.scan().count() == before
    # converged index == from-scratch index over the final corpus
    full = create_neardup_index(lh, t, "ns.nd_sidx_full")
    assert idx.scan().exceptAll(full.scan()).count() == 0
    assert full.scan().exceptAll(idx.scan()).count() == 0


def test_probe_mode_plan_semi_joins_before_bucket_join(spark, warehouse):
    """Probe mode must reduce the probe side BEFORE the (band, bh) bucket
    join — a LeftSemi against the batch-sized probe set — and never plan
    a cartesian product: the index side is scanned once, bucket-joined,
    and only batch-adjacent pairs survive."""
    lh, docs, t = _corpus(spark, warehouse)
    idx = create_neardup_index(lh, t, "ns.nd_idx_plan")
    probe = docs.limit(5).select("doc_id")
    df = neardup_candidates(idx, probe_ids=probe)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
