"""Regression tests for the round-6 advisor findings (ADVICE.md r6).

1. ``refresh_ann_indexes`` must apply merge-on-read equality deletes when
   reading stale files: the rewritten files' ``added_in`` postdates every
   delete snapshot, so without the anti-join deleted rows would
   permanently resurrect (build index -> append -> delete appended key ->
   refresh).
2. ``_write_data`` NULL-fills ONLY evolution-added columns; a missing
   ORIGINAL column (misspelled / accidentally dropped) raises instead of
   silently landing an all-NULL column.
3. ``write_stream_to_indexed_table`` on a table with no ANN index fails
   fast BEFORE any batch commits — otherwise the first append lands, the
   refresh raises, and on restart the committed batch id wedges the
   stream permanently half-ingested.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.maintenance import (
    build_ivf_index,
    build_pq_index,
    refresh_ann_indexes,
)
from pyiceberg_lakehouse_spark.operators import similarity
from pyiceberg_lakehouse_spark.sources.testdata import load_table


@pytest.mark.slow
def test_refresh_applies_equality_deletes(spark, sf_dir, warehouse):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    extra = emb.filter(F.col("vec_id") % 5 == 0)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_del_refresh", emb.schema)
    t.append(base)
    build_ivf_index(t, k=4, iters=1)

    t.append(extra)
    # equality-delete SOME of the appended (stale-file) keys, plus one
    # already-indexed key so both file classes are exercised
    doomed = [r.vec_id for r in extra.select("vec_id").limit(3).collect()]
    doomed.append(base.select("vec_id").first().vec_id)
    t.delete_keys(
        spark.createDataFrame([(v,) for v in doomed], "vec_id long"),
        ["vec_id"],
    )
    before = t.scan().count()
    assert t.scan().filter(F.col("vec_id").isin(doomed)).count() == 0

    refresh_ann_indexes(t)
    # the deleted keys stay gone: the refreshed files must not have
    # resurrected them by reading the raw stale file list
    assert t.scan().filter(F.col("vec_id").isin(doomed)).count() == 0
    assert t.scan().count() == before
    # and the index probe can't surface them either
    queries = t.scan().select("vec_id", "embedding").limit(2)
    probed = similarity.ivf_index_topk(t, queries, k=5, n_probe=None)
    assert probed.filter(F.col("vid").isin(doomed)).count() == 0


@pytest.mark.slow
def test_refresh_applies_deletes_on_pq_codes_too(spark, sf_dir, warehouse):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    extra = emb.filter(F.col("vec_id") % 5 == 0)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_del_refresh_pq", emb.schema)
    t.append(base)
    build_ivf_index(t, k=4, iters=1)
    build_pq_index(t, n_subspaces=8, n_codes=16, sample_cap=512)

    t.append(extra)
    doomed = [r.vec_id for r in extra.select("vec_id").limit(4).collect()]
    t.delete_keys(
        spark.createDataFrame([(v,) for v in doomed], "vec_id long"),
        ["vec_id"],
    )
    refresh_ann_indexes(t)
    assert t.scan().filter(F.col("vec_id").isin(doomed)).count() == 0
    # every surviving row is fully index-consistent (cells AND codes)
    assert t.scan().filter(F.col("ivf_cell").isNull()).count() == 0
    assert t.scan().filter(F.col("pq_codes").isNull()).count() == 0


def test_missing_core_column_raises(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    region = spark.createDataFrame(
        [(1, "a", "x")], "r_regionkey long, r_name string, r_comment string"
    )
    t = lh.create_table("ns.strict_write", region.schema)
    t.append(region)
    with pytest.raises(ValueError, match="r_comment"):
        t.append(region.drop("r_comment"))
    # nothing was committed by the failed append
    assert t.scan().count() == 1


def test_evolved_column_still_null_fills(spark, warehouse):
    from pyspark.sql import types as T

    lh = Lakehouse(spark, warehouse)
    region = spark.createDataFrame(
        [(1, "a")], "r_regionkey long, r_name string"
    )
    t = lh.create_table("ns.evolved_write", region.schema)
    t.append(region)
    t.add_column("score", T.DoubleType())
    # pre-evolution writers keep working: the evolved column NULL-fills
    t.append(spark.createDataFrame([(2, "b")], "r_regionkey long, r_name string"))
    rows = {r.r_regionkey: r.score for r in t.scan().collect()}
    assert rows == {1: None, 2: None}


def test_stream_to_unindexed_table_fails_fast(spark, sf_dir, tmp_path):
    from pyiceberg_lakehouse_spark.sources.testdata import load_table
    from pyiceberg_lakehouse_spark.streaming.lakehouse_io import (
        write_stream_to_indexed_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    lh = Lakehouse(spark, str(tmp_path / "wh"))
    t = lh.create_table("ns.emb_noindex", emb.schema)
    feed = str(tmp_path / "feed")
    emb.limit(10).write.mode("overwrite").parquet(feed)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(feed)
    )
    with pytest.raises(ValueError, match="no persisted ANN index"):
        write_stream_to_indexed_table(stream, t, str(tmp_path / "ckpt"))
    # fail-fast means NOTHING committed: no snapshots beyond create
    t.log.load()
    assert all("streaming_batch_id" not in s.summary for s in t.log.snapshots)
