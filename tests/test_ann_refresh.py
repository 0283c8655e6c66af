"""Incremental ANN index maintenance (VERDICT r5 task #3).

``refresh_ann_indexes`` must extend a persisted IVF(+PQ) index to appended
rows by encoding ONLY the new files against the existing quantizers:
already-indexed files keep their paths and bytes, the refreshed table's
probe equals the compute-on-read twin over the same centroids, and a
refresh with nothing to do is a no-op.
"""

from __future__ import annotations

import json
import os

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


def _split_emb(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    extra = emb.filter(F.col("vec_id") % 5 == 0)
    return emb, base, extra


def _file_state(table) -> dict[str, float]:
    return {
        f["path"]: os.path.getmtime(f["path"]) for f in table.log.live_files()
    }


@pytest.mark.slow
def test_refresh_encodes_only_new_files(spark, sf_dir, warehouse):
    emb, base, extra = _split_emb(spark, sf_dir)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_refresh", base.schema)
    t.append(base)
    build_ivf_index(t, k=8, iters=1)
    indexed = _file_state(t)

    t.append(extra)
    snap = refresh_ann_indexes(t)
    assert snap is not None and snap.summary["op"] == "ann_refresh"

    after = _file_state(t)
    # every file from the index build survives untouched (path AND mtime)
    for path, mtime in indexed.items():
        assert path in after, f"indexed file {path} was rewritten by refresh"
        assert after[path] == mtime
    # the appended rows now carry index-consistent cells
    assert t.scan().filter(F.col("ivf_cell").isNull()).count() == 0
    assert t.scan().count() == emb.count()

    # probe equivalence vs the compute-on-read twin over the SAME centroids
    cents = json.loads(t.log.properties["ivf.centroids"])
    queries = emb.filter(F.col("vec_id").isin(0, 7))
    got = similarity.ivf_index_topk(t, queries, k=3, n_probe=3).collect()
    twin = similarity.ivf_topk(emb, queries, cents, k=3, n_probe=3).collect()
    assert sorted((r.qid, r.vid, r.rank) for r in got) == sorted(
        (r.qid, r.vid, r.rank) for r in twin
    )


def test_refresh_is_noop_when_consistent(spark, sf_dir, warehouse):
    _, base, _ = _split_emb(spark, sf_dir)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_refresh_noop", base.schema)
    t.append(base)
    build_ivf_index(t, k=4, iters=1)
    before = _file_state(t)
    assert refresh_ann_indexes(t) is None
    assert _file_state(t) == before


def test_refresh_requires_an_index(spark, sf_dir, warehouse):
    _, base, _ = _split_emb(spark, sf_dir)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_refresh_none", base.schema)
    t.append(base)
    with pytest.raises(ValueError, match="build_ivf_index"):
        refresh_ann_indexes(t)


@pytest.mark.slow
def test_refresh_covers_pq_codes_too(spark, sf_dir, warehouse):
    emb, base, extra = _split_emb(spark, sf_dir)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_refresh_pq", base.schema)
    t.append(base)
    build_ivf_index(t, k=8, iters=1)
    build_pq_index(t, n_subspaces=8, n_codes=16)
    indexed = _file_state(t)

    t.append(extra)
    assert refresh_ann_indexes(t) is not None
    after = _file_state(t)
    for path, mtime in indexed.items():
        assert path in after and after[path] == mtime
    # appended rows have valid codes of the indexed shape
    assert t.scan().filter(F.col("pq_codes").isNull()).count() == 0
    n_sub = len(json.loads(t.log.properties["pq.codebooks"]))
    assert (
        t.scan().filter(F.size("pq_codes") != n_sub).count() == 0
    )
    # an appended vector is findable through the full IVF-PQ read path:
    # query BY one of the appended vectors; with the refine stage its own
    # nearest neighbors must come back (rank list non-empty and valid)
    q = emb.filter(F.col("vec_id") == 5)  # vec_id % 5 == 0 -> appended
    got = similarity.ivf_pq_topk(t, q, k=3, n_probe=8, rerank_factor=8).collect()
    assert len(got) == 3
    assert all(r.qid == 5 and r.vid != 5 for r in got)


@pytest.mark.slow
def test_second_refresh_after_more_appends(spark, sf_dir, warehouse):
    """Refresh must key off the LAST index-consistent commit: a second
    append after a refresh touches only the second batch."""
    emb, base, extra = _split_emb(spark, sf_dir)
    b1 = extra.filter(F.col("vec_id") % 10 == 0)
    b2 = extra.filter(F.col("vec_id") % 10 == 5)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_refresh_twice", base.schema)
    t.append(base)
    build_ivf_index(t, k=8, iters=1)
    t.append(b1)
    refresh_ann_indexes(t)
    state_after_first = _file_state(t)

    t.append(b2)
    snap = refresh_ann_indexes(t)
    assert snap.summary["files_refreshed"] == 1  # just b2's single append file
    after = _file_state(t)
    for path, mtime in state_after_first.items():
        assert path in after and after[path] == mtime
    assert t.scan().filter(F.col("ivf_cell").isNull()).count() == 0
    assert t.scan().count() == emb.count()


def test_refresh_survives_snapshot_expiry(spark, sf_dir, warehouse):
    """expire_snapshots squashes history — the index commit's snapshot may
    be dropped, but the table still carries a live index (properties +
    ivf_cell files). Refresh must keep working: the epoch survives on the
    squash base, pre-expiry files count as indexed, post-expiry appends
    get encoded."""
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import expire_snapshots

    emb, base, extra = _split_emb(spark, sf_dir)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_refresh_expire", base.schema)
    t.append(base)
    build_ivf_index(t, k=8, iters=1)
    expire_snapshots(t, keep_last=1)
    assert refresh_ann_indexes(t) is None  # still recognized, nothing stale

    indexed = _file_state(t)
    t.append(extra)
    snap = refresh_ann_indexes(t)
    assert snap is not None and snap.summary["op"] == "ann_refresh"
    after = _file_state(t)
    for path, mtime in indexed.items():
        assert path in after and after[path] == mtime
    assert t.scan().filter(F.col("ivf_cell").isNull()).count() == 0
    assert t.scan().count() == emb.count()


def test_probe_raises_on_stale_index(spark, sf_dir, warehouse):
    """Appending to an indexed table makes the new rows invisible to index
    probes; the probe must refuse (not silently drop rows) until refresh,
    unless allow_stale=True is passed explicitly."""
    emb, base, extra = _split_emb(spark, sf_dir)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_stale_guard", base.schema)
    t.append(base)
    build_ivf_index(t, k=8, iters=1)
    q = emb.filter(F.col("vec_id") == 0)
    assert len(similarity.ivf_index_topk(t, q, k=3).collect()) == 3  # fresh: fine

    t.append(extra)
    with pytest.raises(ValueError, match="refresh_ann_indexes"):
        similarity.ivf_index_topk(t, q, k=3)
    # explicit opt-in probes the indexed subset
    got = similarity.ivf_index_topk(t, q, k=3, allow_stale=True).collect()
    assert len(got) == 3
    refresh_ann_indexes(t)
    assert len(similarity.ivf_index_topk(t, q, k=3).collect()) == 3


def test_ann_index_health_signals(spark, sf_dir, warehouse):
    """ann_index_health: fresh index reads ok, small append recommends
    refresh, large append (quantizer drift territory) recommends rebuild —
    all from file metadata alone."""
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import ann_index_health

    emb, base, extra = _split_emb(spark, sf_dir)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_health", base.schema)
    t.append(base)
    # build at the policy size (k=None); an explicit undersized k would
    # legitimately read as cells_due_factor >= 2 -> rebuild
    build_ivf_index(t, iters=1)

    h = ann_index_health(t)
    assert h["recommendation"] == "ok"
    assert h["stale_fraction"] == 0.0 and h["built_cells"] == 16

    t.append(extra)  # ~20% of rows: stale but under the rebuild threshold
    h = ann_index_health(t)
    assert h["recommendation"] == "refresh"
    assert 0.0 < h["stale_fraction"] <= 0.25

    refresh_ann_indexes(t)
    assert ann_index_health(t)["recommendation"] == "ok"

    # double the corpus: stale fraction crosses the rebuild threshold
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    t.append(shifted)
    h = ann_index_health(t)
    assert h["recommendation"] == "rebuild"
    assert h["stale_fraction"] > 0.25


def test_ann_index_health_requires_index(spark, sf_dir, warehouse):
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import ann_index_health

    emb, base, _ = _split_emb(spark, sf_dir)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.emb_nohealth", base.schema)
    t.append(base)
    with pytest.raises(ValueError, match="no persisted ANN index"):
        ann_index_health(t)


@pytest.mark.slow
def test_ensure_ann_fresh_executes_recommendation(spark, warehouse):
    """ensure_ann_fresh closes the health->action loop: ok is a no-op,
    refresh encodes only the tail, rebuild retrains with re-derived cell
    count and preserved PQ geometry."""
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import (
        ann_index_health,
        ensure_ann_fresh,
    )
    from pyiceberg_lakehouse_spark.sources.synthetic import mock_embeddings

    emb = mock_embeddings(spark, 3000, dim=32, n_clusters=4).drop("label")
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.auto_fresh", emb.schema)
    t.append(emb)
    # policy-sized cells (default_n_cells(3000) = 16): an undersized k
    # would itself justify a rebuild via cells_due_factor
    build_ivf_index(t, k=16, iters=1)
    build_pq_index(t, n_subspaces=8, n_codes=16, sample_cap=512)

    snap_before = t.log.current_snapshot_id()
    r = ensure_ann_fresh(t)
    assert r["action"] == "ok"
    assert t.log.current_snapshot_id() == snap_before  # no-op commits nothing

    # small append -> refresh path
    t.append(
        mock_embeddings(spark, 200, dim=32, n_clusters=4)
        .drop("label")
        .withColumn("vec_id", F.col("vec_id") + 100_000)
    )
    r = ensure_ann_fresh(t)
    assert r["action"] == "refresh"
    assert ann_index_health(t)["recommendation"] == "ok"

    # large append (>25% stale) -> rebuild path; PQ geometry preserved
    t.append(
        mock_embeddings(spark, 6000, dim=32, n_clusters=4)
        .drop("label")
        .withColumn("vec_id", F.col("vec_id") + 200_000)
    )
    r = ensure_ann_fresh(t)
    assert r["action"] == "rebuild"
    h = ann_index_health(t)
    assert h["recommendation"] == "ok"
    import json as _json

    books = _json.loads(t.log.properties["pq.codebooks"])
    assert len(books) == 8 and len(books[0]) == 16
    # probes see every row after the action
    q = t.scan().filter("vec_id = 1").select("vec_id", "embedding")
    got = similarity.ivf_index_topk(t, q, k=3).collect()
    assert len(got) == 3
