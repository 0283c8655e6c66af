"""Regression tests for the round-2 advisor findings (ADVICE.md r2).

1. bool-partitioned tables: hive paths store lowercase ``true``/``false``
   while ``str(True)`` is ``'True'`` — pruning must not drop matching rows
   (datasource.pushFilters + transforms.probe_value).
2. rollback_to must be ONE atomic commit carrying the restored state.
3. the optimistic concurrency check must catch a stale handle whose
   snapshot-list LENGTH aliases after expire_snapshots.
4. prune_files must keep (not crash on) files whose stats have a different
   type than the probe value.
5. obsolete equality-delete files must be reclaimable by both
   remove_orphan_files and expire_snapshots.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import EqualTo

from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
from pyiceberg_lakehouse_spark.lakehouse.log import SnapshotLog
from pyiceberg_lakehouse_spark.lakehouse.maintenance import (
    expire_snapshots,
    remove_orphan_files,
)
from pyiceberg_lakehouse_spark.lakehouse.stats import prune_files
from pyiceberg_lakehouse_spark.sources.datasource import (
    LakehouseBatchReader,
    register_lakehouse_source,
)

BOOL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("flag", T.BooleanType()),
    ]
)


@pytest.fixture()
def bool_table(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.flags", BOOL_SCHEMA, partition_by=["flag"])
    rows = spark.range(20).select(
        F.col("id"), (F.col("id") % 2 == 0).alias("flag")
    )
    t.append(rows)
    return t


@pytest.mark.slow
def test_bool_partition_filter_returns_rows(spark, bool_table):
    register_lakehouse_source(spark)
    df = spark.read.format("lakehouse").load(bool_table.table_dir)
    assert df.filter("flag = true").count() == 10
    assert df.filter("flag = false").count() == 10
    assert df.filter(F.col("flag")).agg(F.sum("id")).collect()[0][0] == sum(
        range(0, 20, 2)
    )


def test_bool_partition_pushfilter_keeps_matching_file(bool_table):
    reader = LakehouseBatchReader({"path": bool_table.table_dir})
    reader.pushFilters([EqualTo(("flag",), True)])
    parts = [p for p in reader.partitions() if p.path]
    assert parts, "bool equality filter pruned every file"
    assert all("flag=true" in p.path for p in parts)


def test_bool_partition_probe_and_scan(bool_table):
    pf = bool_table.partition_probe({"flag": True})
    assert pf == {"flag": "true"}
    assert bool_table.scan(partition_filter=pf).count() == 10


def test_rollback_is_single_atomic_commit(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.rb", BOOL_SCHEMA)
    s1 = t.append(spark.range(5).select("id", F.lit(True).alias("flag")))
    t.append(spark.range(5, 9).select("id", F.lit(False).alias("flag")))
    t.delete_keys(spark.range(2).select("id"), key_cols=["id"])
    n_before = len(t.history())
    t.rollback_to(s1.snapshot_id)
    # exactly one new snapshot, and the state read back FROM DISK is the
    # restored one — no empty-table intermediate ever hits the log
    on_disk = SnapshotLog(t.table_dir).load()
    assert len(on_disk.snapshots) == n_before + 1
    head = on_disk.snapshots[-1]
    assert head.operation == "overwrite"
    assert {f["path"] for f in head.added_files} == {
        f["path"] for f in on_disk.live_files(s1.snapshot_id)
    }
    # preserved sequencing: restored entries keep their ORIGINAL added_in
    assert all(f["added_in"] == s1.snapshot_id for f in head.added_files)
    assert t.scan().count() == 5


def test_stale_handle_after_expiry_cannot_clobber(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.stale", BOOL_SCHEMA)
    for i in range(3):
        t.append(spark.range(i, i + 1).select("id", F.lit(True).alias("flag")))
    stale = SnapshotLog(t.table_dir).load()  # 4 snapshots cached
    expire_snapshots(t, keep_last=1)  # log shrinks to 1
    t.log.load()
    for i in range(3):
        t.append(spark.range(i, i + 1).select("id", F.lit(True).alias("flag")))
    # on-disk length is 4 again — aliases the stale handle's cached length,
    # but the head id differs, so the commit must be rejected
    assert len(SnapshotLog(t.table_dir).load().snapshots) == len(stale.snapshots)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        stale.commit("overwrite", [])
    # the other writer's commits survived
    assert t.scan().count() == 6


def test_prune_files_mixed_types_keeps_file():
    files = [
        {"path": "a.parquet", "stats": {"c": ["alpha", "omega"]}},
        {"path": "b.parquet", "stats": {"c": [10, 20]}},
    ]
    # int probe vs string stats on file a: incomparable -> keep a;
    # comparable file b prunes normally
    out = prune_files(files, {"c": ("=", 5)})
    assert [f["path"] for f in out] == ["a.parquet"]


def _delete_files_on_disk(table_dir: str) -> list[str]:
    import glob

    return glob.glob(os.path.join(table_dir, "deletes", "**", "*.parquet"), recursive=True)


def test_orphan_scan_reclaims_obsolete_delete_files(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.morclean", BOOL_SCHEMA)
    t.append(spark.range(10).select("id", F.lit(True).alias("flag")))
    t.delete_keys(spark.range(3).select("id"), key_cols=["id"])
    assert _delete_files_on_disk(t.table_dir)
    # overwrite drops the delete from the live state but the file remains
    t.overwrite(spark.range(4).select("id", F.lit(False).alias("flag")))
    # still referenced by history -> expiry is what orphans it
    removed = expire_snapshots(t, keep_last=1)
    assert any("deletes" in p for p in removed)
    assert not _delete_files_on_disk(t.table_dir)
    assert t.scan().count() == 4


def test_remove_orphan_files_scans_deletes_dir(spark, warehouse):
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.morclean2", BOOL_SCHEMA)
    t.append(spark.range(10).select("id", F.lit(True).alias("flag")))
    # crashed delete-writer: a file under deletes/ that no snapshot references
    orphan_dir = os.path.join(t.table_dir, "deletes", "d-crashed")
    os.makedirs(orphan_dir, exist_ok=True)
    spark.range(1).write.mode("overwrite").parquet(orphan_dir)
    deleted = remove_orphan_files(t, older_than_s=0.0)
    assert any("d-crashed" in p for p in deleted)
    assert t.scan().count() == 10


def test_scrub_pii_preserves_case(spark):
    """ADVICE r4: scrub_pii must not case-fold the surviving corpus — only
    redact. Mixed-case URLs/emails still match (case-insensitive patterns)."""
    from pyiceberg_lakehouse_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "Hello World, mail Bob.Smith@Example.COM or see HTTPS://X.example/Y now"),
            (2, "No PII Here, Just Mixed Case"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert rows[1]["clean_text"] == "Hello World, mail <EMAIL> or see <URL> now"
    assert rows[1]["n_urls"] == 1 and rows[1]["n_emails"] == 1
    assert rows[2]["clean_text"] == "No PII Here, Just Mixed Case"
    assert rows[2]["n_urls"] == 0 and rows[2]["n_emails"] == 0


# ---- round-5 advisor findings (ADVICE.md r5) ----


def test_hyperplane_bucket_long_and_plane_guard(spark):
    """ADVICE r5: hyperplane_bucket returned int32 while computing int64
    bit weights — n_planes >= 32 silently wrapped buckets. Now: long return
    type, hard error past 62 planes (sign bit)."""
    import numpy as np

    from pyiceberg_lakehouse_spark.functions import dense

    X = np.eye(40, dtype=np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    # 40 planes: plane i fires only on basis vector i -> bucket 2**i;
    # with the old int32 cast, i >= 31 wrapped negative/aliased
    planes = [[1.0 if d == i else -0.001 for d in range(40)] for i in range(40)]
    got = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", dense.hyperplane_bucket("embedding", planes).alias("b")
        ).collect()
    }
    assert got[39] == 1 << 39 and got[31] == 1 << 31 and got[0] == 1
    with pytest.raises(ValueError, match="62"):
        dense.hyperplane_bucket("embedding", [[0.0] * 4] * 63)


@pytest.mark.slow
def test_local_topk_bounded_per_partition_not_per_batch(spark):
    """ADVICE r5: local_topk_scores must emit at most k rows per query per
    PARTITION (folded across Arrow batches), and the fold must be lossless
    vs a single-batch run."""
    import numpy as np

    from pyiceberg_lakehouse_spark.functions import dense

    rng = np.random.default_rng(7)
    n, dim, k = 400, 8, 5
    V = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1)
    # tiny Arrow batches force many batches within the single partition
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        qids = [0, 1]
        qvecs = [[float(x) for x in V[0]], [float(x) for x in V[1]]]
        out = dense.local_topk_scores(corpus, qids, qvecs, k).collect()
        # bound: one partition -> at most k rows per query TOTAL
        per_q = {}
        for r in out:
            per_q.setdefault(r.qid, []).append((r.vid, r.score))
        assert all(len(v) <= k for v in per_q.values())
        # lossless: matches exact numpy top-k (score desc, vid asc)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        for qi, qid in enumerate(qids):
            S = Vn @ Vn[qid]
            order = [
                int(v)
                for v in np.lexsort((np.arange(n), -S))
                if v != qid
            ][:k]
            got = [v for v, _ in sorted(per_q[qid], key=lambda t: (-t[1], t[0]))]
            assert got == order
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_package_import_has_no_env_side_effect():
    """ADVICE r5: importing the package must not mutate os.environ; the
    PYTHONPATH export happens at session creation / driver entry instead."""
    import subprocess
    import sys

    code = (
        "import os, json; before = os.environ.get('PYTHONPATH');"
        "os.environ.pop('PYTHONPATH', None);"
        "import pyiceberg_lakehouse_spark;"
        "assert 'PYTHONPATH' not in os.environ, os.environ.get('PYTHONPATH');"
        "from pyiceberg_lakehouse_spark.session import export_worker_pythonpath;"
        "export_worker_pythonpath();"
        "assert 'PYTHONPATH' in os.environ;"
        "print('ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "ok"


def test_bench_scale_cited_keys_exist():
    """The dedup.py checkpoint comment cites BENCH_SCALE.json keys; keep
    comment and data from drifting apart (VERDICT r5 wrong #1)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "BENCH_SCALE.json")
    if not os.path.exists(path):
        pytest.skip("BENCH_SCALE.json not generated yet")
    with open(path) as fh:
        data = json.load(fh)
    phases = data.get("phases", data)
    for key in (
        "minhash_ckpt_100k",
        "minhash_nockpt_100k",
        "minhash_ckpt_1000k",
        "minhash_nockpt_1000k",
    ):
        assert key in phases, f"dedup.py cites BENCH_SCALE key {key!r} which is absent"
