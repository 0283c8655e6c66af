"""SemDeDup semantic dedup (operators/dedup.py::semantic_dedup)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.operators.dedup import semantic_dedup
from pyiceberg_lakehouse_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_planted_exact_dups_removed_survivors_intact(spark):
    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    planted = emb.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(planted)
    out = semantic_dedup(corpus, threshold=0.97)
    got = sorted(r.vec_id for r in out.select("vec_id").collect())
    expect = sorted(r.vec_id for r in emb.select("vec_id").collect())
    # identical vectors ALWAYS co-assign -> exact-dup recall is 1, and the
    # lowest id (the original) is the keeper; nothing else is near 0.97
    assert got == expect


@pytest.mark.slow
def test_near_dups_above_threshold_removed(spark):
    base = [1.0] + [0.0] * 7
    tilt = [0.999, 0.0447] + [0.0] * 6  # cos ~0.999 vs base
    far = [0.0] * 7 + [1.0]
    df = spark.createDataFrame(
        [(1, base, 0), (2, tilt, 0), (3, far, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = semantic_dedup(df, threshold=0.99, k_cells=2)
    got = sorted(r.vec_id for r in out.collect())
    assert got == [1, 3]  # 2 collapses into 1; 3 is its own cluster


def test_pairs_are_cluster_blocked_never_all_pairs(spark):
    """The pair stage must join on the learned cluster — no cartesian
    product over the corpus. (The end-to-end plan truncates at the
    components checkpoint, so the pair composition is audited directly.)"""
    from pyiceberg_lakehouse_spark.operators import similarity

    emb = load_table(spark, SF, "embeddings")
    cents = similarity.kmeans_refine_local(
        emb, similarity.sample_centroids(emb, k=4)
    )
    assigned = similarity.ivf_assign(emb, cents)
    pairs = similarity.embedding_near_dup_pairs(
        assigned, 0.9, within="ivf_cell"
    )
    plan = pairs._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    assert "ivf_cell" in plan  # the blocking key reaches the join


def test_schema_passthrough(spark):
    emb = load_table(spark, SF, "embeddings")
    out = semantic_dedup(emb, threshold=0.97)
    assert out.columns == emb.columns
