"""functions/dense.py — the Arrow-batched numpy kernels under every bulk
embedding operation. Each kernel is checked against a plain-numpy reference
on deterministic data; shapes/edge cases (empty input, zero vectors) are
exercised because a kernel that crashes on an empty Arrow batch crashes the
whole stage at scale."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.functions import dense
from pyiceberg_lakehouse_spark.sources.synthetic import mock_embeddings


def _np_corpus(spark, n=64, dim=8):
    rows = [
        (i, [float(((i * 31 + d * 17 + 3) % 19) - 9) for d in range(dim)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    X = np.array([r[1] for r in rows])
    return df, X


def test_matrix_scores_matches_numpy(spark):
    df, X = _np_corpus(spark)
    M = [[float((i + d) % 5 - 2) for d in range(8)] for i in range(3)]
    got = {
        r.vec_id: np.array(r.s)
        for r in df.select(
            "vec_id", dense.matrix_scores("embedding", M).alias("s")
        ).collect()
    }
    want = X @ np.array(M).T
    for i in range(len(X)):
        assert np.allclose(got[i], want[i])


def test_nearest_cell_matches_argmax(spark):
    df, X = _np_corpus(spark)
    M = [[float((i * 7 + d) % 11 - 5) for d in range(8)] for i in range(5)]
    got = {
        r.vec_id: r.c
        for r in df.select(
            "vec_id", dense.nearest_cell("embedding", M).alias("c")
        ).collect()
    }
    want = (X @ np.array(M).T).argmax(axis=1)
    assert got == {i: int(want[i]) for i in range(len(X))}


def test_hyperplane_bucket_bits(spark):
    df, X = _np_corpus(spark)
    P = [[float((i + 2 * d) % 7 - 3) for d in range(8)] for i in range(4)]
    got = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", dense.hyperplane_bucket("embedding", P).alias("b")
        ).collect()
    }
    proj = X @ np.array(P).T > 0
    want = (proj @ (1 << np.arange(4))).astype(int)
    assert got == {i: int(want[i]) for i in range(len(X))}


def test_cosine_pair_zero_vector_safe(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0], [1.0, 0.0]), (1, [0.0, 0.0], [1.0, 1.0])],
        "id long, a array<double>, b array<double>",
    )
    got = {r.id: r.s for r in df.select("id", dense.cosine_pair("a", "b").alias("s")).collect()}
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)  # zero norm -> 0 score, no div-by-zero


def test_local_topk_scores_equals_global_sort(spark):
    """Local per-batch top-k with (score desc, vid asc) tie rules must be
    lossless under the global merge — the invariant cosine_topk(exact=False)
    rests on."""
    from pyiceberg_lakehouse_spark.operators import similarity

    emb = mock_embeddings(spark, 500, dim=16, n_clusters=4).repartition(8)
    q = emb.filter(F.col("vec_id") < 5)
    fast = [
        (r.qid, r.rank, r.vid)
        for r in similarity.cosine_topk(emb, q, k=7, exact=False)
        .orderBy("qid", "rank")
        .collect()
    ]
    exact = [
        (r.qid, r.rank, r.vid)
        for r in similarity.cosine_topk(emb, q, k=7, exact=True)
        .orderBy("qid", "rank")
        .collect()
    ]
    assert fast == exact  # identical ids and order; scores differ only in ulps


def test_cosine_topk_fast_query_cap(spark):
    from pyiceberg_lakehouse_spark.operators import similarity

    emb = mock_embeddings(spark, 10, dim=8)
    big = spark.range(70_000).select(
        F.col("id").alias("vec_id"),
        F.expr("array(1.0D, 0D, 0D, 0D, 0D, 0D, 0D, 0D)").alias("embedding"),
    )
    with pytest.raises(ValueError, match="cap is 65536"):
        similarity.cosine_topk(emb, big, k=3, exact=False)


def test_ivf_pq_topk_empty_queries(spark, warehouse):
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import (
        build_ivf_index,
        build_pq_index,
    )
    from pyiceberg_lakehouse_spark.operators import similarity

    emb = mock_embeddings(spark, 300, dim=16)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.dense_e", emb.schema)
    t.append(emb)
    build_ivf_index(t, k=4, sample_cap=256)
    build_pq_index(t, n_subspaces=4, n_codes=16, sample_cap=256)
    out = similarity.ivf_pq_topk(t, emb.filter(F.col("vec_id") < 0), k=3)
    assert out.count() == 0
    assert out.columns == ["qid", "vid", "rank", "score"]


def test_pq_flat_table_trains_raw_vectors(spark, warehouse):
    """build_pq_index WITHOUT a prior IVF index must fall back to raw-vector
    codes (pq.residual=false) and still answer flat ADC queries."""
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import build_pq_index
    from pyiceberg_lakehouse_spark.operators import similarity

    emb = mock_embeddings(spark, 200, dim=16)
    lh = Lakehouse(spark, warehouse)
    t = lh.create_table("ns.dense_flat", emb.schema)
    t.append(emb)
    build_pq_index(t, n_subspaces=4, n_codes=16, sample_cap=256)
    assert t.log.properties["pq.residual"] == "false"
    import json

    books = json.loads(t.log.properties["pq.codebooks"])
    q = emb.filter(F.col("vec_id") < 3)
    out = similarity.pq_adc_topk(t.scan(), q, books, k=5)
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r.qid, []).append(r.vid)
    assert set(per_q) == {0, 1, 2} and all(len(v) == 5 for v in per_q.values())
