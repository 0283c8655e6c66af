"""Dense numeric kernels: Arrow-batched numpy matmul for embedding math.

Catalyst higher-order functions (``zip_with`` + ``aggregate``) evaluate
their lambda per ELEMENT per row with boxed values — fine for a handful of
rows, catastrophic for dense linear algebra. Measured on local[32]
(tools/bench_scale.py probe, round 5): assigning 200k 64-d vectors to 64
centroids through the HOF expression takes ~7 minutes; the numpy kernel
below does the identical math in ~2 seconds. That is the difference between
"scales to 100 TB" and "only looked fast on 2k rows".

So every *bulk* dense kernel (corpus-side centroid assignment, LSH
projections, pair scoring over candidate sets) rides a vectorized pandas
UDF: the constant matrix (centroids / hyperplanes / codebooks) lives in the
closure — shipped once per task, held once per executor — and each Arrow
batch is one BLAS matmul. This is the same documented slow-path escape as
the PQ kernels in operators/similarity.py: Catalyst cannot constant-fold a
k x dim literal inside HOF lambda bodies, so the expression form
re-materializes all centroids per row.

Expression HOFs remain the right tool where they are genuinely cheap or
where cross-engine bit-identity matters: query-side probing (a handful of
rows — operators/similarity.py:probe_cells_expr) and the decimal-exact
oracle baselines (functions/exact.py), which must match DuckDB bit for bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _rows(v: pd.Series) -> np.ndarray:
    """Stack a Series of array<float> values into an (n, dim) float64 matrix."""
    if len(v) == 0:
        return np.empty((0, 0), dtype=np.float64)
    return np.array(v.tolist(), dtype=np.float64)


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def matrix_scores(vec_col: str | Column, matrix: list[list[float]]) -> Column:
    """array<double> of dot(vec, matrix[i]) for every row of the constant
    matrix — one Arrow batch = one (n x dim) @ (dim x k) matmul."""
    Mt = np.array(matrix, dtype=np.float64).T

    @pandas_udf("array<double>")
    def f(v: pd.Series) -> pd.Series:
        X = _rows(v)
        if X.size == 0:
            return pd.Series([[] for _ in range(len(v))])
        return pd.Series(list(X @ Mt))

    return f(_col(vec_col))


def nearest_cell(vec_col: str | Column, matrix: list[list[float]]) -> Column:
    """int index of the max-dot-product matrix row (IVF coarse quantizer)."""
    Mt = np.array(matrix, dtype=np.float64).T

    @pandas_udf("int")
    def f(v: pd.Series) -> pd.Series:
        X = _rows(v)
        if X.size == 0:
            return pd.Series(np.zeros(len(v), dtype=np.int32))
        return pd.Series((X @ Mt).argmax(axis=1).astype(np.int32))

    return f(_col(vec_col))


def hyperplane_bucket(vec_col: str | Column, planes: list[list[float]]) -> Column:
    """long LSH bucket: bit i set iff dot(vec, planes[i]) > 0.

    Returns int64 so up to 62 planes fit without sign-bit aliasing; more
    planes than that is rejected (the bucket would silently wrap, merging
    unrelated buckets and destroying LSH recall guarantees).
    """
    if len(planes) > 62:
        raise ValueError(
            f"hyperplane_bucket supports at most 62 planes, got {len(planes)}"
        )
    Pt = np.array(planes, dtype=np.float64).T
    weights = (1 << np.arange(len(planes))).astype(np.int64)

    @pandas_udf("long")
    def f(v: pd.Series) -> pd.Series:
        X = _rows(v)
        if X.size == 0:
            return pd.Series(np.zeros(len(v), dtype=np.int64))
        bits = (X @ Pt) > 0
        return pd.Series(bits @ weights)

    return f(_col(vec_col))


def cosine_pair(a: str | Column, b: str | Column) -> Column:
    """double cosine(a, b) per row — einsum over the stacked batch. Norms
    are recomputed per pair, which in BLAS costs the same order as the dot
    itself (O(dim)) and saves carrying norm columns through the join."""

    @pandas_udf("double")
    def f(va: pd.Series, vb: pd.Series) -> pd.Series:
        A, B = _rows(va), _rows(vb)
        if A.size == 0:
            return pd.Series(np.zeros(len(va), dtype=np.float64))
        num = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        den = na * nb
        den[den == 0.0] = 1.0
        return pd.Series(num / den)

    return f(_col(a), _col(b))


def local_topk_scores(
    corpus,
    query_ids: list,
    query_vecs: list[list[float]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Per-PARTITION cosine top-k against a constant query matrix via
    mapInPandas: each corpus partition emits at most k rows per query —
    (qid, vid, score) — so the global merge shuffles O(partitions x Q x k)
    rows, never O(N x Q) pairs, and the corpus itself is never shuffled.
    The running per-query top-k is folded ACROSS the partition's Arrow
    batches before anything is yielded (state is a bounded Q x k set, merged
    batch-by-batch), so the bound holds per partition, not per batch.
    The caller applies the global top-k window over this candidate stream.

    Ordering inside a partition matches the global window exactly
    (score desc, vid asc), so local-then-global top-k is lossless.
    """
    Q = np.array(query_vecs, dtype=np.float64)
    Qn = Q / np.where((n := np.sqrt((Q * Q).sum(axis=1, keepdims=True))) == 0, 1, n)
    qids = np.array(query_ids)

    out_schema = "qid long, vid long, score double"

    def score_partition(batches):
        # running per-query top-k across this partition's batches:
        # best[j] = (scores, vids), each at most k long
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vids = pdf[id_col].to_numpy()
            nx = np.sqrt((X * X).sum(axis=1, keepdims=True))
            nx[nx == 0.0] = 1.0
            S = (X / nx) @ Qn.T  # (n, Q)
            for j in range(len(qids)):
                s = S[:, j]
                mask = vids != qids[j]  # exclude the query itself
                sv, vv = s[mask], vids[mask]
                if not len(sv):
                    continue
                if j in best:
                    sv = np.concatenate([best[j][0], sv])
                    vv = np.concatenate([best[j][1], vv])
                order = np.lexsort((vv, -sv))[:k]
                best[j] = (sv[order], vv[order])
        for j, (sv, vv) in best.items():
            yield pd.DataFrame({"qid": qids[j], "vid": vv, "score": sv})

    return corpus.select(id_col, vec_col).mapInPandas(score_partition, out_schema)
