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
    """Stack a Series of array<float> values into an (n, dim) float64 matrix.

    Assumes every value is non-null and same-dim; kernels over UNTRUSTED
    vector columns use ``_rows_masked`` instead — a 100 TB corpus will
    contain NULL and mis-dimensioned poison rows, and one of them must not
    fail the whole job."""
    if len(v) == 0:
        return np.empty((0, 0), dtype=np.float64)
    return np.array(v.tolist(), dtype=np.float64)


def _rows_masked(
    v: pd.Series, dim: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(X, mask): stack the VALID rows of a vector Series into an (m, dim)
    float64 matrix; ``mask[i]`` says whether input row i participated.
    Valid = non-null with the expected dimension (``dim``, or the first
    non-null row's length when unspecified). Kernels emit NULL (aligned
    outputs) or skip (candidate streams) for masked-out rows."""
    vals = v.tolist()
    if dim is None:
        dim = next((len(x) for x in vals if x is not None), 0)
    mask = np.fromiter(
        (x is not None and len(x) == dim for x in vals), dtype=bool, count=len(vals)
    )
    if not mask.any():
        return np.empty((0, dim), dtype=np.float64), mask
    X = np.array([vals[i] for i in np.flatnonzero(mask)], dtype=np.float64)
    return X, mask


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def matrix_scores(vec_col: str | Column, matrix: list[list[float]]) -> Column:
    """array<double> of dot(vec, matrix[i]) for every row of the constant
    matrix — one Arrow batch = one (n x dim) @ (dim x k) matmul."""
    Mt = np.array(matrix, dtype=np.float64).T

    @pandas_udf("array<double>")
    def f(v: pd.Series) -> pd.Series:
        X, mask = _rows_masked(v, Mt.shape[0])
        out = [None] * len(v)
        if X.size:
            for i, row in zip(np.flatnonzero(mask), X @ Mt):
                out[i] = list(row)
        return pd.Series(out)

    return f(_col(vec_col))


def nearest_cell(vec_col: str | Column, matrix: list[list[float]]) -> Column:
    """int index of the max-dot-product matrix row (IVF coarse quantizer)."""
    Mt = np.array(matrix, dtype=np.float64).T

    @pandas_udf("int")
    def f(v: pd.Series) -> pd.Series:
        X, mask = _rows_masked(v, Mt.shape[0])
        out = pd.array([None] * len(v), dtype="Int32")
        if X.size:
            out[np.flatnonzero(mask)] = (X @ Mt).argmax(axis=1).astype(np.int32)
        return pd.Series(out)

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
        X, mask = _rows_masked(v, Pt.shape[0])
        out = pd.array([None] * len(v), dtype="Int64")
        if X.size:
            bits = (X @ Pt) > 0
            out[np.flatnonzero(mask)] = bits @ weights
        return pd.Series(out)

    return f(_col(vec_col))


def cosine_pair(a: str | Column, b: str | Column) -> Column:
    """double cosine(a, b) per row — einsum over the stacked batch. Norms
    are recomputed per pair, which in BLAS costs the same order as the dot
    itself (O(dim)) and saves carrying norm columns through the join."""

    @pandas_udf("double")
    def f(va: pd.Series, vb: pd.Series) -> pd.Series:
        A, ma = _rows_masked(va)
        B, mb = _rows_masked(vb, A.shape[1] if A.size else None)
        mask = ma & mb
        out = np.full(len(va), np.nan)
        if mask.any():
            idx = np.flatnonzero(mask)
            Av = np.array([va.iloc[i] for i in idx], dtype=np.float64)
            Bv = np.array([vb.iloc[i] for i in idx], dtype=np.float64)
            num = np.einsum("ij,ij->i", Av, Bv)
            na = np.sqrt(np.einsum("ij,ij->i", Av, Av))
            nb = np.sqrt(np.einsum("ij,ij->i", Bv, Bv))
            den = na * nb
            den[den == 0.0] = 1.0
            out[idx] = num / den
        return pd.Series(out)

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
            X, mask = _rows_masked(pdf[vec_col], Q.shape[1])
            if not mask.any():
                continue  # poison rows (NULL / wrong dim) never kill the job
            vids = pdf[id_col].to_numpy()[mask]
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
