"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline. Dot
  products ride Catalyst higher-order functions (zip_with + aggregate) with
  decimal accumulation so scores are bit-identical across engines; no Python
  UDF anywhere.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets candidates,
  exact rerank only within buckets. At 100 TB the brute-force cross join is
  O(Q*N); LSH makes the candidate set O(Q * bucket), with recall controlled
  by the number of tables/bits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window

from pyiceberg_lakehouse_spark.localdf import local_rows_df
from pyspark.sql import functions as F

from pyiceberg_lakehouse_spark.functions.exact import dot_product_exact

# Worker-side memory budget for a single query-chunk score matrix /
# ADC-gather intermediate inside the mapInPandas kernels. Keeps per-batch
# temporaries ~256 MB even at the 65536-query driver cap.
_SCORE_MATRIX_BYTES = 256 * 1024 * 1024

# Auto n_probe floor: probe at least this many cells. 16 sits above the
# measured recall-1.0 probe width (12 at the 610-cell / 10M-vector
# calibration point, PROBE_SWEEP.json) with headroom for less-clustered
# corpora, at near-zero marginal wall cost (probe time is nearly flat in
# n_probe there: per-file open cost dominates scored rows).
_PROBE_FLOOR = 16


def default_n_cells(n_rows: int) -> int:
    """IVF cell count for a corpus of ``n_rows``: ``~0.2 * sqrt(N)``,
    floored at 16 (FAISS practice sizes cells by sqrt(N); the coefficient
    anchors the policy to the calibrated 10M-vector operating point of
    ~610 cells, PROBE_SWEEP.json).

    sqrt-N sizing is what keeps BOTH halves of the index sublinear as the
    corpus grows:

    - build: centroid assignment is O(N * cells * dim) — linear cell
      growth (the old constant-rows-per-cell rule) made the build
      QUADRATIC in N; sqrt cells makes it O(N^1.5) in total but the
      per-10x growth of assignment cost is ~31x -> bounded, and k-means
      training stays feasible (cells, not rows, bound the driver state).
    - probe: probed rows = n_probe * N / cells. With sqrt-N cells and the
      recall-targeted ``resolve_n_probe`` width, probed rows grow
      ~sqrt(10) ~ 3.2x per 10x corpus in the calibrated regime (N^0.75
      asymptotically — always sublinear) instead of the old linear
      trajectory (fixed cell fraction -> probed rows ~ N/16).
    - files: one file per cell means rows-per-file also grows as sqrt(N),
      so per-cell files approach the 512 MB target at scale instead of
      shrinking toward metadata-dominated shards.
    """
    import math

    return max(16, math.ceil(0.2 * math.sqrt(max(0, n_rows))))


# Measured recall-vs-width anchors (PROBE_SWEEP.json, 633 cells / 10M
# vectors, worst-case isotropic corpus, recall@10), expressed as the
# coefficient c in width = ceil(c * sqrt(cells)): 16 probes (c=0.64) ->
# 1.000, 12 (0.48) -> 0.988, 8 (0.32) -> 0.938, 4 (0.16) -> 0.775. The
# r5 61-cell sweep fits the same curve (4 = 0.51*sqrt(61) -> 0.988).
_RECALL_WIDTHS: tuple[tuple[float, float], ...] = (
    (0.99, 0.64),
    (0.95, 0.48),
    (0.90, 0.32),
    (0.0, 0.16),
)

# Measured refine-dial anchors for the IVF-PQ read path (PROBE_SWEEP.json
# ivfpq_rerank_curve, 10M vectors / 32 subspaces / auto probe width,
# recall@10): rerank_factor 32 -> 1.000, 16 -> 0.963, 4 -> 0.725. The ADC
# stage plateaus at ~0.963 regardless of probe width (ivfpq_curve), so a
# recall_target above the plateau must widen the REFINE stage, not the
# probe — this table is how ``ivf_pq_topk(recall_target=...)`` picks the
# (n_probe, rerank_factor) pair from one dial, same UX as the plain-IVF
# paths.
_RECALL_RERANKS: tuple[tuple[float, int], ...] = (
    (0.99, 32),
    (0.95, 16),
    (0.90, 16),
    (0.0, 8),
)


def resolve_rerank_factor(
    rerank_factor: int | None, recall_target: float | None
) -> int:
    """Resolve the IVF-PQ refine width: an explicit ``rerank_factor`` wins;
    a ``recall_target`` picks the cheapest measured-calibrated factor
    meeting it (``_RECALL_RERANKS``); ``None``/``None`` keeps the default
    16 (the 0.963-recall operating point)."""
    if rerank_factor is not None:
        return rerank_factor
    if recall_target is not None:
        # below-table targets (incl. caller bugs like -1) resolve to the
        # cheapest anchor instead of raising StopIteration (ADVICE r8)
        return next(
            (f for thr, f in _RECALL_RERANKS if recall_target >= thr),
            _RECALL_RERANKS[-1][1],
        )
    return 16


def resolve_n_probe(
    n_cells: int, n_probe: int | None, recall_target: float | None = None
) -> int:
    """Resolve the probe width: an explicit ``n_probe`` wins (clamped to
    the cell count); a ``recall_target`` picks the cheapest measured-
    calibrated width meeting it (see ``_RECALL_WIDTHS`` — e.g. 0.95 costs
    ~25% fewer scanned rows than the default at 10M vectors, 0.8 ~75%
    fewer); ``None``/``None`` picks the default RECALL-TARGETED width:

        max(_PROBE_FLOOR, ceil(sqrt(n_cells) / 2))

    calibrated on two measured points (PROBE_SWEEP.json + BENCH_SCALE
    history, isotropic worst-case corpus, recall@10): 61 cells needed ~4
    probes (0.988) and 610 cells needed ~12 (1.000) — both on the
    ceil(sqrt(cells)/2) curve; the floor adds headroom within the
    calibrated range. sqrt growth tracks the finer cell partition (a
    query's neighbor ball spans more cells as cells shrink) without the
    old fixed-fraction rule's linear cost trajectory.

    Cost model (why this stays sublinear): probe cost ~ file opens
    (= n_probe, one file per cell) + scored rows (= n_probe * N /
    n_cells). With ``default_n_cells`` ~ 0.2*sqrt(N) and this width,
    probed rows grow ~sqrt(10) ~ 3.2x per 10x corpus while the floor
    dominates (through ~1e8 rows / 1024 cells) and ~N^0.75 beyond —
    always sublinear, vs the old fixed-fraction rule's strictly linear
    N/16. The calibrated decade is asserted by the
    ``ivf_probed_rows_growth_10x`` claim in BENCH_SCALE.json so the
    linear trajectory cannot silently return.
    """
    import math

    if n_cells <= 0:
        return 1
    if n_probe is not None:
        return max(1, min(n_probe, n_cells))
    if recall_target is not None:
        # same below-table guard as resolve_rerank_factor (ADVICE r8)
        coef = next(
            (c for thr, c in _RECALL_WIDTHS if recall_target >= thr),
            _RECALL_WIDTHS[-1][1],
        )
        return max(4, min(n_cells, math.ceil(coef * math.sqrt(n_cells))))
    return max(
        min(_PROBE_FLOOR, n_cells),
        min(n_cells, math.ceil(math.sqrt(n_cells) / 2)),
    )


def dot_product_fast(a: str | F.Column, b: str | F.Column) -> F.Column:
    """Double-precision dot product (zip_with + aggregate, JVM-side).

    ~5× faster than the decimal-exact fold. Used by the APPROXIMATE paths
    (LSH / IVF), whose outputs are sketch-dependent anyway and are graded by
    recall against the exact baseline — only ``cosine_topk`` needs the
    cross-engine bit-identical decimal arithmetic."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, one pass over the corpus.

    The corpus is never shuffled — queries broadcast to every partition, the
    per-query top-k window shuffles only (qid, vid, score) triples.

    ``exact=True`` (default) accumulates dot products in decimal so scores
    are bit-identical to the DuckDB oracle. ``exact=False`` is the SCALE
    brute-force baseline (tools/bench_scale.py): queries collect to the
    driver (bounded — a query set is small by definition), each corpus
    partition computes its local top-k with one numpy matmul
    (functions/dense.py:local_topk_scores), and the global merge window
    sees only O(partitions x Q x k) candidate rows — the corpus is never
    shuffled and never crosses into a pair join.
    """
    if not exact:
        from pyiceberg_lakehouse_spark.functions import dense

        qrows = queries.select(id_col, vec_col).limit(65_537).collect()
        if len(qrows) > 65_536:
            raise ValueError(
                "cosine_topk(exact=False) collects the query set to the "
                "driver; cap is 65536 rows — use an ANN index for "
                "query sets at corpus scale"
            )
        qrows, _ = _valid_vecs(qrows, vec_idx=1)
        cand = dense.local_topk_scores(
            corpus,
            [r[0] for r in qrows],
            [[float(x) for x in r[1]] for r in qrows],
            k,
            id_col=id_col,
            vec_col=vec_col,
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vid"))
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "vid", "rank", "score")
        )
    dot = dot_product_exact
    # norms are per-vector, so compute them once per row on each side —
    # not per pair (which would redo the decimal fold O(Q*N) extra times).
    # The float->double->decimal(10,7) element casts are ALSO per-vector
    # work: hoisting them into a per-side transform() means the O(Q*N)
    # pair fold multiplies pre-cast decimals instead of re-casting every
    # element per pair — same operand values and types (decimal(10,7)
    # products into the pinned decimal(29,14) accumulator), so scores
    # stay bit-identical to the oracle.
    dec = f"transform({vec_col}, x -> cast(cast(x as double) as decimal(10,7)))"
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"),
            F.expr(dec).alias("q_dec"),
            F.sqrt(dot(vec_col, vec_col)).alias("q_norm"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("vid"),
        F.expr(dec).alias("c_dec"),
        F.sqrt(dot(vec_col, vec_col)).alias("c_norm"),
    )
    pair_fold = F.expr(
        """
        cast(
          aggregate(
            zip_with(q_dec, c_dec, (x, y) -> x * y),
            cast(0 as decimal(29,14)),
            (acc, v) -> cast(acc + v as decimal(29,14))
          ) as double)
        """
    )
    scored = (
        c.join(q, F.col("qid") != F.col("vid"))
        .withColumn(
            "score",
            pair_fold / (F.col("q_norm") * F.col("c_norm")),
        )
        .select("qid", "vid", "score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        # poison rows (NULL / mis-dimensioned vectors) null the fold; they
        # are unrankable and must not occupy top-k slots. The NULL filter
        # sits AFTER the rank window on purpose: a pre-window
        # filter(score.isNotNull()) gets pushed below the Project and makes
        # Catalyst evaluate the O(Q*N) decimal fold TWICE per pair (Filter
        # + Project — measured 1.85x wall). Past the window the score is a
        # materialized column on O(Q*N) rows and the filter can't be pushed
        # through a non-partition-key window, so the fold runs exactly once.
        # Ordering stays correct without the pre-filter because desc() is
        # NULLS LAST — NULL scores can never outrank a real score.
        .filter((F.col("rank") <= k) & F.col("score").isNotNull())
        .select("qid", "vid", "rank", "score")
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (no RNG state).

    Component (p, d) = fractional part of sin-free integer scrambling mapped
    to [-1, 1]; fixed constants make every run identical.
    """
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            x = (p * 73_856_093 + d * 19_349_663 + 83_492_791) % 2_147_483_647
            row.append((x / 2_147_483_647.0) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection LSH bucket id per vector (one long column added).

    The projections are a bulk dense kernel, so they ride the Arrow-batched
    numpy matmul (functions/dense.py:hyperplane_bucket) — the planes matrix
    lives in the task closure, each batch is one BLAS call. The expression-
    HOF form this replaced evaluated the lambda per element per row and was
    ~100x slower at corpus scale (see functions/dense.py module docstring).
    """
    from pyiceberg_lakehouse_spark.functions import dense

    planes = _hyperplanes(dim, n_planes)
    return df.withColumn("bucket", dense.hyperplane_bucket(vec_col, planes))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: join on LSH bucket, exact cosine rerank within buckets.

    The candidate join key is the bucket id, so the corpus side shuffles by
    bucket (or broadcasts the bucketed queries, as here) and only in-bucket
    pairs are scored. Recall < 1.0 by construction; pytest checks it against
    ``cosine_topk`` ground truth.
    """
    from pyiceberg_lakehouse_spark.functions import dense

    qb = F.broadcast(
        lsh_bucket(queries, dim, n_planes, id_col, vec_col).select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("q_vec"),
            "bucket",
        )
    )
    cb = lsh_bucket(corpus, dim, n_planes, id_col, vec_col).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("c_vec"),
        "bucket",
    )
    scored = (
        cb.join(qb, "bucket")
        .filter(F.col("qid") != F.col("vid"))
        .withColumn("score", dense.cosine_pair("q_vec", "c_vec"))
        # NaN marks poison rows (NULL / ragged vectors); Spark sorts NaN
        # GREATEST under desc, so they'd otherwise top the ranking
        .filter(~F.isnan("score"))
        .select("qid", "vid", "score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", "rank", "score")
    )


def centroid_scores_expr(
    centroids: list[list[float]], vec_col: str = "embedding"
) -> F.Column:
    """Array of dot(vec, centroid_i) for every centroid — ONE nested
    higher-order expression over a single k x dim array literal.

    Expanding a separate zip_with/aggregate chain per centroid multiplies
    the expression tree by k; with k=16, dim=64 that is thousands of nodes
    and driver-side query construction costs seconds per query (one py4j
    round-trip PER literal). The nested form parses the whole k x dim
    literal JVM-side from one SQL string — one py4j call — and keeps the
    lambda tree constant-size regardless of k, so planning stays
    milliseconds while the generated work is identical. repr() keeps every
    double bit-exact (shortest round-trip form).
    """
    if not centroids:
        raise ValueError("centroids must be non-empty (empty corpus/sample?)")
    cl = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")" for c in centroids
        )
        + ")"
    )
    return F.transform(
        cl,
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def _scored_cells_expr(centroids: list[list[float]], vec_col: str) -> F.Column:
    """Array of (score, cell) structs for argmax / ranking."""
    scores = centroid_scores_expr(centroids, vec_col)
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    return F.zip_with(
        scores, idx, lambda s, i: F.struct(s.alias("s"), i.alias("cell"))
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    Centroids arrive as plain lists (decided driver-side — k-means on a
    SAMPLE); assignment is the bulk dense kernel, so it rides the
    Arrow-batched numpy argmax (functions/dense.py:nearest_cell): the
    centroid matrix ships once per task in the closure and each batch is
    one matmul. The expression-HOF argmax this replaced took ~7 min for
    200k rows x 64 centroids; the kernel takes seconds, and cost stays
    O(N x k x dim) FLOPs at BLAS speed as both N and k grow.
    """
    if not centroids:
        raise ValueError("centroids must be non-empty (empty corpus/sample?)")
    from pyiceberg_lakehouse_spark.functions import dense

    return df.withColumn("ivf_cell", dense.nearest_cell(vec_col, centroids))


def sample_centroids(
    df: DataFrame, k: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic centroid seed: the k lowest-id vectors, normalized.

    A production IVF would Lloyd-iterate on a sample; for a reproducible
    index the seed choice just needs to be fixed and spread — recall is
    controlled by n_probe, which the search below takes as a parameter.
    """
    rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    rows, _ = _valid_vecs(rows)
    out = []
    for r in rows:
        v = [float(x) for x in r[0]]
        norm = sum(x * x for x in v) ** 0.5 or 1.0
        out.append([x / norm for x in v])
    return out


def probe_cells_expr(
    centroids: list[list[float]], n_probe: int, vec_col: str = "embedding"
) -> F.Column:
    """Array of each row's ``n_probe`` nearest centroid ids (ranked by dot
    product) — the per-query probe list, as a pure Catalyst expression of
    constant size in k (see centroid_scores_expr)."""
    ranked = F.slice(
        F.reverse(F.array_sort(_scored_cells_expr(centroids, vec_col))), 1, n_probe
    )
    return F.transform(ranked, lambda p: p["cell"])


def _valid_vecs(rows, vec_idx: int = 0, dim: int | None = None):
    """Filter driver-collected rows to those whose vector is non-null with
    a consistent dimension. Poison rows — NULL embeddings, ragged dims —
    exist in any real corpus and must degrade to exclusion, not a crashed
    build/probe.

    Callers with an authoritative dimension (existing centroids/codebooks)
    pass ``dim``; otherwise the reference dim is the MAJORITY length over
    the sample — first-row inference let a single ragged poison row that
    happened to sort first become the reference dim, silently discarding
    every legitimate row and training the index at the wrong dimension
    (ADVICE r7)."""
    if dim is None:
        from collections import Counter

        lengths = Counter(
            len(r[vec_idx]) for r in rows if r[vec_idx] is not None
        )
        dim = lengths.most_common(1)[0][0] if lengths else None
    if dim is None:
        return [], 0
    return [
        r for r in rows if r[vec_idx] is not None and len(r[vec_idx]) == dim
    ], dim


def _collect_queries(
    queries: DataFrame, id_col: str, vec_col: str, dim: int | None = None
):
    """Bounded driver collect of a query set: (ids, raw float64 matrix).

    Query sets are small by definition; the cap keeps driver state bounded
    (same contract as cosine_topk(exact=False) / ivf_pq_topk). ``dim`` is
    the authoritative vector dimension when the caller has one (the index's
    centroid dim) — poison queries of any other length drop out."""
    import numpy as np

    qrows = queries.select(id_col, vec_col).limit(65_537).collect()
    if len(qrows) > 65_536:
        raise ValueError(
            "ANN probes collect the query set to the driver; cap is 65536 "
            "rows — run corpus-scale query sets in batches"
        )
    qrows, _ = _valid_vecs(qrows, vec_idx=1, dim=dim)
    ids = [int(r[0]) for r in qrows]
    Q = np.array([[float(x) for x in r[1]] for r in qrows], dtype=np.float64)
    return ids, Q


def _probe_topk(
    cb: DataFrame,
    qids: list[int],
    Q,
    centroids: list[list[float]],
    k: int,
    n_probe: int,
) -> DataFrame:
    """Shared probe tail over collected queries: probe lists + scoring both
    ride the mapInPandas closure (queries are bounded driver state), so the
    plan carries NO k x dim centroid literal — at 610 cells that literal
    alone made plan construction+parse the dominant probe cost — and each
    corpus batch emits at most k rows per query with global-window tie
    rules. ``cb`` must carry (vid, c_vec, ivf_cell)."""
    import numpy as np

    spark = cb.sparkSession
    if not qids:
        return local_rows_df(spark,
            [], "qid long, vid long, rank int, score double"
        )
    IC = np.array(centroids, dtype=np.float64)
    # rank cells by raw dot product — the same quantizer ranking as
    # probe_cells_expr (scaling by 1/|q| preserves per-query order)
    plists = np.argsort(-(Q @ IC.T), axis=1)[:, :n_probe]
    plist_arrs = [np.asarray(p) for p in plists]
    qarr = np.array(qids)
    Qn = _normalize_rows(Q)

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            from pyiceberg_lakehouse_spark.functions.dense import _rows_masked

            X, vmask = _rows_masked(pdf["c_vec"], Qn.shape[1])
            if not vmask.any():
                continue
            cells = pdf["ivf_cell"].to_numpy(dtype=np.int64)[vmask]
            vids = pdf["vid"].to_numpy(dtype=np.int64)[vmask]
            nx = np.sqrt(np.einsum("ij,ij->i", X, X))
            nx[nx == 0.0] = 1.0
            Xn = X / nx[:, None]
            # chunk queries so the (rows, chunk) score matrix stays under
            # _SCORE_MATRIX_BYTES regardless of query-set size — near the
            # 65536-query driver cap an unchunked matrix is multiple GB
            # per worker per Arrow batch
            chunk = max(1, _SCORE_MATRIX_BYTES // (8 * len(X)))
            for q0 in range(0, len(qarr), chunk):
                q1 = min(q0 + chunk, len(qarr))
                S = Xn @ Qn[q0:q1].T  # (n, chunk) cosines
                for qi in range(q0, q1):
                    mask = np.isin(cells, plist_arrs[qi]) & (vids != qarr[qi])
                    if not mask.any():
                        continue
                    s, vv = S[mask, qi - q0], vids[mask]
                    order = np.lexsort((vv, -s))[:k]
                    yield pd.DataFrame(
                        {"qid": qarr[qi], "vid": vv[order], "score": s[order]}
                    )

    scored = cb.mapInPandas(score_batches, "qid long, vid long, score double")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", "rank", "score")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    n_probe: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    recall_target: float | None = None,
) -> DataFrame:
    """IVF approximate top-k: score only corpus cells among each query's
    ``n_probe`` nearest centroids (``None`` = the default recall-targeted
    width; or pass ``recall_target`` to dial width for a measured recall
    level — see ``resolve_n_probe``).

    The corpus shuffles once by cell (or stays put if pre-partitioned by
    cell at ingest); each query fans out to n_probe cells, so scored pairs
    shrink by ~k/n_probe versus brute force with recall rising in n_probe.
    """
    import numpy as np

    n_probe = resolve_n_probe(len(centroids), n_probe, recall_target)
    qids, Q = _collect_queries(
        queries, id_col, vec_col, dim=len(centroids[0]) if centroids else None
    )
    cb = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("c_vec"),
        "ivf_cell",
    )
    if qids:
        IC = np.array(centroids, dtype=np.float64)
        probed = sorted(
            {int(c) for row in np.argsort(-(Q @ IC.T), axis=1)[:, :n_probe] for c in row}
        )
        cb = cb.filter(F.col("ivf_cell").isin(probed))
    return _probe_topk(cb, qids, Q, centroids, k, n_probe)


def _guard_index_staleness(table, allow_stale: bool) -> None:
    """Fail loudly when live files are invisible to index probes (added
    after the last index commit, or restored from a pre-index snapshot):
    silently missing rows is the worst ANN failure mode. Metadata-only."""
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import (
        ann_index_stale_files,
    )

    stale = ann_index_stale_files(table)
    if stale and not allow_stale:
        raise ValueError(
            f"{len(stale)} live file(s) are not covered by the ANN index — "
            "their rows are invisible to index probes. Run "
            "maintenance.refresh_ann_indexes(table) (or rebuild), or pass "
            "allow_stale=True to knowingly probe only the indexed subset."
        )


def ivf_index_topk(
    table,
    queries: DataFrame,
    k: int = 3,
    n_probe: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_stale: bool = False,
    recall_target: float | None = None,
) -> DataFrame:
    """ANN top-k over a PERSISTED IVF index (lakehouse table prepared by
    ``maintenance.build_ivf_index``): the stored ``ivf_cell`` column plus
    file-level stats pruning mean a probe never re-assigns the corpus —
    only the files whose cell range intersects the probed cells are read.

    This is the 100 TB read path: index construction happens once in the
    maintenance op; a query's cost is O(files in n_probe cells), not
    O(corpus). Driver state stays bounded: the collected query set (capped)
    plus k x n_probe cell ids — never data-sized.
    """
    import json as _json

    import numpy as np

    _guard_index_staleness(table, allow_stale)
    centroids = _json.loads(table.log.properties["ivf.centroids"])
    n_probe = resolve_n_probe(len(centroids), n_probe, recall_target)
    qids, Q = _collect_queries(queries, id_col, vec_col, dim=len(centroids[0]))
    if not qids:
        return _probe_topk(table.scan().limit(0), qids, Q, centroids, k, n_probe)
    IC = np.array(centroids, dtype=np.float64)
    probed = sorted(
        {int(c) for row in np.argsort(-(Q @ IC.T), axis=1)[:, :n_probe] for c in row}
    )
    corpus = table.scan(stat_filter={"ivf_cell": ("in", probed)}).filter(
        F.col("ivf_cell").isin(probed)
    )
    cb = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("c_vec"),
        "ivf_cell",
    )
    return _probe_topk(cb, qids, Q, centroids, k, n_probe)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    within: str | None = "label",
    exact: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score >= threshold).

    ``within`` restricts comparisons to a blocking key (here: label), the
    same bucketing idea as LSH — never an unblocked all-pairs product.
    ``exact=False`` swaps the decimal fold for the ~5x-faster double fold —
    right for THRESHOLD consumers (semantic_dedup), where float error
    ~1e-7 cannot flip a comparison unless a pair sits exactly on the
    threshold; keep the default for anything hash-compared to an oracle.
    """
    dot = dot_product_exact if exact else dot_product_fast
    normed = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(dot(vec_col, vec_col)).alias("_norm"),
        *([within] if within else []),
    )
    a = normed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.col("_norm").alias("norm_a"),
        *([within] if within else []),
    )
    b = normed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.col("_norm").alias("norm_b"),
        *([within] if within else []),
    )
    joined = a.join(b, [within] if within else [F.lit(True)]).filter(F.col("id_a") < F.col("id_b"))
    return (
        joined.withColumn(
            "score",
            dot("vec_a", "vec_b") / (F.col("norm_a") * F.col("norm_b")),
        )
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def pq_train_local(
    df: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    cap: int = 2048,
    centroids: list[list[float]] | None = None,
    cell_col: str = "ivf_cell",
) -> list[list[list[float]]]:
    """Train product-quantization codebooks on a driver-collected BOUNDED
    sample: the vector is split into ``n_subspaces`` contiguous subvectors
    and each subspace gets its own ``n_codes``-entry L2 k-means codebook
    (classic PQ, Jégou et al.). Returns codebooks[s][c] = centroid vector.

    With ``centroids`` given (the IVF quantizer), codebooks are trained on
    RESIDUALS x/|x| - centroid[cell] — the FAISS IVFADC design: on clustered
    data the between-cluster variance lives in the coarse quantizer, so raw-
    vector codes would spend all 16 entries re-describing cluster centers
    and resolve nothing *within* a cell (measured: top-10 recall 0.05 on the
    scale harness's clustered corpus vs 0.9+ with residuals).

    Vectors are L2-normalized before training so ADC dot products rank like
    cosine. Same driver-state discipline as kmeans_refine_local: one
    bounded collect, numpy iterations, O(cap x dim) memory.
    """
    import numpy as np

    cols = [vec_col] + ([cell_col] if centroids is not None else [])
    rows = df.select(*cols).limit(cap).collect()
    # residual training has an authoritative dim (the IVF centroids');
    # raw training majority-votes over the sample (see _valid_vecs)
    rows, _ = _valid_vecs(
        rows, dim=len(centroids[0]) if centroids else None
    )
    if centroids is not None:
        rows = [r for r in rows if r[1] is not None]  # residual needs a cell
    if not rows:
        return []
    X = np.array([[float(v) for v in r[0]] for r in rows], dtype=np.float64)
    norms = np.sqrt((X * X).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    X = X / norms
    if centroids is not None:
        C = np.array(centroids, dtype=np.float64)
        X = X - C[np.array([int(r[1]) for r in rows])]
    dim = X.shape[1]
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    d = dim // n_subspaces
    books = []
    for s in range(n_subspaces):
        Xs = X[:, s * d : (s + 1) * d]
        # deterministic init: the first n_codes distinct-ish sample rows
        C = Xs[: min(n_codes, len(Xs))].copy()
        if len(C) < n_codes:  # degenerate tiny sample: pad by repetition
            C = np.resize(C, (n_codes, d))
        for _ in range(iters):
            # argmin ||x - c||^2 == argmax (2 x.c - |c|^2): one BLAS matmul,
            # no (n, codes, d) broadcast tensor
            scores = 2.0 * (Xs @ C.T) - (C * C).sum(axis=1)
            assign = np.argmax(scores, axis=1)
            sums, counts = _group_sums(assign, Xs, n_codes)
            nz = counts > 0  # empty codes keep their previous entry
            C[nz] = sums[nz] / counts[nz, None]
        books.append([[float(v) for v in row] for row in C])
    return books


def _pq_arrays(codebooks: list[list[list[float]]]):
    """(C, bias) numpy views of the codebooks: C (n_sub, n_codes, d) and
    bias (n_sub, n_codes) = -||c||^2/2, making argmax(<x_s,c> + bias) the
    L2-nearest entry."""
    import numpy as np

    C = np.array(codebooks, dtype=np.float64)
    return C, -0.5 * (C * C).sum(axis=2)


def _normalize_rows(X):
    import numpy as np

    norms = np.sqrt((X * X).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    return X / norms


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Encode each (normalized) vector as ``n_subspaces`` byte-small codes:
    per subspace, the L2-nearest codebook entry. Adds a ``pq_codes``
    array<int> column — at 100 TB this is the column a maintenance rewrite
    persists: 8 ints instead of 64 floats per vector (the same pattern as
    build_ivf_index's ivf_cell, with which it composes: IVF prunes cells,
    PQ makes in-cell scoring cheap).

    The kernel is a vectorized Arrow-batched pandas UDF (one einsum per
    batch) — the documented slow-path escape: Catalyst cannot constant-fold
    a codebook literal inside higher-order-function lambda bodies, so the
    expression form re-materializes all n_sub*n_codes centroids per row,
    while the numpy closure holds them once per executor.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n_sub, n_codes = len(codebooks), len(codebooks[0])
    d = len(codebooks[0][0])
    C, bias = _pq_arrays(codebooks)
    IC = np.array(centroids, dtype=np.float64) if centroids is not None else None

    # float32 scoring: the per-subspace argmax over a (batch x n_codes)
    # score matrix is memory-bandwidth-bound, and halving the element size
    # measured 7x on the encode kernel (111 ms vs 811 ms per 10k-row batch)
    # with identical code assignments — centroids are unit-scale, so f32's
    # 24-bit mantissa dwarfs the inter-code score gaps that matter
    C32 = [np.ascontiguousarray(c, dtype=np.float32) for c in C]
    bias32 = [np.asarray(b, dtype=np.float32) for b in bias]

    def _codes(X: "np.ndarray") -> "np.ndarray":
        # one subspace at a time: peak temp is (batch x n_codes), not the
        # (batch x n_sub x n_codes) einsum tensor — with 256 codes and a 10k
        # Arrow batch the latter is 655 MB per worker and thrashes the box.
        # The transpose-copy makes each subspace slice contiguous for BLAS.
        Xt = np.ascontiguousarray(
            X.reshape(len(X), n_sub, d).transpose(1, 0, 2), dtype=np.float32
        )
        codes = np.empty((len(X), n_sub), dtype=np.int32)
        for s in range(n_sub):
            codes[:, s] = (Xt[s] @ C32[s].T + bias32[s]).argmax(axis=1)
        return codes

    if IC is not None:

        @pandas_udf("array<int>")
        def encode_residual(v: pd.Series, cell: pd.Series) -> pd.Series:
            from pyiceberg_lakehouse_spark.functions.dense import _rows_masked

            X, mask = _rows_masked(v, IC.shape[1])
            mask &= cell.notna().to_numpy()
            out = [None] * len(v)
            if mask.any():
                idx = np.flatnonzero(mask)
                Xv = _normalize_rows(
                    np.array([v.iloc[i] for i in idx], dtype=np.float64)
                )
                Xv = Xv - IC[cell.iloc[idx].to_numpy(dtype=np.int64)]
                for i, code in zip(idx, _codes(Xv)):
                    out[i] = list(code)
            return pd.Series(out)

        return df.withColumn(
            "pq_codes", encode_residual(F.col(vec_col), F.col(cell_col))
        )

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        from pyiceberg_lakehouse_spark.functions.dense import _rows_masked

        # the codebooks fix the dim statically; inferring it per batch let
        # a mis-dimensioned first row mask out every valid row and crash
        # _codes' reshape on the poison ones (ADVICE r7)
        X, mask = _rows_masked(v, n_sub * d)
        out = [None] * len(v)
        if X.size:
            for i, code in zip(np.flatnonzero(mask), _codes(_normalize_rows(X))):
                out[i] = list(code)
        return pd.Series(out)

    return df.withColumn("pq_codes", encode(F.col(vec_col)))


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: each query precomputes a
    lookup table of <q_s, codebook[s][c]> for every subspace entry (one
    n_sub*n_codes float array riding the broadcast), and scoring a corpus
    vector is ``n_subspaces`` LUT gathers instead of a full-dimension dot —
    with the corpus side reading only the small code column, never the
    embeddings. LUT build and gather are vectorized Arrow-batched pandas
    UDFs (see pq_encode for why not expression HOFs). Scores approximate
    cosine (vectors normalized at encode time); recall is sketch-dependent
    and pytest-checked vs cosine_topk.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n_sub, n_codes = len(codebooks), len(codebooks[0])
    d = len(codebooks[0][0])
    C, _ = _pq_arrays(codebooks)

    @pandas_udf("array<double>")
    def lut(v: pd.Series) -> pd.Series:
        from pyiceberg_lakehouse_spark.functions.dense import _rows_masked

        X, mask = _rows_masked(v, n_sub * d)
        out = [None] * len(v)
        if X.size:
            Q = _normalize_rows(X)
            Qs = Q.reshape(len(Q), n_sub, d)
            tables = np.einsum("nsd,scd->nsc", Qs, C).reshape(
                len(Q), n_sub * n_codes
            )
            for i, t in zip(np.flatnonzero(mask), tables):
                out[i] = list(t)
        return pd.Series(out)

    @pandas_udf("double")
    def adc(codes: pd.Series, tables: pd.Series) -> pd.Series:
        cvals, tvals = codes.tolist(), tables.tolist()
        valid = [
            i
            for i in range(len(cvals))
            if cvals[i] is not None and tvals[i] is not None
        ]
        out = np.full(len(cvals), np.nan)
        if valid:
            Cm = np.array([cvals[i] for i in valid], dtype=np.int64)
            L = np.array([tvals[i] for i in valid], dtype=np.float64)
            idx = Cm + (np.arange(n_sub) * n_codes)[None, :]
            out[valid] = np.take_along_axis(L, idx, axis=1).sum(axis=1)
        return pd.Series(out)

    qb = F.broadcast(
        queries.select(F.col(id_col).alias("qid"), lut(F.col(vec_col)).alias("_lut"))
    )
    scored = (
        corpus_codes.select(F.col(id_col).alias("vid"), "pq_codes")
        .join(qb, F.col("qid") != F.col("vid"))
        .withColumn("score", adc(F.col("pq_codes"), F.col("_lut")))
        .filter(~F.isnan("score"))  # see lsh_topk: NaN sorts greatest
        .select("qid", "vid", "score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", "rank", "score")
    )


def ivf_pq_topk(
    table,
    queries: DataFrame,
    k: int = 3,
    n_probe: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_factor: int | None = None,
    allow_stale: bool = False,
    recall_target: float | None = None,
) -> DataFrame:
    """The full persisted-index ANN read path: IVF cells prune FILES
    (stats IN-list on the stored ``ivf_cell``), PQ codes make scoring the
    surviving candidates cheap (ADC lookup tables over the stored 8-int
    ``pq_codes``) — the ADC pass never reads the corpus embeddings.
    Requires ``build_ivf_index`` + ``build_pq_index`` to have run.

    ``rerank_factor`` (``None`` = resolve from ``recall_target`` via the
    measured ``_RECALL_RERANKS`` anchors, defaulting to 16) > 0 adds the
    FAISS refine stage (IndexRefineFlat):
    the ADC top ``k * rerank_factor`` per query are re-scored EXACTLY from
    their stored vectors — a bounded point read (<= Q x k x factor rows,
    IN-list-pruned scan), after which top-k is exact within the candidate
    set. Quantized codes alone cannot rank near-identical in-cell
    neighbors (measured on the scale harness's worst-case isotropic
    corpus: ADC-only top-10 recall 0.04-0.08; with rerank 16, recall 0.81
    at 16 subspaces and 0.99 at 32); the ADC pass's job is shrinking
    n_probe cells of candidates to k x factor, which it does at
    code-column IO cost. The full measured dial at 10M vectors / 32
    subspaces / auto probe width (PROBE_SWEEP.json ivfpq_rerank_curve):
    rerank 0 -> 0.45, 4 -> 0.73, 16 -> 0.96, 32 -> 1.00 recall@10 — so
    rerank_factor, not probe width, is the recall knob past the ADC
    plateau, at ~linear wall cost in the factor.
    ``rerank_factor=0`` gives pure ADC ranking —
    note the ADC kernel accumulates in float32 (LUT + residual term both
    downcast for memory bandwidth), so with the refine stage disabled the
    returned scores carry f32 precision emitted as double and tie-order
    near equal scores can differ from the exact f64 path; with the default
    refine stage the output scores are exact float64.

    This is the FAISS IVF-PQ(+refine) architecture expressed on lakehouse
    metadata: query cost is O(files in n_probe cells) IO on a code column
    ~32x smaller than the vectors, plus n_subspaces LUT adds per
    candidate, plus the bounded refine read.
    """
    import json as _json

    import numpy as np

    _guard_index_staleness(table, allow_stale)
    centroids = _json.loads(table.log.properties["ivf.centroids"])
    # one dial drives both stages: recall_target resolves the probe width
    # AND the refine factor from their measured curves (the ADC stage
    # plateaus at ~0.963, so targets above it must widen the REFINE stage,
    # not the probe — see _RECALL_RERANKS). Explicit n_probe/rerank_factor
    # values still win.
    n_probe = resolve_n_probe(len(centroids), n_probe, recall_target)
    rerank_factor = resolve_rerank_factor(rerank_factor, recall_target)
    books = _json.loads(table.log.properties["pq.codebooks"])
    residual = table.log.properties.get("pq.residual") == "true"
    n_sub, n_codes = len(books), len(books[0])
    d = len(books[0][0])
    C, _ = _pq_arrays(books)
    IC = np.array(centroids, dtype=np.float64)
    spark = queries.sparkSession

    # The query set is small by definition: collect it once (same bounded-
    # driver-state cap as cosine_topk(exact=False)) and do probe selection +
    # LUT construction in numpy. The LUTs then ride the mapInPandas CLOSURE
    # (shipped once per task) instead of a 8*n_codes-double array column on
    # every candidate row — the join form moved ~65 KB of LUT per candidate
    # through Arrow, which at 1M rows was GBs of pure overhead.
    qrows = queries.select(id_col, vec_col).limit(65_537).collect()
    if len(qrows) > 65_536:
        raise ValueError(
            "ivf_pq_topk collects the query set to the driver; cap is 65536 "
            "rows — run corpus-scale query sets in batches"
        )
    # poison queries (NULL / mis-dimensioned vectors) drop out, same
    # contract as every sibling probe path; the codebooks give the
    # authoritative dim (ADVICE r7: a NULL query vector crashed the
    # driver-side float() loop here)
    qrows, _ = _valid_vecs(qrows, vec_idx=1, dim=n_sub * d)
    if not qrows:
        return local_rows_df(spark,
            [], "qid long, vid long, rank int, score double"
        )
    qids = np.array([int(r[0]) for r in qrows])
    Q = _normalize_rows(
        np.array([[float(x) for x in r[1]] for r in qrows], dtype=np.float64)
    )
    nq = len(qids)
    cell_scores = Q @ IC.T  # (nq, n_cells) — same quantizer as ivf_assign
    plists = np.argsort(-cell_scores, axis=1)[:, :n_probe]
    probed = sorted({int(c) for row in plists for c in row})
    # float32 LUT: the per-batch fancy-index gather + sum is memory-
    # bandwidth-bound (same finding as the pq_encode kernel — f32 measured
    # ~7x there); ADC scores are candidate-selection only under the default
    # refine stage, whose exact float64 re-rank produces the output scores
    LUT = np.empty((nq, n_sub, n_codes), dtype=np.float32)
    Qs = Q.reshape(nq, n_sub, d)
    for s in range(n_sub):
        LUT[:, s, :] = Qs[:, s, :] @ C[s].T
    # residual decomposition: cos(q, x) = <qn, centroid[cell]> + <qn, r>
    qc = (cell_scores if residual else np.zeros_like(cell_scores)).astype(
        np.float32
    )
    m = k * (rerank_factor if rerank_factor > 0 else 1)
    offsets = (np.arange(n_sub) * n_codes)[None, :]
    plist_arrs = [np.asarray(p) for p in plists]

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(pdf["pq_codes"].tolist(), dtype=np.int64)
            cells = pdf["ivf_cell"].to_numpy(dtype=np.int64)
            vids_b = pdf["vid"].to_numpy(dtype=np.int64)
            flat_idx = codes + offsets  # (n, n_sub)
            # chunk queries so the fancy-index gather's (chunk, n, n_sub)
            # intermediate stays under _SCORE_MATRIX_BYTES — near the
            # 65536-query cap an unchunked gather is many GB per batch
            chunk = max(1, _SCORE_MATRIX_BYTES // (8 * flat_idx.size))
            LUT_flat = LUT.reshape(nq, -1)
            for q0 in range(0, nq, chunk):
                q1 = min(q0 + chunk, nq)
                # vectorized ADC gather: (chunk, n) scores via one fancy index
                G = LUT_flat[q0:q1][:, flat_idx].sum(axis=2)
                for qi in range(q0, q1):
                    mask = np.isin(cells, plist_arrs[qi]) & (vids_b != qids[qi])
                    if not mask.any():
                        continue
                    s = G[qi - q0, mask] + qc[qi, cells[mask]]
                    vv = vids_b[mask]
                    order = np.lexsort((vv, -s))[:m]  # local top-m, global-window tie rules
                    yield pd.DataFrame(
                        {"qid": qids[qi], "vid": vv[order], "score": s[order]}
                    )

    corpus = (
        table.scan(stat_filter={"ivf_cell": ("in", probed)})
        .filter(F.col("ivf_cell").isin(probed))
        .select(F.col(id_col).alias("vid"), "ivf_cell", "pq_codes")
    )
    scored = corpus.mapInPandas(score_batches, "qid long, vid long, score double")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vid"))
    if rerank_factor <= 0:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "vid", "rank", "score")
        )
    # FAISS refine: exact re-score of the ADC top k*factor. The collect
    # is bounded by Q x k x factor pairs (never data-sized) and feeds an
    # IN-list-pruned point read of just those vectors.
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
        .select("qid", "vid")
        .collect()
    )
    from pyiceberg_lakehouse_spark.functions import dense

    vids = sorted({r.vid for r in cand})
    pairs = local_rows_df(spark,
        [(r.qid, r.vid) for r in cand], "qid long, vid long"
    )
    # candidates live in probed cells by construction, and files are
    # clustered by cell — so the refine read prunes by ivf_cell FIRST
    # (vec_id ranges span every file and prune nothing on their own)
    vecs = (
        table.scan(
            stat_filter={"ivf_cell": ("in", probed), id_col: ("in", vids)}
        )
        .filter(F.col(id_col).isin(vids))
        .select(F.col(id_col).alias("vid"), F.col(vec_col).alias("c_vec"))
    )
    qv = local_rows_df(spark,
        [(int(r[0]), [float(x) for x in r[1]]) for r in qrows],
        "qid long, q_vec array<double>",
    )
    rescored = (
        vecs.join(F.broadcast(pairs), "vid")
        .join(F.broadcast(qv), "qid")
        .withColumn("score", dense.cosine_pair("q_vec", "c_vec"))
        .filter(~F.isnan("score"))  # see lsh_topk: NaN sorts greatest
        .select("qid", "vid", "score")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", "rank", "score")
    )


def _group_sums(assign, X, n_groups):
    """Per-group (sums, counts) of X rows grouped by assign — dim bincount
    passes instead of n_groups boolean-mask scans. The mask form cost
    O(n_groups * n) per iteration and dominated pq_train_local (measured
    ~19s of a 44s train at 32 subspaces x 256 codes); this is O(dim * n)."""
    import numpy as np

    counts = np.bincount(assign, minlength=n_groups).astype(np.float64)
    sums = np.stack(
        [
            np.bincount(assign, weights=X[:, j], minlength=n_groups)
            for j in range(X.shape[1])
        ],
        axis=1,
    )
    return sums, counts


def kmeans_refine_local(
    df: DataFrame,
    centroids: list[list[float]],
    iters: int = 3,
    vec_col: str = "embedding",
    cap: int = 2048,
) -> list[list[float]]:
    """Lloyd refinement on a driver-collected BOUNDED sample (numpy).

    ONE bounded collect (``cap`` x dim floats — the same driver-state class
    as a bloom bitmap), then the iterations are pure numpy: no Spark job,
    no k x dim literal plan per round. This is the index-construction fast
    path — k-means on a sample converges the same centroids for recall
    purposes, and the cap keeps driver memory constant no matter the corpus
    size. For samples beyond driver scale, the distributed ``kmeans_refine``
    below runs the identical update rule as Spark jobs.

    Same quantizer as ``ivf_assign`` (max dot product); empty cells keep
    their previous centroid; outputs are unit-normalized.
    """
    import numpy as np

    rows = df.select(vec_col).limit(cap).collect()
    # the seed centroids' dim is authoritative for the refinement sample
    rows, _ = _valid_vecs(
        rows, dim=len(centroids[0]) if centroids else None
    )
    if not rows:
        return [list(c) for c in centroids]
    X = np.array([[float(v) for v in r[0]] for r in rows], dtype=np.float64)
    C = np.array(centroids, dtype=np.float64)
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        sums, counts = _group_sums(assign, X, C.shape[0])
        nz = counts > 0  # empty cells keep their previous centroid
        means = sums[nz] / counts[nz, None]
        norms = np.sqrt((means * means).sum(axis=1, keepdims=True))
        norms[norms == 0.0] = 1.0
        C[nz] = means / norms
    return [[float(v) for v in row] for row in C]


def kmeans_refine(
    df: DataFrame,
    centroids: list[list[float]],
    iters: int = 3,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd iterations to refine IVF centroids on the full corpus.

    Each round: assign (broadcast argmax, same codegen path as ivf_assign),
    then average member vectors per cell — posexplode to (cell, dim, value)
    rows, one groupBy, and a k×dim collect. Driver state stays k×dim floats
    regardless of corpus size, so the loop is cluster-safe at 100 TB; iters
    is fixed and small (diminishing recall returns beyond a few rounds).
    Empty cells keep their previous centroid.
    """
    k = len(centroids)
    for _ in range(iters):
        assigned = ivf_assign(df, centroids, vec_col=vec_col)
        sums = (
            assigned.select("ivf_cell", F.posexplode(F.col(vec_col)).alias("dim", "v"))
            .groupBy("ivf_cell", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new_cents = [list(c) for c in centroids]
        by_cell: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cell.setdefault(r.ivf_cell, {})[r.dim] = r.m
        for cell, dims in by_cell.items():
            if 0 <= cell < k:
                vec = [dims.get(d, 0.0) for d in range(len(centroids[cell]))]
                norm = sum(x * x for x in vec) ** 0.5 or 1.0
                new_cents[cell] = [x / norm for x in vec]
        centroids = new_cents
    return centroids


def range_search(
    corpus: DataFrame,
    queries: DataFrame,
    radius: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS-style range search: every corpus vector within a cosine
    ``radius`` of each query — top-k's sibling for radius-bounded retrieval
    (dedup candidates, recall sweeps, density probes).

    Same scale shape as :func:`cosine_topk`: the query set broadcasts, the
    corpus is scanned once and never shuffled — and with no per-query
    window at all, the only exchange in the plan is whatever the sink
    needs. Scores accumulate in decimal (dot_product_exact) so results are
    bit-identical to the SQL oracle."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("c_vec")
    )
    scored = c.join(F.broadcast(q), F.col("qid") != F.col("vid")).select(
        "qid",
        "vid",
        (
            dot_product_exact("q_vec", "c_vec")
            / (
                F.sqrt(dot_product_exact("q_vec", "q_vec"))
                * F.sqrt(dot_product_exact("c_vec", "c_vec"))
            )
        ).alias("score"),
    )
    return scored.filter(F.col("score") >= F.lit(radius))


def ivf_index_range_search(
    table,
    queries: DataFrame,
    radius: float,
    n_probe: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_stale: bool = False,
    recall_target: float | None = None,
) -> DataFrame:
    """Radius retrieval over a PERSISTED IVF index — :func:`range_search`'s
    scale path, sharing :func:`ivf_index_topk`'s probe machinery: probed
    cells come from the stored centroids, file-level stats pruning scans
    only those cells' files, and the exact (decimal) cosine + radius
    filter runs on the candidates alone. Approximation is the standard IVF
    trade: in-radius vectors living in unprobed cells are missed, governed
    by the same recall-targeted ``n_probe`` dial as top-k."""
    import json as _json

    import numpy as np

    _guard_index_staleness(table, allow_stale)
    centroids = _json.loads(table.log.properties["ivf.centroids"])
    n_probe = resolve_n_probe(len(centroids), n_probe, recall_target)
    qids, Q = _collect_queries(queries, id_col, vec_col, dim=len(centroids[0]))
    if not qids:
        return range_search(
            table.scan().limit(0), queries.limit(0), radius, id_col, vec_col
        )
    IC = np.array(centroids, dtype=np.float64)
    probed = sorted(
        {int(c) for row in np.argsort(-(Q @ IC.T), axis=1)[:, :n_probe] for c in row}
    )
    corpus = table.scan(stat_filter={"ivf_cell": ("in", probed)}).filter(
        F.col("ivf_cell").isin(probed)
    )
    return range_search(corpus, queries, radius, id_col, vec_col)
