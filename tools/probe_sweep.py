"""Sweep ANN probe width at corpus scale: recall@k + probe wall per n_probe,
for BOTH the IVF (exact in-cell scoring) and IVF-PQ (ADC + refine) read
paths.

The recall-targeted auto-probe rule (similarity.resolve_n_probe) is
calibrated from this curve, not guessed: the shipped policy
``max(16, ceil(sqrt(cells)/2))`` must sit at-or-right-of the recall
saturation knee on both paths. The IVF-PQ path interacts with n_probe
differently — its refine stage re-reads k*rerank_factor exact vectors per
query regardless of n_probe, so its wall has a floor the IVF path lacks,
while its ADC candidate pass scales with probed rows the same way.

Writes PROBE_SWEEP.json (repo root) and prints each point as it lands.

Run:  python tools/probe_sweep.py [n_rows]     (default 10_000_000)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import functions as F  # noqa: E402

from pyiceberg_lakehouse_spark.session import get_spark  # noqa: E402
from pyiceberg_lakehouse_spark.sources.synthetic import mock_embeddings  # noqa: E402

N_QUERIES, TOP_K = 8, 10
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PROBE_SWEEP.json"
)


def sweep(probe_fn, widths, k_cells, brute) -> list[dict]:
    points = []
    for n_probe in widths:
        if n_probe > k_cells:
            continue
        got = None
        runs = []
        for rep in range(4):  # first run is the untimed warmup
            t0 = time.time()
            got = probe_fn(n_probe)
            if rep:
                runs.append(round(time.time() - t0, 3))
        point = {
            "n_probe": n_probe,
            "recall": round(len(got & brute) / len(brute), 3),
            "sec": round(statistics.median(runs), 3),
            "samples": runs,
        }
        points.append(point)
        print(json.dumps(point), flush=True)
    return points


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import (
        build_ivf_index,
        build_pq_index,
    )
    from pyiceberg_lakehouse_spark.operators import similarity

    spark = get_spark("probe_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="probe_sweep_")
    try:
        lh = Lakehouse(spark, tmp)
        emb = mock_embeddings(spark, n)
        t = lh.create_table("sweep.emb", emb.schema)
        t.append(emb)
        k_cells = similarity.default_n_cells(n)
        auto_np = similarity.resolve_n_probe(k_cells, None)
        build_ivf_index(t, k=k_cells, sample_cap=max(4096, 8 * k_cells))
        build_pq_index(t, n_subspaces=32)
        queries = t.scan().filter(F.col("vec_id") < N_QUERIES).select(
            "vec_id", "embedding"
        )
        brute = {
            (r.qid, r.vid)
            for r in similarity.cosine_topk(
                t.scan().select("vec_id", "embedding"), queries, k=TOP_K, exact=False
            ).collect()
        }
        widths = sorted({4, 8, 12, 16, 25, 39, auto_np, min(61, k_cells)})

        print(f"--- ivf curve ({k_cells} cells, auto n_probe {auto_np})", flush=True)
        ivf_points = sweep(
            lambda p: {
                (r.qid, r.vid)
                for r in similarity.ivf_index_topk(
                    t, queries, k=TOP_K, n_probe=p
                ).collect()
            },
            widths,
            k_cells,
            brute,
        )
        print("--- ivfpq curve (ADC + refine 16)", flush=True)
        ivfpq_points = sweep(
            lambda p: {
                (r.qid, r.vid)
                for r in similarity.ivf_pq_topk(
                    t, queries, k=TOP_K, n_probe=p
                ).collect()
            },
            widths,
            k_cells,
            brute,
        )
        # the OTHER IVF-PQ recall dial: at the auto probe width, sweep the
        # refine stage's rerank_factor — the ADC+rerank plateau moves with
        # it (k*factor exact re-scores per query), while n_probe past the
        # knee buys nothing (see ivfpq_curve)
        print("--- ivfpq rerank curve (auto probe width)", flush=True)
        rerank_points = []
        for factor in (0, 4, 16, 32, 64):
            got, runs = None, []
            for rep in range(3):
                t0 = time.time()
                got = {
                    (r.qid, r.vid)
                    for r in similarity.ivf_pq_topk(
                        t, queries, k=TOP_K, n_probe=auto_np, rerank_factor=factor
                    ).collect()
                }
                if rep:
                    runs.append(round(time.time() - t0, 3))
            point = {
                "rerank_factor": factor,
                "recall": round(len(got & brute) / len(brute), 3),
                "sec": round(statistics.median(runs), 3),
                "samples": runs,
            }
            rerank_points.append(point)
            print(json.dumps(point), flush=True)

        out = {
            "rows": n,
            "cells": k_cells,
            "top_k": TOP_K,
            "auto_n_probe": auto_np,
            "curve": ivf_points,
            "ivfpq_curve": ivfpq_points,
            "ivfpq_rerank_curve": rerank_points,
        }
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({"wrote": OUT, "cells": k_cells, "auto_n_probe": auto_np}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
