"""Sweep IVF probe width at corpus scale: recall@k + probe wall per n_probe.

The auto-probe rule (similarity.resolve_n_probe) trades probe time for
recall as the cell count grows; this sweep measures the actual
recall-vs-cost curve on the scale corpus so the rule's fraction is chosen
from data, not guessed. Writes one JSON line; does NOT touch
BENCH_SCALE.json.

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

CELL_ROWS = 16_384
N_QUERIES, TOP_K = 8, 10


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pyiceberg_lakehouse_spark.lakehouse import Lakehouse
    from pyiceberg_lakehouse_spark.lakehouse.maintenance import build_ivf_index
    from pyiceberg_lakehouse_spark.operators import similarity

    spark = get_spark("probe_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="probe_sweep_")
    try:
        lh = Lakehouse(spark, tmp)
        emb = mock_embeddings(spark, n)
        t = lh.create_table("sweep.emb", emb.schema)
        t.append(emb)
        k_cells = max(16, n // CELL_ROWS)
        build_ivf_index(t, k=k_cells, sample_cap=max(4096, 8 * k_cells))
        queries = t.scan().filter(F.col("vec_id") < N_QUERIES).select(
            "vec_id", "embedding"
        )
        brute = {
            (r.qid, r.vid)
            for r in similarity.cosine_topk(
                t.scan(), queries, k=TOP_K, exact=False
            ).collect()
        }
        points = []
        for n_probe in (4, 8, 12, 16, 25, 39, 61):
            if n_probe > k_cells:
                continue
            got = None
            runs = []
            for rep in range(4):  # first run is the untimed warmup
                t0 = time.time()
                got = {
                    (r.qid, r.vid)
                    for r in similarity.ivf_index_topk(
                        t, queries, k=TOP_K, n_probe=n_probe
                    ).collect()
                }
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
        print(
            json.dumps(
                {"rows": n, "cells": k_cells, "top_k": TOP_K, "curve": points}
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
