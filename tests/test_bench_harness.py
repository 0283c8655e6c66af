"""bench.py harness self-checks (no Spark session needed)."""

from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_prev_round_skips_other_core_count_records(monkeypatch):
    """r19 (VERDICT r18 what's-wrong #3): the previous-round record used
    for the self-reported comparable-wall ratio must be an exact
    BENCH_r<N>.json whose recorded core count matches this run's — the
    old reverse-sorted glob picked the driver's 8-core scaling record
    BENCH_r18_c8.json over BENCH_r18.json."""
    bench = _load_bench()
    if not (REPO / "BENCH_r18_c8.json").exists():
        import pytest

        pytest.skip("no low-core scaling record in this checkout")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    name, parsed = bench._prev_round()
    assert name is not None and "_c" not in name, name
    assert name.startswith("BENCH_r") and name.endswith(".json")
    assert parsed and parsed.get("queries")


def test_prev_round_matches_low_core_record_at_8(monkeypatch):
    bench = _load_bench()
    import json

    rec = REPO / "BENCH_r18_c8.json"
    if not rec.exists() or json.load(open(rec)).get("cpus") != 8:
        import pytest

        pytest.skip("no 8-core record in this checkout")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    name, parsed = bench._prev_round()
    # only exact BENCH_r<N>.json names are eligible; the _c8 scaling
    # record never is, so an 8-core run skips records of other core
    # counts and may find none at all
    assert name is None or "_c" not in name
