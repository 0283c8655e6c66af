"""Registry-wide strict differential: dtype parity + exact values.

Round 10 shipped its one red driver row ("dedup_substring_spans",
hash_match=false) because the oracle's DuckDB integer ``sum()`` surfaced
as HUGEINT -> pandas float64 while Spark returned int64 — the driver's
value hash distinguishes 5 from 5.0, but the old local gate compared with
Python ``==`` where 5 == 5.0.  This test runs EVERY oracle-checkable
registered query through tools/verify_local.run() at sf0.001 with the
type-strict canonicalizer (int != float, NaN != NULL, per-column
int/float pandas-dtype family check), so a new oracle with a
driver-visible dtype asymmetry fails in pytest, not in a driver window
(VERDICT r10 task #2: restore "local-green implies driver-green").
"""

from __future__ import annotations

import sys

import pytest
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


# slow: the full-registry strict differential duplicates the driver's
# oracle pass and tools/verify_local.py (337 s measured r19);
# excluded from the default verify gate, run via -m slow.
pytestmark = pytest.mark.slow

def test_registry_strict_differential_sf0001(spark, sf_dir):
    import verify_local

    passed, failed, rows_only = verify_local.run(sf_dir, quiet=True)
    msg = "\n".join(f"{name}: {why}" for name, why in failed)
    assert not failed, f"strict differential failures at {sf_dir}:\n{msg}"
    # the oracle-checkable corpus must stay the dominant evidence class
    assert len(passed) >= 200
    assert len(rows_only) <= 15
