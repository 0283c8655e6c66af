"""Docs may only claim "driver-hashed/green" for queries with a real
driver row (VERDICT r10 task #4: COVERAGE.md called `lh_table_changes`
driver-hashed when it had never appeared in any driver window).

Every `query_name` adjacent to a driver-evidence phrase in COVERAGE.md /
README.md must be hash-green in at least one CORRECTNESS_r*.json.
Post-freeze code must be worded "local-verified, driver pending" (or
similar) instead.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CLAIM_NEAR = r"driver[- ](?:hashed|green|verified|proven)"


def _driver_green() -> set[str]:
    green: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, r in json.loads(f.read_text()).items():
            if r.get("hash_match"):
                green.add(name)
    return green


def test_docs_never_overstate_driver_evidence():
    green = _driver_green()
    assert green, "no CORRECTNESS files found"
    offenders: dict[str, list[str]] = {}
    for doc in ("COVERAGE.md", "README.md"):
        path = REPO / doc
        if not path.exists():
            continue
        txt = path.read_text()
        claimed: set[str] = set()
        for m in re.finditer(CLAIM_NEAR + r"[^`]{0,80}`([a-z0-9_]+)`", txt):
            claimed.add(m.group(1))
        for m in re.finditer(r"`([a-z0-9_]+)`[^`]{0,60}" + CLAIM_NEAR, txt):
            claimed.add(m.group(1))
        bad = sorted(c for c in claimed if "_" in c and c not in green)
        if bad:
            offenders[doc] = bad
    assert not offenders, (
        f"docs claim driver evidence for queries with no hash-green driver "
        f"row: {offenders} — reword as 'local-verified, driver pending'"
    )


def test_coverage_header_counts_match_registry():
    """VERDICT r13 task #7: the COVERAGE.md header's "X of Y
    oracle-checked" numbers must equal the live registry's
    len(oracle_sql()) / len(queries()) so the count can't silently
    drift again (it said 229/238 while the registry was 249/258)."""
    from pyiceberg_lakehouse_spark import registry

    registry.load_all()
    txt = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"\((\d+) of (\d+) oracle-checked", txt)
    assert m, "COVERAGE.md header lost its 'X of Y oracle-checked' phrase"
    got_oracle, got_total = int(m.group(1)), int(m.group(2))
    assert (got_oracle, got_total) == (len(registry.ORACLE), len(registry.QUERIES)), (
        f"COVERAGE.md header says {got_oracle}/{got_total} but the registry "
        f"is {len(registry.ORACLE)}/{len(registry.QUERIES)} — update the header"
    )
