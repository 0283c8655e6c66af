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
