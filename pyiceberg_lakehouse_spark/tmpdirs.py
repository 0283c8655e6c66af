"""Session-scoped temp directories with guaranteed cleanup.

Lifecycle queries (``lh_*`` / ``stream_lh_*``) build throwaway warehouses
under /tmp and return LAZY DataFrames — the caller evaluates them after the
query function returns, so the directory must outlive the function but not
the process. ``session_tmpdir`` registers every path in one process-wide
list swept at interpreter exit: repeated verification runs leave /tmp flat
instead of leaking a warehouse copy per query (ADVICE r6 #2).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_TRACKED: list[str] = []


def _sweep() -> None:
    while _TRACKED:
        shutil.rmtree(_TRACKED.pop(), ignore_errors=True)


def session_tmpdir(prefix: str) -> str:
    """``tempfile.mkdtemp`` that is deleted at interpreter exit.

    Use for any scratch dir whose contents back a lazily-evaluated
    DataFrame; use a plain ``TemporaryDirectory`` when the lifetime is
    function-scoped.
    """
    if not _TRACKED:
        atexit.register(_sweep)
    path = tempfile.mkdtemp(prefix=prefix)
    _TRACKED.append(path)
    return path
