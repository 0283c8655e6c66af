"""session_tmpdir: per-process root + stale-sibling sweep (VERDICT r7 #4).

A SIGKILL'd gate never runs atexit; the next process's first
session_tmpdir call must remove the orphaned root — by dead owning pid
immediately, or by age for unparseable/recycled ids.
"""

import os
import shutil
import subprocess
import sys
import tempfile
import time

from pyiceberg_lakehouse_spark import tmpdirs


def _run_child(code: str) -> str:
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()


def test_tmpdir_lives_under_process_root_and_atexit_sweeps():
    out = _run_child(
        "from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir\n"
        "p = session_tmpdir('unit_')\n"
        "import os; assert os.path.isdir(p)\n"
        "print(p)"
    )
    assert f"lhtmp-" in out
    # the whole root (parent of the scratch dir) is gone after clean exit
    assert not os.path.exists(os.path.dirname(out))


def test_sigkill_orphan_swept_by_next_process():
    base = tempfile.gettempdir()
    # child creates a scratch dir then SIGKILLs itself (no atexit)
    child = subprocess.run(
        [
            sys.executable,
            "-c",
            "from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir\n"
            "import os, signal\n"
            "print(session_tmpdir('lakehouse_q_'), flush=True)\n"
            "os.kill(os.getpid(), signal.SIGKILL)",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    orphan = child.stdout.strip()
    root = os.path.dirname(orphan)
    assert os.path.isdir(root), "orphan root must survive the SIGKILL"
    # a fresh process's first session_tmpdir call sweeps it (dead pid)
    _run_child(
        "from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir\n"
        "session_tmpdir('x_')"
    )
    assert not os.path.exists(root)


def test_live_pid_root_never_age_swept():
    """ADVICE r8: sessions routinely exceed 1h and scratch dirs back live
    lazy DataFrames — a root whose owning pid is ALIVE must survive the
    sweep regardless of age."""
    base = tempfile.gettempdir()
    live = os.path.join(base, f"lhtmp-{os.getpid()}-livetest")
    os.makedirs(live, exist_ok=True)
    old = time.time() - 3 * 3600
    os.utime(live, (old, old))
    try:
        _run_child(
            "from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir\n"
            "session_tmpdir('x_')"
        )
        assert os.path.exists(live), "live-pid root must never be age-swept"
    finally:
        shutil.rmtree(live, ignore_errors=True)


def test_age_sweep_for_unparseable_roots():
    base = tempfile.gettempdir()
    stale = os.path.join(base, "lhtmp-notapid-zzz")
    os.makedirs(stale, exist_ok=True)
    old = time.time() - 2 * 3600
    os.utime(stale, (old, old))
    fresh = os.path.join(base, "lhtmp-notapid-fresh")
    os.makedirs(fresh, exist_ok=True)
    try:
        _run_child(
            "from pyiceberg_lakehouse_spark.tmpdirs import session_tmpdir\n"
            "session_tmpdir('x_')"
        )
        assert not os.path.exists(stale), "old unparseable root swept by age"
        assert os.path.exists(fresh), "fresh root with live-ambiguous pid kept"
    finally:
        shutil.rmtree(fresh, ignore_errors=True)
        shutil.rmtree(stale, ignore_errors=True)
