"""Shared helpers for the executor-SIGKILL chaos drivers
(tests/test_local_cluster_loss.py).  The five scenario drivers run as
SUBPROCESSES (one SparkContext per process) and previously each
inlined this ps-parsing / fleet-wait / heal-check boilerplate in its
embedded template — a pid-filter fix then had to be applied five
times or the scenarios silently diverged in which processes they
kill (r12 review finding)."""

from __future__ import annotations

import subprocess
import time


def executor_pids() -> list[int]:
    """PIDs of live CoarseGrainedExecutorBackend JVMs.

    Executor backends are java children of the in-process standalone
    worker; the driver's own ``python -c <code>`` command line ALSO
    contains the class name, so require a java process and exclude
    python ones."""
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    return [
        int(line.split(None, 1)[0])
        for line in out.splitlines()
        if "CoarseGrainedExecutorBackend" in line
        and "java" in line
        and "python" not in line
    ]


def wait_for_fleet(n: int = 2, tries: int = 60) -> list[int]:
    """Block until ``n`` executor JVMs are registered; assert + return."""
    pids: list[int] = []
    for _ in range(tries):
        pids = executor_pids()
        if len(pids) >= n:
            return pids
        time.sleep(1)
    raise AssertionError(f"executors never came up: {pids}")


def wait_for_heal(killed_pid: int, n: int = 2, tries: int = 60) -> list[int]:
    """Block until the victim pid is gone AND the worker's replacement
    brought the fleet back to ``n`` — the loss must be REAL and HEALED
    or the exact-match assertion upstream could be vacuous."""
    alive: list[int] = []
    for _ in range(tries):
        alive = executor_pids()
        if killed_pid not in alive and len(alive) >= n:
            break
        time.sleep(1)
    assert killed_pid not in alive, "victim executor still alive"
    assert len(alive) >= n, f"replacement executor never joined: {alive}"
    return alive
