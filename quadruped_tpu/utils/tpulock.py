"""Single-chip TPU arbitration lock (VERDICT r2 #3).

Round 2's driver bench produced no number because a 100M-step training
run held the one TPU chip when the bench fired (BENCH_r02.json rc=3) —
violating the repo's own "one TPU client process at a time" rule
(tools/TPU_WORKQUEUE.md).  This module makes the rule mechanical:

  * every long-lived TPU client (training supervisor) acquires the lock
    before touching the device and polls for preemption requests;
  * the bench (short, highest-priority: the round's number of record)
    posts a PREEMPT request, waits for the trainer to checkpoint-and-
    yield, runs, then clears the request so training resumes.

Files (tmpfs — per-host scope matches the single tunneled chip):
  /tmp/qtpu_tpu.lock     JSON {pid, kind, t}; holder identity
  /tmp/qtpu_tpu.preempt  JSON {pid, t}; present = "yield the chip now"

Stale entries (dead pid) are stolen.  The protocol is advisory: a client
that bypasses it can still wedge the tunnel, but everything in-repo
(bench.py, tools/train_supervisor.py, tools/tpu_orchestrator.sh via the
supervisor) honors it.
"""

from __future__ import annotations

import atexit
import json
import os
import time

LOCK = "/tmp/qtpu_tpu.lock"
PREEMPT = "/tmp/qtpu_tpu.preempt"


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def _read(path: str) -> dict | None:
    try:
        return json.loads(open(path).read())
    except (OSError, ValueError):
        return None


def holder() -> dict | None:
    """Live lock holder, or None (stale locks are cleaned here)."""
    info = _read(LOCK)
    if info is None:
        return None
    if not _pid_alive(int(info.get("pid", -1))):
        try:
            os.unlink(LOCK)
        except OSError:
            pass
        return None
    return info


def try_acquire(kind: str) -> bool:
    """One atomic attempt (O_CREAT|O_EXCL). True on success."""
    holder()  # clean a stale lock first
    try:
        fd = os.open(LOCK, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        json.dump({"pid": os.getpid(), "kind": kind, "t": time.time()}, f)
    atexit.register(release)
    return True


def release() -> None:
    info = _read(LOCK)
    if info and int(info.get("pid", -1)) == os.getpid():
        try:
            os.unlink(LOCK)
        except OSError:
            pass


def acquire(kind: str, timeout_s: float = 0.0, poll_s: float = 5.0,
            verbose: bool = True) -> bool:
    """Blocking acquire. timeout_s=0 -> single attempt."""
    t0 = time.time()
    while True:
        if try_acquire(kind):
            return True
        if time.time() - t0 >= timeout_s:
            return False
        if verbose:
            h = holder()
            print(f"[tpulock] waiting for chip (held by {h})", flush=True)
        time.sleep(poll_s)


# --------------------------------------------------------------- preemption

def request_preempt() -> None:
    """Post a yield-the-chip request (bench side)."""
    with open(PREEMPT, "w") as f:
        json.dump({"pid": os.getpid(), "t": time.time()}, f)
    atexit.register(clear_preempt)


def clear_preempt() -> None:
    info = _read(PREEMPT)
    if info and int(info.get("pid", -1)) == os.getpid():
        try:
            os.unlink(PREEMPT)
        except OSError:
            pass


def preempt_requested() -> bool:
    """True if a live process is asking for the chip (trainer side).
    Requests from dead pids are cleaned up."""
    info = _read(PREEMPT)
    if info is None:
        return False
    if not _pid_alive(int(info.get("pid", -1))):
        try:
            os.unlink(PREEMPT)
        except OSError:
            pass
        return False
    return True


def acquire_with_preempt(kind: str, timeout_s: float = 600.0,
                         verbose: bool = True) -> bool:
    """Bench-priority acquire: post PREEMPT, wait for the holder to yield.

    Returns True if the lock was won; False if the holder never yielded
    within timeout_s (caller may proceed anyway — the bench must run —
    but should log that the window was contested)."""
    if try_acquire(kind):
        return True
    request_preempt()
    ok = acquire(kind, timeout_s=timeout_s, poll_s=5.0, verbose=verbose)
    # keep PREEMPT posted while we hold the lock (trainers wait on BOTH
    # conditions); atexit clears it when the bench exits
    return ok
