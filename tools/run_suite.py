#!/usr/bin/env python
"""Crash-isolating test-suite runner.

Runs each test module in its own pytest subprocess and aggregates the
results.  Exists because this VM pool's hosts can SEGFAULT inside XLA:CPU
compilation itself (jax compiler.backend_compile_and_load, reproduced
4/4 on one host generation while the same programs compile fine on
another — see quadruped_tpu/utils/cache.py for the full story; the
round-3 "full-tier SIGABRT" was this).  A compiler crash in one module
must not vaporize the evidence for the other ~120 tests, and a
crash-then-clean-retry is meaningful signal (host flake), so crashed
modules are retried once.

The single-process tiers (pytest -m smoke / -m "not slow") remain the
primary interface and work on healthy hosts; this runner is the
guaranteed-to-terminate path and the one CI-less discipline should use
for the full gate.

Usage:
    python tools/run_suite.py                 # full "not slow" tier
    python tools/run_suite.py --slow          # everything
    python tools/run_suite.py -k pattern      # forwarded to pytest
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TESTS = REPO / "tests"

CRASH_RCS = {-11, -6, 134, 139}  # SIGSEGV/SIGABRT, raw and shell-encoded


def run_module(mod: Path, extra: list[str], timeout: float) -> tuple[int, str, float]:
    t0 = time.time()
    cmd = [sys.executable, "-m", "pytest", str(mod), "-q", *extra]
    try:
        r = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
        rc, out = r.returncode, r.stdout + r.stderr
    except subprocess.TimeoutExpired as e:
        rc, out = 124, f"TIMEOUT after {timeout:.0f}s\n{e.stdout}"
    return rc, out, time.time() - t0


def tail_summary(out: str) -> str:
    for line in reversed(out.strip().splitlines()):
        if ("passed" in line or "failed" in line or "error" in line
                or "no tests ran" in line):
            return line.strip().strip("=").strip()
    return (out.strip().splitlines() or ["(no output)"])[-1][:120]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slow", action="store_true",
                    help="include @slow tests (learning regression)")
    ap.add_argument("--timeout", type=float, default=3600.0,
                    help="per-module timeout (cold XLA compiles included)")
    ap.add_argument("-k", default=None, help="forwarded to pytest")
    args = ap.parse_args()

    extra = [] if args.slow else ["-m", "not slow"]
    if args.k:
        extra += ["-k", args.k]

    mods = sorted(TESTS.glob("test_*.py"))
    results = {}
    failed = []
    for mod in mods:
        rc, out, dt = run_module(mod, extra, args.timeout)
        if rc in CRASH_RCS or rc == 124:
            print(f"  {mod.name}: CRASH rc={rc} ({dt:.0f}s) — retrying once",
                  flush=True)
            rc, out, dt = run_module(mod, extra, args.timeout)
        status = (
            "ok" if rc == 0
            else "no-tests" if rc == 5
            else f"CRASH rc={rc}" if rc in CRASH_RCS or rc == 124
            else f"FAIL rc={rc}"
        )
        results[mod.name] = {
            "status": status, "seconds": round(dt, 1),
            "summary": tail_summary(out),
        }
        print(f"  {mod.name:34s} {status:12s} {dt:7.1f}s  "
              f"{results[mod.name]['summary']}", flush=True)
        if rc not in (0, 5):
            failed.append(mod.name)
            # keep the evidence of what failed
            Path(f"/tmp/suite_{mod.stem}.log").write_text(out)

    print(json.dumps({
        "modules": len(mods),
        "green": len(mods) - len(failed),
        "failed": failed,
    }))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
