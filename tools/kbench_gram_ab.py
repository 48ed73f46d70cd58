#!/usr/bin/env python
"""On-chip VPU-vs-MXU Gram A/B for the Newton kernel (PLAN lever 3).

Takes the chip via the bench-priority preemption protocol (the training
supervisor checkpoints and yields, then auto-resumes when we release),
runs `tools/perf_probe.py kernel` once per gram mode in fresh
subprocesses, and
prints both JSON lines.  Mosaic lowering of the MXU path has never run
on real hardware before this — a lowering error here is a result, not
a crash (captured and printed).

Usage: python tools/kbench_gram_ab.py [--iters 8] [--B 4096]
"""

import sys

sys.path.insert(0, "/root/repo")
import argparse
import os
import subprocess
import time

from quadruped_tpu.utils import tpulock

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", default="8")
    ap.add_argument("--B", default="4096")
    ap.add_argument("--modes", default="vpu,mxu")
    ap.add_argument("--timeout", type=float, default=900.0,
                    help="per-mode subprocess timeout (compile included)")
    args = ap.parse_args()

    print("[ab] requesting chip (preempting any trainer)...", flush=True)
    tpulock.request_preempt()
    if not tpulock.acquire("kbench-ab", timeout_s=300.0):
        print(f"[ab] could not get the chip (holder={tpulock.holder()})",
              flush=True)
        return 1
    try:
        for mode in args.modes.split(","):
            env = {**os.environ, "QTPU_GRAM": mode, "KB_IT": args.iters,
                   "KB_B": args.B}
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, os.path.join(REPO, "tools/perf_probe.py"),
                     "kernel", "--B", args.B, "--iters", args.iters,
                     "--gram", mode],
                    env=env, cwd=REPO, capture_output=True, text=True,
                    timeout=args.timeout,
                )
                out = (r.stdout + r.stderr).strip()
            except subprocess.TimeoutExpired as e:
                out = f"TIMEOUT after {args.timeout}s\n{e.stdout}\n{e.stderr}"
            print(f"\n===== gram_mode={mode} ({time.time()-t0:.0f}s) =====",
                  flush=True)
            print(out[-3000:], flush=True)
    finally:
        tpulock.release()
        tpulock.clear_preempt()
        print("[ab] chip released; trainer resumes", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
