"""Stall-tolerant training supervisor for the axon TPU tunnel.

The tunnel can wedge mid-run (round 1 lost a 5M-step run to this; round 2
reproduced it: a training iteration blocked >15 min with the device
unreachable).  The in-process JAX backend cannot recover from a wedged
device, so the supervisor runs training as a child process and:

  * watches the child's log mtime; no progress for --stall_minutes means
    the tunnel is stuck -> kill the child, wait for device recovery
    (tools/tpu_ping.py until it answers), and relaunch
  * relaunches with --model_path pointed at the newest resumable
    checkpoint in the run dir, so segments continue the same run
    (reference resume semantics: train.py:112-119, reset_num_timesteps
    False)
  * stops when the run reaches --total_timesteps or --max_restarts

Usage:
  python tools/train_supervisor.py --total_timesteps 100000000 \
      -- --num_parallel_envs 4096 --ctrl_type torque --run_name gait
"""

from __future__ import annotations

import argparse
import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from quadruped_tpu.utils import tpulock  # noqa: E402


def newest_checkpoint(run_dir: Path) -> Path | None:
    if not run_dir.exists():
        return None
    cands = []
    for p in run_dir.iterdir():
        m = re.fullmatch(r"checkpoint_(\d+)", p.name)
        if m and (p / "metadata.json").exists():
            cands.append((int(m.group(1)), p))
    if (run_dir / "final_model").exists():
        cands.append((1 << 62, run_dir / "final_model"))
    return max(cands)[1] if cands else None


def newest_checkpoint_for_run(run_name: str | None) -> Path | None:
    """Globally newest checkpoint across ALL segments of a supervised run.

    Every launch of the training CLI creates a fresh timestamped dir under
    models/ (learn/runner.py), so a run that stalls twice has checkpoints
    spread over several dirs — resuming from the first-discovered dir
    (the pre-round-3 behavior) silently rewinds to segment 1's newest
    checkpoint on the second stall.  Scan every matching dir and pick the
    checkpoint with the highest recorded global_step."""
    if not run_name:
        return None
    best: tuple[int, Path] | None = None
    for d in Path("models").glob(f"*-{run_name}"):
        c = newest_checkpoint(d)
        if c is not None:
            step = global_step_of(c)
            if best is None or step > best[0]:
                best = (step, c)
    return best[1] if best else None


def global_step_of(ckpt: Path | None) -> int:
    if ckpt is None:
        return 0
    import json

    meta = ckpt / "metadata.json"
    if meta.exists():
        return int(json.loads(meta.read_text()).get("global_step", 0))
    return 0


def ping_until_alive(timeout_s=12 * 3600):
    # The tunnel has been observed dead for >10 h at a stretch; wait it
    # out rather than abandoning a resumable run.  A hung ping raises
    # TimeoutExpired (the usual wedge signature) — treat it as not-ready.
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            r = subprocess.run(
                [sys.executable, str(REPO / "tools/tpu_ping.py")],
                capture_output=True, timeout=180, text=True, cwd=REPO,
            )
            ok, rc = r.returncode == 0 and "result:" in r.stdout, r.returncode
        except subprocess.TimeoutExpired:
            ok, rc = False, "hang"
        if ok:
            return True
        print(f"[supervisor] device not ready (rc={rc}); waiting",
              flush=True)
        time.sleep(120)
    return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--total_timesteps", type=int, required=True)
    p.add_argument("--stall_minutes", type=float, default=12.0)
    p.add_argument("--compile_grace_minutes", type=float, default=45.0,
                   help="Stall threshold before the segment's FIRST "
                        "iteration line: a cold XLA compile of the fused "
                        "rollout+update programs is 20-40 min of silence, "
                        "and killing it mid-compile caches nothing — the "
                        "12-min threshold turned one cold compile into an "
                        "infinite kill/recompile loop (round 3).")
    p.add_argument("--max_restarts", type=int, default=30)
    p.add_argument("--log", default="/tmp/supervised_train.log")
    p.add_argument("--no_preflight", action="store_true",
                   help="Skip the CPU signal preflight (discouraged: round "
                        "2 burned ~5 TPU-hours on a provably dead objective "
                        "that the preflight catches in a minute).")
    p.add_argument("train_args", nargs=argparse.REMAINDER,
                   help="-- then quadruped_tpu.cli.train flags")
    args = p.parse_args()
    extra = [a for a in args.train_args if a != "--"]

    # Launch gate (VERDICT r2 #1/#2): refuse objectives with no learning
    # signal from init.  Runs on CPU — never touches the chip.
    if not args.no_preflight:
        pf = subprocess.run(
            [sys.executable, str(REPO / "tools/preflight_signal.py"),
             "--run", "train"] + extra,
            cwd=REPO, env={**os.environ, "QTPU_FORCE_CPU": "1"},
        )
        if pf.returncode != 0:
            print("[supervisor] PREFLIGHT FAILED (dead learning signal) — "
                  "refusing to launch. See the channel decomposition above; "
                  "override with --no_preflight only if you know better.",
                  flush=True)
            sys.exit(pf.returncode)
        print("[supervisor] preflight ok — objective carries signal",
              flush=True)

    # run dir is created by the child on first launch; discover it from the
    # --run_name flag so resume segments share it
    run_name = None
    if "--run_name" in extra:
        run_name = extra[extra.index("--run_name") + 1]

    restarts = 0
    while restarts <= args.max_restarts:
        resume = newest_checkpoint_for_run(run_name)
        done = global_step_of(resume)
        if done >= args.total_timesteps:
            print(f"[supervisor] target reached: {done:,}", flush=True)
            return
        cmd = [
            sys.executable, "-m", "quadruped_tpu.cli.train", "--run", "train",
            "--total_timesteps", str(args.total_timesteps),
        ] + extra
        if resume is not None:
            cmd += ["--model_path", str(resume)]
        # TPU arbitration (VERDICT r2 #3): never launch while the bench —
        # or any other client — holds the chip; wait out preempt windows
        # so training resumes as soon as the bench is done
        while tpulock.preempt_requested() or not tpulock.acquire(
            "train", timeout_s=30.0, verbose=False
        ):
            print(f"[supervisor] chip busy (holder={tpulock.holder()}, "
                  f"preempt={tpulock.preempt_requested()}); waiting",
                  flush=True)
            time.sleep(15)
        print(f"[supervisor] launch (resume={resume}): {' '.join(cmd)}",
              flush=True)
        log = open(args.log, "ab")
        seg_start = os.path.getsize(args.log)
        child = subprocess.Popen(
            cmd, stdout=log, stderr=subprocess.STDOUT, cwd=REPO,
            start_new_session=True,
        )
        preempted = False
        iterating = False   # this segment printed an iteration line yet?
        seg_t0 = time.time()
        scan_pos = seg_start
        try:
            while True:
                time.sleep(20)
                if child.poll() is not None:
                    print(f"[supervisor] child exited rc={child.returncode}",
                          flush=True)
                    break
                if not iterating:
                    # incremental scan of only NEWLY appended bytes (ADVICE
                    # r3 low: re-reading the whole growing tail every 20 s);
                    # 8-byte overlap catches a match split across reads
                    try:
                        with open(args.log, "rb") as lf:
                            lf.seek(max(scan_pos - 8, seg_start))
                            data = lf.read()
                            scan_pos = lf.tell()
                            iterating = b"iter " in data
                    except OSError:
                        pass
                    # 'iter ' lines only exist when RunnerConfig.verbose is
                    # on; once the segment is past the compile-grace window
                    # the stall threshold applies regardless, so a
                    # verbose-off run still gets stall protection
                    if time.time() - seg_t0 > args.compile_grace_minutes * 60:
                        iterating = True
                if tpulock.preempt_requested():
                    # bench wants the chip: kill the segment (it resumes
                    # from the newest checkpoint afterwards) and yield
                    print("[supervisor] preempt requested (bench window) — "
                          "yielding the chip", flush=True)
                    os.killpg(child.pid, signal.SIGKILL)
                    try:
                        child.wait(timeout=60)
                    except subprocess.TimeoutExpired:
                        pass
                    preempted = True
                    break
                age = time.time() - os.path.getmtime(args.log)
                limit = (args.stall_minutes if iterating
                         else args.compile_grace_minutes)
                if age > limit * 60:
                    print(f"[supervisor] stall: log idle {age/60:.1f} min "
                          f"(limit {limit:g}, iterating={iterating}) — "
                          "killing child", flush=True)
                    os.killpg(child.pid, signal.SIGKILL)
                    try:
                        child.wait(timeout=60)
                    except subprocess.TimeoutExpired:
                        print("[supervisor] child unkillable (D-state?); "
                              "proceeding", flush=True)
                    break
        finally:
            log.close()
            tpulock.release()

        if preempted:
            # wait for the bench to clear its request, then resume without
            # burning a restart budget slot
            while tpulock.preempt_requested() or tpulock.holder():
                time.sleep(10)
            print("[supervisor] bench window over — resuming", flush=True)
            continue

        if child.returncode == 0:
            print("[supervisor] training completed", flush=True)
            return
        if child.returncode == 17:
            # Runner.DEAD_SIGNAL_EXIT: the objective provably carries no
            # gradient (reward identically 0 across rollouts).  Restarting
            # re-runs the same dead objective — round 2 relaunched four
            # times without diagnosis; never again.
            print("[supervisor] FATAL: dead learning signal (rc=17) — "
                  "NOT restarting; fix the objective and preflight it "
                  "with tools/preflight_signal.py", flush=True)
            return
        restarts += 1
        if not ping_until_alive():
            print("[supervisor] device never recovered; giving up", flush=True)
            return
    print("[supervisor] max restarts exceeded", flush=True)


if __name__ == "__main__":
    main()
