#!/usr/bin/env python
"""Part 2 of the rollout-throughput investigation (tools/dispatch_probe.py).

Probe 1 cleared the program itself: the real PPO rollout program measures
~6.5k steps/s in isolation — identical to the bench — while the live
Runner loop sustains ~1.4k.  Remaining hypotheses:

  F. the live loop's exact dispatch pattern (32 x chunk-2 programs +
     host-side tree concat + one sync), from a fresh init state
  G. F from an EVOLVED state (500 control steps of random-ish policy:
     fallen, contact-rich, autoresetting regime)
  H. F with a concurrent host-CPU hog (the 1-core tunnel-starvation
     theory: every slow measurement this round coincided with a pytest/
     preflight process on the host)
  I. the full train_iteration_chunked (rollout + update) steady state
"""

from __future__ import annotations

import multiprocessing
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from quadruped_tpu.utils import tpulock  # noqa: E402

if not tpulock.acquire_with_preempt(
    "bench", timeout_s=float(os.environ.get("QTPU_LOCK_TIMEOUT", "420"))
):
    print(f"lock contested (holder={tpulock.holder()}); probing anyway",
          flush=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quadruped_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

from quadruped_tpu.env.config import Go1Config  # noqa: E402
from quadruped_tpu.env.go1 import Go1Env  # noqa: E402
from quadruped_tpu.learn.ppo import PPO, PPOConfig  # noqa: E402

NUM_ENVS = 4096
N_STEPS = 64
CHUNK = 2


def sync(x):
    float(jax.device_get(jnp.asarray(x).reshape(-1)[0]))


def cpu_hog(stop):
    x = 1.0
    while not stop.is_set():
        x = x * 1.0000001 + 1e-9


def main():
    env = Go1Env(Go1Config(
        ctrl_type="position", solver_iterations=8, contact_pools=(8, 28, 12),
        reward_floor=False, accel_cost_mode="plain", max_unhealthy_time=1.0,
        fallen_start_prob=0.0,
    ))
    cfg = PPOConfig(num_envs=NUM_ENVS, n_steps=N_STEPS, rollout_chunk=CHUNK,
                    num_minibatches=8, n_epochs=5)
    trainer = PPO(env, cfg)
    ts = trainer.init(jax.random.PRNGKey(0))

    def rollout_once(ts):
        ts, traj = trainer.rollout_chunked(ts)
        sync(traj.reward)
        return ts

    # warm compile
    t0 = time.perf_counter()
    ts = rollout_once(ts)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

    # F: fresh-ish state, live dispatch pattern
    for tag in ("F live pattern (32 x chunk2 + concat)", "F again"):
        t0 = time.perf_counter()
        ts = rollout_once(ts)
        dt = time.perf_counter() - t0
        print(f"  {tag:<50s} {dt:7.2f} s ({NUM_ENVS*N_STEPS/dt:,.0f} steps/s)",
              flush=True)

    # G: evolved regime (the loop above already advanced 192 steps; do a
    # few more rollouts to land deep in the fallen/autoreset regime)
    for _ in range(3):
        ts = rollout_once(ts)
    t0 = time.perf_counter()
    ts = rollout_once(ts)
    dt = time.perf_counter() - t0
    print(f"  {'G evolved state regime':<50s} {dt:7.2f} s "
          f"({NUM_ENVS*N_STEPS/dt:,.0f} steps/s)", flush=True)

    # H: concurrent host CPU hog
    stop = multiprocessing.Event()
    hogs = [multiprocessing.Process(target=cpu_hog, args=(stop,))
            for _ in range(2)]
    for h in hogs:
        h.start()
    try:
        t0 = time.perf_counter()
        ts = rollout_once(ts)
        dt = time.perf_counter() - t0
        print(f"  {'H + 2 host CPU hogs':<50s} {dt:7.2f} s "
              f"({NUM_ENVS*N_STEPS/dt:,.0f} steps/s)", flush=True)
    finally:
        stop.set()
        for h in hogs:
            h.join(timeout=5)
            h.terminate()

    # I: full chunked train iteration (rollout + update)
    ts, m = trainer.train_iteration_chunked(ts)
    sync(m["mean_reward"])
    t0 = time.perf_counter()
    ts, m = trainer.train_iteration_chunked(ts)
    sync(m["mean_reward"])
    dt = time.perf_counter() - t0
    print(f"  {'I train_iteration_chunked steady':<50s} {dt:7.2f} s "
          f"({NUM_ENVS*N_STEPS/dt:,.0f} steps/s)", flush=True)

    tpulock.release()


if __name__ == "__main__":
    main()
