#!/usr/bin/env python
"""Part 4: does a Runner-style EVAL poison subsequent training dispatch?

probe3: clean process sustains full train iterations at 6,390 steps/s.
The live Runner sustains 1,440 — and the only in-process event the probes
have not reproduced is the periodic 2-env evaluation (its own jitted
programs, ~60 sequential tiny dispatches).  Run: 2 train iterations →
one eval → 2 train iterations, all hard-synced and timed.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from quadruped_tpu.utils import tpulock  # noqa: E402

tpulock.acquire_with_preempt("bench", timeout_s=420.0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quadruped_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

os.environ.setdefault("QTPU_EVAL_CHUNK", "100")

from quadruped_tpu.env.config import Go1Config  # noqa: E402
from quadruped_tpu.env.go1 import Go1Env  # noqa: E402
from quadruped_tpu.learn.ppo import PPO, PPOConfig  # noqa: E402
from quadruped_tpu.learn.runner import Runner, RunnerConfig  # noqa: E402

NUM_ENVS = 4096
N_STEPS = 64


def sync(x):
    float(jax.device_get(jnp.asarray(x).reshape(-1)[0]))


def main():
    env = Go1Env(Go1Config(
        ctrl_type="position", solver_iterations=8, contact_pools=(8, 28, 12),
        reward_floor=False, accel_cost_mode="plain", max_unhealthy_time=1.0,
        fallen_start_prob=0.0,
    ))
    cfg = PPOConfig(num_envs=NUM_ENVS, n_steps=N_STEPS, rollout_chunk=2,
                    num_minibatches=8, n_epochs=5)
    run_cfg = RunnerConfig(n_eval_episodes=2, eval_max_time=60.0,
                           save_videos=False, verbose=False)
    runner = Runner(env, cfg, run_cfg)
    trainer = runner.trainer
    ts = trainer.init(jax.random.PRNGKey(0))

    def one_iter(ts, tag):
        t0 = time.perf_counter()
        ts, m = trainer.train_iteration_chunked(ts)
        sync(m["mean_reward"])
        dt = time.perf_counter() - t0
        print(f"  {tag:<28s} {dt:7.2f}s ({NUM_ENVS*N_STEPS/dt:,.0f} steps/s)",
              flush=True)
        return ts

    t0 = time.perf_counter()
    ts, _m = trainer.train_iteration_chunked(ts)
    sync(jax.tree.leaves(ts.params)[0])
    print(f"warm: {time.perf_counter() - t0:.1f} s", flush=True)

    ts = one_iter(ts, "train pre-eval 1")
    ts = one_iter(ts, "train pre-eval 2")

    t0 = time.perf_counter()
    ep_rew, ep_len, _succ, _out = runner.evaluate(ts, jax.random.PRNGKey(7))
    print(f"  eval (2 envs x 3000 steps)   {time.perf_counter()-t0:7.2f}s "
          f"reward {float(ep_rew.mean()):.2f}", flush=True)

    ts = one_iter(ts, "train post-eval 1")
    ts = one_iter(ts, "train post-eval 2")
    ts = one_iter(ts, "train post-eval 3")

    tpulock.release()


if __name__ == "__main__":
    main()
