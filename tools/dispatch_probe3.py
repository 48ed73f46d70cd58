#!/usr/bin/env python
"""Part 3: bisect the rollout+update interaction (probe2 variant I).

probe2: rollout pattern alone = 6,501 steps/s; update alone = 0.33 s;
train_iteration_chunked = 1,919 steps/s.  This probe splits one iteration
into hard-sync'd phases, several iterations in a row, to see WHERE the
~96 s/iteration appears and whether it grows, alternates, or is constant.
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

from quadruped_tpu.env.config import Go1Config  # noqa: E402
from quadruped_tpu.env.go1 import Go1Env  # noqa: E402
from quadruped_tpu.learn.ppo import PPO, PPOConfig  # noqa: E402

NUM_ENVS = 4096
N_STEPS = 64


def sync(x):
    float(jax.device_get(jnp.asarray(x).reshape(-1)[0]))


def main():
    env = Go1Env(Go1Config(
        ctrl_type="position", solver_iterations=8, contact_pools=(8, 28, 12),
        reward_floor=False, accel_cost_mode="plain", max_unhealthy_time=1.0,
        fallen_start_prob=0.0,
        collision_mode=__import__("os").environ.get("QTPU_PROBE_COLLISION", "full"),
    ))
    cfg = PPOConfig(num_envs=NUM_ENVS, n_steps=N_STEPS, rollout_chunk=2,
                    num_minibatches=8, n_epochs=5)
    trainer = PPO(env, cfg)
    ts = trainer.init(jax.random.PRNGKey(0))

    # warm both programs
    t0 = time.perf_counter()
    ts2, traj = trainer.rollout_chunked(ts)
    sync(traj.reward)
    ts3, m = trainer._update_with_metrics(ts2, traj)
    sync(m["mean_reward"])
    print(f"warm: {time.perf_counter() - t0:.1f} s", flush=True)
    ts = ts3

    for it in range(4):
        t0 = time.perf_counter()
        ts2, traj = trainer.rollout_chunked(ts)
        sync(traj.reward)
        t1 = time.perf_counter()
        # force EVERY traj leaf (the reward sync above leaves the other 8
        # concatenated leaves as pending async work)
        for leaf in jax.tree.leaves(traj):
            sync(leaf)
        t2 = time.perf_counter()
        ts3, m = trainer._update_with_metrics(ts2, traj)
        sync(m["mean_reward"])
        t3 = time.perf_counter()
        for leaf in jax.tree.leaves(ts3.params):
            sync(leaf)
        t4 = time.perf_counter()
        print(
            f"iter {it}: rollout(sync reward) {t1-t0:7.2f}s | "
            f"sync all traj {t2-t1:7.2f}s | update {t3-t2:7.2f}s | "
            f"sync params {t4-t3:7.2f}s | total {t4-t0:7.2f}s "
            f"({NUM_ENVS*N_STEPS/(t4-t0):,.0f} steps/s)",
            flush=True,
        )
        ts = ts3

    tpulock.release()


if __name__ == "__main__":
    main()
