#!/usr/bin/env python
"""Isolate the training-rollout throughput gap (VERDICT r2 #4).

bench.py's single-step program loop measures ~6.5k control-steps/s at
4096 envs, but the PPO rollout sustains only ~1.4k — a ~2.2 s/step
overhead that scales with CONTROL STEPS, not with dispatches (chunk 1 and
chunk 2 measure identically; chunk 8 is worse).  This probe times the
candidate culprits on the real chip, one variant per section, same env
and policy as the bench:

  A. bench-style step program (state, obs, rng) -> (state, obs, rng, r)
  B. A + per-step Transition-sized OUTPUTS (obs/action/logp/value/...)
     -> isolates output materialization / transfer
  C. A + bootstrap value pass on info["terminal_observation"]
     -> isolates the extra policy.apply
  D. the real PPO._rollout_chunk(ts, N) -> full trainer program
  E. D but with the traj outputs reduced to scalars inside the program
     -> isolates scan-stacked outputs from the scan itself

Run while holding the TPU (preempts training via tpulock, like bench.py).
"""

from __future__ import annotations

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
from quadruped_tpu.utils import tpu_jit  # noqa: E402

_cache.enable()

from quadruped_tpu.env.config import Go1Config  # noqa: E402
from quadruped_tpu.env.go1 import Go1Env  # noqa: E402
from quadruped_tpu.learn.ppo import PPO, PPOConfig  # noqa: E402
from quadruped_tpu.models.actor_critic import Policy  # noqa: E402

NUM_ENVS = int(os.environ.get("QTPU_BENCH_ENVS", 4096))
STEPS = int(os.environ.get("QTPU_PROBE_STEPS", 8))


def sync(x):
    float(jax.device_get(jnp.asarray(x).reshape(-1)[0]))


def timed(label, fn, *args):
    # one warm call (compile), then timed steps
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    dt1 = time.perf_counter() - t0
    print(f"  {label:<50s} {dt1:7.2f} s  "
          f"({NUM_ENVS * STEPS / dt1:,.0f} steps/s)", flush=True)
    return dt1


def main():
    env = Go1Env(Go1Config(
        ctrl_type="position",
        solver_iterations=8,
        contact_pools=(8, 28, 12),
        reward_floor=False,
        accel_cost_mode="plain",
        max_unhealthy_time=1.0,
        fallen_start_prob=0.0,
    ))
    cfg = PPOConfig(num_envs=NUM_ENVS, n_steps=STEPS, rollout_chunk=None,
                    num_minibatches=8, n_epochs=1)
    trainer = PPO(env, cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    policy = trainer.policy

    print(f"probe: {NUM_ENVS} envs x {STEPS} control steps per variant",
          flush=True)

    # ---- A: bench-style single-step program loop -------------------------
    @tpu_jit
    def step_a(variables, state, obs, rng):
        rng, k = jax.random.split(rng)
        action, _, _, _ = policy.sample(variables, obs, k)
        state, obs, reward, term, trunc, _ = jax.vmap(env.step_autoreset)(
            state, action
        )
        return state, obs.astype(jnp.float32), rng, reward.mean()

    def loop_a(ts):
        state, obs, rng = ts.env_state, ts.obs, ts.rng
        r = None
        for _ in range(STEPS):
            state, obs, rng, r = step_a(ts.params, state, obs, rng)
        return r

    timed("A bench-style 1-step programs", loop_a, ts)
    timed("A again (steady)", loop_a, ts)

    # ---- B: A + Transition-sized outputs ---------------------------------
    @tpu_jit
    def step_b(variables, state, obs, rng):
        rng, k = jax.random.split(rng)
        action, log_prob, value, _ = policy.sample(variables, obs, k)
        state, obs2, reward, term, trunc, info = jax.vmap(env.step_autoreset)(
            state, action
        )
        term_obs = info.pop("terminal_observation")
        _, _, term_value = policy.apply(variables, term_obs)
        out = dict(obs=obs, action=action, log_prob=log_prob, value=value,
                   reward=reward, terminated=term, done=term | trunc,
                   bootstrap=jnp.where(term, 0.0, term_value))
        return state, obs2.astype(jnp.float32), rng, out

    def loop_b(ts):
        state, obs, rng = ts.env_state, ts.obs, ts.rng
        outs = []
        for _ in range(STEPS):
            state, obs, rng, out = step_b(ts.params, state, obs, rng)
            outs.append(out)
        return outs[-1]["reward"]

    timed("B + per-step Transition outputs", loop_b, ts)

    # ---- D: the real trainer rollout program -----------------------------
    def loop_d(ts):
        ts2, traj = trainer._rollout_chunk(ts, STEPS)
        return traj.reward

    timed("D PPO._rollout_chunk (one program, scan)", loop_d, ts)
    timed("D again (steady)", loop_d, ts)

    # ---- E: rollout scan, outputs reduced inside the program -------------
    @tpu_jit
    def rollout_lean(ts):
        ts2, traj = trainer.rollout(ts, length=STEPS)
        return jax.tree.map(
            lambda x: x.mean() if jnp.issubdtype(x.dtype, jnp.floating)
            else x.sum(), traj
        )

    timed("E scan, outputs reduced in-program", rollout_lean, ts)

    tpulock.release()


if __name__ == "__main__":
    main()
