"""Micro-benchmark of the PPO update program alone (VERDICT weak #2).

Builds a synthetic rollout at training shapes (4096 envs x 32 steps) and
times `PPO._update_with_metrics` in isolation, so the ~85 s/iteration
update cost reported in PLAN.md can be attributed (dispatch vs gather vs
scan) and re-measured after each fix.

Usage: python tools/update_bench.py [num_envs] [n_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from quadruped_tpu.utils import cache as _cache

_cache.enable()

from quadruped_tpu.learn.ppo import PPO, PPOConfig, Transition
from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    env = Go1Env(Go1Config(ctrl_type="torque"))
    cfg = PPOConfig(num_envs=num_envs, n_steps=n_steps)
    ppo = PPO(env, cfg)

    rng = jax.random.PRNGKey(0)
    variables = ppo.policy.init(rng)
    opt_state = ppo.tx.init(variables)

    T, B = n_steps, num_envs
    k = jax.random.split(rng, 8)
    traj = Transition(
        obs=jax.random.normal(k[0], (T, B, 48), jnp.float32),
        action=jax.random.normal(k[1], (T, B, 12), jnp.float32),
        log_prob=jax.random.normal(k[2], (T, B), jnp.float32),
        value=jax.random.normal(k[3], (T, B), jnp.float32),
        reward=jax.random.normal(k[4], (T, B), jnp.float32),
        terminated=jnp.zeros((T, B), bool),
        done=jnp.zeros((T, B), bool),
        bootstrap_value=jnp.zeros((T, B), jnp.float32),
        info={},
    )

    import dataclasses as dc

    ts = ppo.init(jax.random.PRNGKey(1))
    ts = dc.replace(ts, params=variables, opt_state=opt_state)

    # compile
    t0 = time.perf_counter()
    ts2, metrics = ppo._update_with_metrics(ts, traj)
    print({k_: float(v) for k_, v in metrics.items()})
    print(f"compile+first run: {time.perf_counter() - t0:.2f}s")

    for trial in range(3):
        t0 = time.perf_counter()
        ts2, metrics = ppo._update_with_metrics(ts, traj)
        float(jax.device_get(metrics["loss"]))
        print(f"update run {trial}: {time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
