"""Throughput benchmark: env control-steps/sec at 4096 vmapped Go1 envs.

Counts control steps (policy inference + 10 physics substeps + obs/reward,
the same unit the reference's quick_benchmark measures over SubprocVecEnv,
test_max_envs.py:107-169).  The reference publishes no numbers; BASELINE.md
sets the north-star at 1e6 env-steps/sec/chip, so vs_baseline = value/1e6.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

from quadruped_tpu.utils import cache as _cache
_cache.enable()

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.models.actor_critic import Policy

NUM_ENVS = 4096
T = 50
BASELINE = 1.0e6


def main():
    env = Go1Env(Go1Config(ctrl_type="torque"))
    policy = Policy.make(act_dim=env.nu)
    variables = policy.init(jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda x: x.astype(jnp.float32), variables)

    keys = jax.random.split(jax.random.PRNGKey(1), NUM_ENVS)
    state = jax.jit(jax.vmap(env.reset))(keys)
    state = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        state,
    )
    obs = jax.jit(jax.vmap(env.obs))(state).astype(jnp.float32)

    @jax.jit
    def rollout(variables, state, obs, rng):
        def body(carry, _):
            state, obs, rng = carry
            rng, k = jax.random.split(rng)
            action, _, _, _ = policy.sample(variables, obs, k)
            state, obs, reward, term, trunc, _ = jax.vmap(
                env.step_autoreset
            )(state, action)
            return (state, obs.astype(jnp.float32), rng), reward

        (state, obs, rng), rewards = jax.lax.scan(
            body, (state, obs, rng), None, length=T
        )
        return state, obs, rng, rewards.mean()

    rng = jax.random.PRNGKey(2)
    # compile + warmup
    state, obs, rng, _ = jax.block_until_ready(rollout(variables, state, obs, rng))

    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        state, obs, rng, r = rollout(variables, state, obs, rng)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    steps_per_sec = NUM_ENVS * T * iters / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_4096envs",
                "value": round(steps_per_sec, 1),
                "unit": "control steps/s (10 physics substeps each)",
                "vs_baseline": round(steps_per_sec / BASELINE, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
