"""Capacity / throughput probe (reference C12: test_max_envs.py).

The reference ramps SubprocVecEnv process counts [4..48] against host
RAM/CPU limits (test_max_envs.py:13-105) and measures steps/sec over 100
random-action steps (quick_benchmark, 107-169).  On TPU the binding
resource is HBM, and env count scales by orders of magnitude: this probe
ramps vmapped env counts (default 512..16384), measures compile time,
steps/sec and device memory, and recommends conservative / recommended /
aggressive env counts (the reference's output format, test_max_envs.py:
96-103).

Usage: python -m quadruped_tpu.cli.capacity [--counts 512,1024,...]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from ..utils import tpu_jit
import numpy as np


def probe(counts, steps: int = 20, ctrl_type: str = "torque"):
    from ..env.config import Go1Config
    from ..env.go1 import Go1Env
    from ..models.actor_critic import Policy

    env = Go1Env(Go1Config(ctrl_type=ctrl_type))
    policy = Policy.make(act_dim=env.nu)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.float32), policy.init(jax.random.PRNGKey(0))
    )
    results = []
    for n in counts:
        try:
            keys = jax.random.split(jax.random.PRNGKey(1), n)
            t0 = time.perf_counter()
            state = tpu_jit(jax.vmap(env.reset))(keys)
            obs = tpu_jit(jax.vmap(env.obs))(state)

            @tpu_jit
            def rollout(variables, state, obs, rng, T=steps):
                def body(carry, _):
                    state, obs, rng = carry
                    rng, k = jax.random.split(rng)
                    # policy params are f32; env dtype may be f64 under x64
                    action, _, _, _ = policy.sample(
                        variables, obs.astype(jnp.float32), k
                    )
                    state, obs, reward, *_ = jax.vmap(env.step_autoreset)(
                        state, action
                    )
                    return (state, obs, rng), reward

                carry, rewards = jax.lax.scan(
                    body, (state, obs, rng), None, length=T
                )
                return carry, rewards.mean()

            carry, r = rollout(variables, state, obs, jax.random.PRNGKey(2))
            jax.block_until_ready(r)
            compile_time = time.perf_counter() - t0
            t0 = time.perf_counter()
            carry, r = rollout(variables, *carry)
            jax.block_until_ready(r)
            dt = time.perf_counter() - t0
            sps = n * steps / dt
            mem = None
            try:
                ms = jax.devices()[0].memory_stats()
                mem = ms.get("bytes_in_use", 0) / 1e9
            except Exception:
                pass
            results.append(dict(n=n, steps_per_sec=sps,
                                compile_s=compile_time, mem_gb=mem))
            memtxt = f"{mem:.2f} GB" if mem else "n/a"
            print(f"envs {n:>6}: {sps:>12,.0f} steps/s   "
                  f"compile {compile_time:5.1f}s   HBM {memtxt}")
        except Exception as e:
            if not results:
                # first count failing is a bug, not a capacity limit —
                # surface it instead of returning an empty probe
                raise
            print(f"envs {n:>6}: FAILED ({type(e).__name__}: {e})")
            break
    if results:
        best = max(results, key=lambda r: r["steps_per_sec"])
        print("\nrecommendations (by throughput):")
        print(f"  conservative: {max(best['n'] // 4, results[0]['n'])}")
        print(f"  recommended:  {best['n']}")
        print(f"  aggressive:   {results[-1]['n']}")
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--counts", type=str, default="512,1024,2048,4096,8192")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--ctrl_type", default="torque")
    args = p.parse_args(argv)
    counts = [int(x) for x in args.counts.split(",")]
    probe(counts, args.steps, args.ctrl_type)


if __name__ == "__main__":
    main()
