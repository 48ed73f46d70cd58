"""Drill-down of the training rollout's per-control-step cost vs the bare
physics step (phase timing showed rollout 153.7s/iter = 4.8 s/ctrl-step at
4096 envs where bare physics is 1.18 s — this names the 4x).

Times, at the same batch: bare step_n physics; env.step (physics +
obs/reward/health); env.step_autoreset (+ reset branch); the full rollout
body (+ policy sample + bootstrap value); and a 2-step scan of the body.

Usage: python tools/rollout_bench.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from quadruped_tpu.utils import tpu_jit
from quadruped_tpu.utils import cache as _cache

_cache.enable()

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.learn.ppo import PPO, PPOConfig
from quadruped_tpu.physics import forward as F


def sync(o):
    leaf = jax.tree.leaves(o)[0]
    return float(jax.device_get(jnp.ravel(leaf)[0].astype(jnp.float32)))


def bench(fn, args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    env = Go1Env(Go1Config(ctrl_type="torque"))
    ppo = PPO(env, PPOConfig(num_envs=B, n_steps=2, rollout_chunk=2))
    ts = ppo.init(jax.random.PRNGKey(0))
    st = ts.env_state
    action = jnp.zeros((B, 12), jnp.float32)

    jphys = tpu_jit(jax.vmap(
        lambda pr, qp, qv, c, w: F.step_n(
            env.pipeline, pr, qp, qv, c, env.cfg.frame_skip, warmstart=w)))
    args = (st.params, st.qpos, st.qvel, action, st.qacc_warm)
    _ = jphys(*args)
    print(f"B={B}  physics step_n     {bench(jphys, args)*1e3:9.1f} ms",
          flush=True)

    jstep = tpu_jit(jax.vmap(env.step))
    _ = jstep(st, action)
    print(f"B={B}  env.step           {bench(jstep, (st, action))*1e3:9.1f} ms",
          flush=True)

    jauto = tpu_jit(jax.vmap(env.step_autoreset))
    _ = jauto(st, action)
    print(f"B={B}  env.step_autoreset {bench(jauto, (st, action))*1e3:9.1f} ms",
          flush=True)

    jbody = tpu_jit(lambda t: ppo._rollout_step(t, None)[0])
    _ = jbody(ts)
    print(f"B={B}  rollout body       {bench(jbody, (ts,))*1e3:9.1f} ms",
          flush=True)

    jchunk = tpu_jit(lambda t: ppo.rollout(t, length=2)[0])
    _ = jchunk(ts)
    t2 = bench(jchunk, (ts,))
    print(f"B={B}  2-step scan        {t2*1e3:9.1f} ms ({t2/2*1e3:.1f}/step)",
          flush=True)


if __name__ == "__main__":
    main()
