"""Drill-down timing of the assemble() stage (the dominant XLA cost at
4096 envs per tools/profile_phases.py).  Times narrowphase alone, the
top-K compaction + gathers alone, and full assemble, so the slow part can
be named before rewriting it.

Usage: python tools/assemble_bench.py [B]
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
from quadruped_tpu.physics.collision import narrowphase
from quadruped_tpu.physics.constraint import assemble
from quadruped_tpu.physics.kinematics import fk


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jax.device_get(jnp.ravel(leaf)[0].astype(jnp.float32)))


def bench(fn, args, iters=10):
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
    pl_ = env.pipeline
    m = env.m
    layout, table = pl_.layout, pl_.table
    print(f"B={B} ncand={table.ncand} K={layout.max_contacts}", flush=True)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    st = tpu_jit(jax.vmap(env.reset))(keys)
    st = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, st)
    qpos, qvel = st.qpos, st.qvel

    jfk = tpu_jit(jax.vmap(lambda qp, qv: fk(m, qp, qv)))
    kin = jfk(qpos, qvel)

    # narrowphase alone
    jnar = tpu_jit(jax.vmap(lambda k: narrowphase(m, table, k)))
    _ = jnar(kin)
    t = bench(jnar, (kin,))
    print(f"narrowphase          {t*1e6:10.0f} us", flush=True)
    dist_all, pos_all, frame_all = jnar(kin)

    # top-K compaction + data gathers alone (mirrors assemble's block)
    K = layout.max_contacts
    import numpy as np

    incm_all = jnp.asarray(np.asarray(layout.con_includemargin), jnp.float32)

    def compact(dist_all, pos_all, frame_all):
        act = dist_all < incm_all
        cs = jnp.cumsum(act.astype(jnp.int32))
        sel = jnp.searchsorted(
            cs, jnp.arange(1, K + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        sel = jnp.minimum(sel, dist_all.shape[0] - 1)
        return dist_all[sel], pos_all[sel], frame_all[sel], sel

    jcomp = tpu_jit(jax.vmap(compact))
    _ = jcomp(dist_all, pos_all, frame_all)
    t = bench(jcomp, (dist_all, pos_all, frame_all))
    print(f"topK compact+gather  {t*1e6:10.0f} us", flush=True)

    # searchsorted alone
    def ss(dist_all):
        act = dist_all < incm_all
        cs = jnp.cumsum(act.astype(jnp.int32))
        return jnp.searchsorted(
            cs, jnp.arange(1, K + 1, dtype=jnp.int32), side="left"
        )

    jss = tpu_jit(jax.vmap(ss))
    _ = jss(dist_all)
    t = bench(jss, (dist_all,))
    print(f"cumsum+searchsorted  {t*1e6:10.0f} us", flush=True)

    # full assemble
    jasm = tpu_jit(jax.vmap(lambda k, qp, qv: assemble(m, layout, table, k, qp, qv)))
    _ = jasm(kin, qpos, qvel)
    t = bench(jasm, (kin, qpos, qvel))
    print(f"assemble (full)      {t*1e6:10.0f} us", flush=True)


if __name__ == "__main__":
    main()
