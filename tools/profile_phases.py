"""Per-phase physics timing on the current JAX backend.

Times each pipeline stage (fk, smooth dynamics, narrowphase+assemble,
Newton solve, integrate, full substep, full control step) standalone under
jit+vmap at several env batch sizes.  This is the evidence harness for the
perf roadmap (PLAN.md): it tells us where the per-substep budget actually
goes on the TPU before any kernel work.

Usage:  python tools/profile_phases.py [--batches 256,1024,4096] [--iters 20]
"""

from __future__ import annotations

import argparse
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
from quadruped_tpu.physics import forward as F
from quadruped_tpu.physics.constraint import assemble
from quadruped_tpu.physics.kinematics import fk
from quadruped_tpu.physics.smooth import smooth_dynamics
from quadruped_tpu.physics.solver import solve


def sync(out):
    """Force real completion: block_until_ready is unreliable on axon —
    pull one scalar off the device instead."""
    leaf = jax.tree.leaves(out)[0]
    return float(jax.device_get(jnp.ravel(leaf)[0]))


def bench(fn, args, iters):
    out = fn(*args)  # compile
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="256,1024,4096")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--ctrl_type", default="torque")
    p.add_argument("--collision", default="full", choices=["plane", "full"])
    p.add_argument("--max_contacts", type=int, default=None)
    p.add_argument("--pools", default=None,
                   help="'K6,K3,K1' condim pools (production: 8,28,12)")
    p.add_argument("--solver_iterations", type=int, default=None,
                   help="Newton iterations (production: 8)")
    args = p.parse_args()

    from quadruped_tpu.utils import tpulock

    if not tpulock.acquire_with_preempt("bench", timeout_s=420.0):
        print(f"lock contested (holder={tpulock.holder()}); probing anyway",
              flush=True)
    import atexit

    atexit.register(tpulock.release)

    cfg = Go1Config(
        ctrl_type=args.ctrl_type, collision_mode=args.collision,
        contact_pools=(
            tuple(int(x) for x in args.pools.split(",")) if args.pools
            else None
        ),
        solver_iterations=args.solver_iterations,
    )
    if args.max_contacts is not None:
        cfg.max_contacts = args.max_contacts
    env = Go1Env(cfg)
    pl_ = env.pipeline
    m = env.m
    print(f"backend: {jax.devices()[0].platform}  ncand={pl_.table.ncand} "
          f"max_contacts={pl_.layout.max_contacts} nefc={pl_.layout.nefc} "
          f"iterations={m.opt.iterations}")

    # null-program overhead: dispatch + 4-byte D2H round trip
    null = tpu_jit(lambda x: x + 1.0)
    t_null = bench(null, (jnp.zeros(8, jnp.float32),), args.iters)
    print(f"null program + sync: {t_null*1e6:.0f} us/call")

    for B in [int(x) for x in args.batches.split(",")]:
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        st = tpu_jit(jax.vmap(env.reset))(keys)
        st = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, st)
        qpos, qvel = st.qpos, st.qvel
        params = st.params
        ctrl = jnp.zeros((B, 12), jnp.float32)
        warm = jnp.zeros_like(qvel)

        us = lambda t: f"{t*1e6:10.0f} us"

        jfk = tpu_jit(jax.vmap(lambda qp, qv: fk(m, qp, qv)))
        kin = jfk(qpos, qvel)
        print(f"B={B:>6}  fk        {us(bench(jfk, (qpos, qvel), args.iters))}",
              flush=True)

        jsmooth = tpu_jit(jax.vmap(
            lambda pr, k, qp, qv, c: smooth_dynamics(m, pr, k, qp, qv, c)))
        sm = jsmooth(params, kin, qpos, qvel, ctrl)
        print(f"B={B:>6}  smooth    "
              f"{us(bench(jsmooth, (params, kin, qpos, qvel, ctrl), args.iters))}",
              flush=True)
        M_, L_, qfrc_s, qacc_s, qfrc_a = sm

        jasm = tpu_jit(jax.vmap(
            lambda k, qp, qv: assemble(m, pl_.layout, pl_.table, k, qp, qv)))
        efc = jasm(kin, qpos, qvel)
        print(f"B={B:>6}  assemble  "
              f"{us(bench(jasm, (kin, qpos, qvel), args.iters))}", flush=True)

        try:
            jsolve = tpu_jit(jax.vmap(
                lambda Mm, qa, e, w: solve(m, Mm, qa, e, warmstart=w)))
            _ = jsolve(M_, qacc_s, efc, warm)
            t_solve = bench(jsolve, (M_, qacc_s, efc, warm), args.iters)
            print(f"B={B:>6}  solve     {us(t_solve)}", flush=True)
            qacc_, qfrc_c, con_f = jsolve(M_, qacc_s, efc, warm)
        except Exception as e:
            # standalone solve can OOM scoped vmem where the fused substep
            # program compiles fine — keep going
            print(f"B={B:>6}  solve     FAILED: {str(e)[:120]}", flush=True)
            qacc_ = qacc_s
            con_f = jnp.zeros(
                efc.con_dist.shape + (6,), jnp.float32
            )

        jcfrc = tpu_jit(jax.vmap(
            lambda pr, k, e, f_: F.cfrc_ext(pl_, pr, k, e, f_)))
        _ = jcfrc(params, kin, efc, con_f)
        print(f"B={B:>6}  cfrc_ext  "
              f"{us(bench(jcfrc, (params, kin, efc, con_f), args.iters))}",
              flush=True)

        jint = tpu_jit(jax.vmap(
            lambda pr, qp, qv, qa, Mm: F.integrate(pl_, pr, qp, qv, qa, Mm)))
        _ = jint(params, qpos, qvel, qacc_, M_)
        print(f"B={B:>6}  integrate "
              f"{us(bench(jint, (params, qpos, qvel, qacc_, M_), args.iters))}",
              flush=True)

        jstep = tpu_jit(jax.vmap(
            lambda pr, qp, qv, c, w: F.step(pl_, pr, qp, qv, c, warmstart=w)))
        _ = jstep(params, qpos, qvel, ctrl, warm)
        print(f"B={B:>6}  substep   "
              f"{us(bench(jstep, (params, qpos, qvel, ctrl, warm), args.iters))}",
              flush=True)

        jctrl = tpu_jit(jax.vmap(
            lambda pr, qp, qv, c, w: F.step_n(
                pl_, pr, qp, qv, c, cfg.frame_skip, warmstart=w)))
        _ = jctrl(params, qpos, qvel, ctrl, warm)
        t_ctrl = bench(jctrl, (params, qpos, qvel, ctrl, warm), args.iters)
        print(f"B={B:>6}  ctrl(10x) {us(t_ctrl)}  "
              f"-> {B / t_ctrl:,.0f} env-steps/s", flush=True)


if __name__ == "__main__":
    main()
