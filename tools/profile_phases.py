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
    args = p.parse_args()

    cfg = Go1Config(ctrl_type=args.ctrl_type, collision_mode=args.collision)
    if args.max_contacts is not None:
        cfg.max_contacts = args.max_contacts
    env = Go1Env(cfg)
    pl_ = env.pipeline
    m = env.m
    print(f"backend: {jax.devices()[0].platform}  ncand={pl_.table.ncand} "
          f"max_contacts={pl_.layout.max_contacts} nefc={pl_.layout.nefc} "
          f"iterations={m.opt.iterations}")

    # null-program overhead: dispatch + 4-byte D2H round trip
    null = jax.jit(lambda x: x + 1.0)
    t_null = bench(null, (jnp.zeros(8, jnp.float32),), args.iters)
    print(f"null program + sync: {t_null*1e6:.0f} us/call")

    for B in [int(x) for x in args.batches.split(",")]:
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        st = jax.jit(jax.vmap(env.reset))(keys)
        st = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, st)
        qpos, qvel = st.qpos, st.qvel
        params = st.params
        ctrl = jnp.zeros((B, 12), jnp.float32)
        warm = jnp.zeros_like(qvel)

        jfk = jax.jit(jax.vmap(lambda qp, qv: fk(m, qp, qv)))
        kin = jfk(qpos, qvel)
        t_fk = bench(jfk, (qpos, qvel), args.iters)

        jsmooth = jax.jit(jax.vmap(
            lambda pr, k, qp, qv, c: smooth_dynamics(m, pr, k, qp, qv, c)))
        sm = jsmooth(params, kin, qpos, qvel, ctrl)
        t_sm = bench(jsmooth, (params, kin, qpos, qvel, ctrl), args.iters)
        M_, L_, qfrc_s, qacc_s, qfrc_a = sm

        jasm = jax.jit(jax.vmap(
            lambda k, qp, qv: assemble(m, pl_.layout, pl_.table, k, qp, qv)))
        efc = jasm(kin, qpos, qvel)
        t_asm = bench(jasm, (kin, qpos, qvel), args.iters)

        jsolve = jax.jit(jax.vmap(
            lambda Mm, qa, e, w: solve(m, Mm, qa, e, warmstart=w)))
        _ = jsolve(M_, qacc_s, efc, warm)
        t_solve = bench(jsolve, (M_, qacc_s, efc, warm), args.iters)

        jstep = jax.jit(jax.vmap(
            lambda pr, qp, qv, c, w: F.step(pl_, pr, qp, qv, c, warmstart=w)))
        _ = jstep(params, qpos, qvel, ctrl, warm)
        t_step = bench(jstep, (params, qpos, qvel, ctrl, warm), args.iters)

        jctrl = jax.jit(jax.vmap(
            lambda pr, qp, qv, c, w: F.step_n(
                pl_, pr, qp, qv, c, cfg.frame_skip, warmstart=w)))
        _ = jctrl(params, qpos, qvel, ctrl, warm)
        t_ctrl = bench(jctrl, (params, qpos, qvel, ctrl, warm), args.iters)

        us = lambda t: f"{t*1e6:10.0f}"
        print(f"B={B:>6}  (us/call)  fk {us(t_fk)}  smooth {us(t_sm)}  "
              f"assemble {us(t_asm)}  solve {us(t_solve)}  "
              f"substep {us(t_step)}  ctrlstep(10x) {us(t_ctrl)}  "
              f"-> {B / t_ctrl:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
