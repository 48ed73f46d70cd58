"""Round-5 assembly-stage attribution probe (VERDICT r4 next #2).

Evidence harness for the 10x perf attack: the r4 breakdown said the
~30 ms assemble stage splits into narrowphase ~13 / pool-compaction
gathers ~7 / J-rows ~8, all small-op overhead rather than FLOPs.  This
probe (a) re-measures those on current code, and (b) A/Bs the candidate
replacement primitives on SYNTHETIC tensors of exactly the production
shapes, so the rewrite can be chosen from measurements instead of
lowering folklore:

  gather A/B   : per-env dynamic row-gather (take_along_axis) vs one-hot
                 matmul vs one-hot masked-sum, batch-major and batch-last
  einsum A/B   : the J-row contraction patterns batch-major vs batch-last

Usage:  python tools/asm_probe2.py [--batch 4096] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_tpu.utils import tpu_jit
from quadruped_tpu.utils import cache as _cache

_cache.enable()


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jax.device_get(jnp.ravel(leaf)[0]))


def bench(fn, args, iters):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--skip_real", action="store_true")
    args = p.parse_args()
    B = args.batch

    if not os.environ.get("QTPU_FORCE_CPU"):
        from quadruped_tpu.utils import tpulock

        if not tpulock.acquire_with_preempt("bench", timeout_s=420.0):
            print(f"lock contested (holder={tpulock.holder()})", flush=True)
        import atexit

        atexit.register(tpulock.release)
    else:
        jax.config.update("jax_platforms", "cpu")

    ms = lambda t: f"{t*1e3:8.2f} ms"
    key = jax.random.PRNGKey(0)

    # ---------------- synthetic: compaction gather A/B ----------------
    # production shapes: 811 candidates -> 48 pooled slots, ~30 payload
    # columns (13 data + 18 const493)
    NC, K, C = 811, 48, 30
    data_bm = jax.random.normal(key, (B, NC, C), jnp.float32)
    sel_bm = jax.random.randint(key, (B, K), 0, NC, jnp.int32)
    data_bl = jnp.transpose(data_bm, (1, 2, 0))   # (NC, C, B)
    sel_bl = jnp.transpose(sel_bm, (1, 0))        # (K, B)

    @tpu_jit
    def g_take_bm(d, s):
        return jnp.take_along_axis(d, s[:, :, None], axis=1)

    @tpu_jit
    def g_onehot_mm_bm(d, s):
        oh = (s[:, :, None] == jnp.arange(NC)[None, None, :]).astype(
            jnp.float32
        )                                           # (B, K, NC)
        return jnp.einsum("bkn,bnc->bkc", oh, d)

    @tpu_jit
    def g_take_bl(d, s):
        # vmap over the trailing env axis: per-env row gather
        return jax.vmap(lambda dd, ss: dd[ss], in_axes=(2, 1), out_axes=2)(
            d, s
        )

    @tpu_jit
    def g_onehot_sum_bl(d, s):
        oh = (s[:, None, :] == jnp.arange(NC)[None, :, None])  # (K, NC, B)
        return jnp.sum(
            jnp.where(oh[:, :, None, :], d[None, :, :, :], 0.0), axis=1
        )                                           # (K, C, B)

    print(f"B={B}  gather {NC}->{K} rows x {C} cols", flush=True)
    print(f"  take_along (batch-major) {ms(bench(g_take_bm, (data_bm, sel_bm), args.iters))}", flush=True)
    print(f"  onehot-mm  (batch-major) {ms(bench(g_onehot_mm_bm, (data_bm, sel_bm), args.iters))}", flush=True)
    print(f"  take vmap  (batch-last)  {ms(bench(g_take_bl, (data_bl, sel_bl), args.iters))}", flush=True)
    try:
        print(f"  onehot-sum (batch-last)  {ms(bench(g_onehot_sum_bl, (data_bl, sel_bl), args.iters))}", flush=True)
    except Exception as e:
        print(f"  onehot-sum (batch-last)  FAILED {str(e)[:80]}", flush=True)

    # constant-table gather: env-independent table -> true MXU matmul
    tbl = jax.random.normal(key, (NC, C), jnp.float32)

    @tpu_jit
    def g_const_mm(s):
        oh = (s.reshape(-1)[:, None] == jnp.arange(NC)[None, :]).astype(
            jnp.float32
        )                                           # (B*K, NC)
        return (oh @ tbl).reshape(B, K, C)

    @tpu_jit
    def g_const_take(s):
        return tbl[s]

    print(f"  const-tbl take           {ms(bench(g_const_take, (sel_bm,), args.iters))}", flush=True)
    print(f"  const-tbl onehot@mxu     {ms(bench(g_const_mm, (sel_bm,), args.iters))}", flush=True)

    # ---------------- synthetic: cumsum+compare selection ----------------
    act = jax.random.bernoulli(key, 0.05, (B, NC))

    @tpu_jit
    def sel_cumsum_bm(a):
        cs = jnp.cumsum(a.astype(jnp.int32), axis=1)
        ks = jnp.arange(K, dtype=jnp.int32)
        return jnp.sum(
            (cs[:, None, :] <= ks[None, :, None]).astype(jnp.int32), axis=2
        )

    @tpu_jit
    def sel_cumsum_bl(a):
        cs = jnp.cumsum(a.astype(jnp.int32), axis=0)      # (NC, B)
        ks = jnp.arange(K, dtype=jnp.int32)
        return jnp.sum(
            (cs[None, :, :] <= ks[:, None, None]).astype(jnp.int32), axis=1
        )

    print(f"  sel cumsum (batch-major) {ms(bench(sel_cumsum_bm, (act,), args.iters))}", flush=True)
    print(f"  sel cumsum (batch-last)  {ms(bench(sel_cumsum_bl, (act.T,), args.iters))}", flush=True)

    # ---------------- synthetic: J-row einsum A/B ----------------
    nv, KK = 18, 48
    cdof = jax.random.normal(key, (nv, 6), jnp.float32)
    arm_bm = jax.random.normal(key, (B, KK, 3), jnp.float32)
    frame_bm = jax.random.normal(key, (B, KK, 3, 3), jnp.float32)
    sgn_bm = jax.random.normal(key, (B, KK, nv), jnp.float32)

    @tpu_jit
    def jrow_bm(arm, frame, sgn):
        jt = cdof[None, None, :, 3:] + jnp.cross(
            cdof[None, None, :, :3], arm[:, :, None, :]
        )
        jt = jt * sgn[..., None]
        jr = jnp.broadcast_to(
            cdof[None, None, :, :3], jt.shape
        ) * sgn[..., None]
        return jnp.concatenate(
            [
                jnp.einsum("bcdk,bcik->bcid", jt, frame),
                jnp.einsum("bcdk,bcik->bcid", jr, frame),
            ],
            axis=2,
        )

    arm_bl = jnp.transpose(arm_bm, (1, 2, 0))      # (K, 3, B)
    frame_bl = jnp.transpose(frame_bm, (1, 2, 3, 0))
    sgn_bl = jnp.transpose(sgn_bm, (1, 2, 0))      # (K, nv, B)

    @tpu_jit
    def jrow_bl(arm, frame, sgn):
        # components unrolled, batch stays minor: all ops are (K, nv, B)ish
        a0, a1, a2 = arm[:, 0], arm[:, 1], arm[:, 2]        # (K, B)
        w = cdof[:, :3]
        v = cdof[:, 3:]
        jts = []
        for d in range(nv):
            cx = w[d, 1] * a2 - w[d, 2] * a1 + v[d, 0]
            cy = w[d, 2] * a0 - w[d, 0] * a2 + v[d, 1]
            cz = w[d, 0] * a1 - w[d, 1] * a2 + v[d, 2]
            jts.append(jnp.stack([cx, cy, cz]))             # (3, K, B)
        jt = jnp.stack(jts, axis=0) * sgn.transpose(1, 0, 2)[:, None]  # (nv,3,K,B)
        out = []
        for i in range(3):
            fi = frame[:, i]                                # (K, 3, B)
            out.append(jnp.einsum("dxkb,kxb->dkb", jt, fi))
        return jnp.stack(out, axis=0)                       # (3, nv, K, B)

    print(f"  jrow einsum (batch-major){ms(bench(jrow_bm, (arm_bm, frame_bm, sgn_bm), args.iters))}", flush=True)
    try:
        print(f"  jrow unroll (batch-last) {ms(bench(jrow_bl, (arm_bl, frame_bl, sgn_bl), args.iters))}", flush=True)
    except Exception as e:
        print(f"  jrow unroll FAILED {str(e)[:100]}", flush=True)

    if args.skip_real:
        return

    # ---------------- real pipeline stages ----------------
    from quadruped_tpu.env.config import Go1Config
    from quadruped_tpu.env.go1 import Go1Env
    from quadruped_tpu.physics.collision import narrowphase
    from quadruped_tpu.physics.constraint import assemble, assemble_auto
    from quadruped_tpu.physics.kinematics import fk

    env = Go1Env(Go1Config(
        ctrl_type="torque", solver_iterations=8, contact_pools=(8, 28, 12),
    ))
    m, pl_ = env.m, env.pipeline
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    st = tpu_jit(jax.vmap(env.reset))(keys)
    st = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, st)
    qpos, qvel = st.qpos, st.qvel

    jfk = tpu_jit(jax.vmap(lambda qp, qv: fk(m, qp, qv)))
    kin = jfk(qpos, qvel)
    print(f"  [real] fk                {ms(bench(jfk, (qpos, qvel), args.iters))}", flush=True)

    jnar = tpu_jit(jax.vmap(
        lambda k: narrowphase(m, pl_.table, k, defer_cyl=pl_.layout.defer_cyl)
    ))
    _ = jnar(kin)
    print(f"  [real] narrowphase(defer){ms(bench(jnar, (kin,), args.iters))}", flush=True)

    jasm = tpu_jit(jax.vmap(
        lambda k, qp, qv: assemble(m, pl_.layout, pl_.table, k, qp, qv)))
    _ = jasm(kin, qpos, qvel)
    print(f"  [real] assemble bm       {ms(bench(jasm, (kin, qpos, qvel), args.iters))}", flush=True)

    jasm2 = tpu_jit(lambda k, qp, qv: jax.vmap(
        lambda kk, q1, q2: assemble_auto(m, pl_.layout, pl_.table, kk, q1, q2)
    )(k, qp, qv))
    try:
        _ = jasm2(kin, qpos, qvel)
        print(f"  [real] assemble auto(bl) {ms(bench(jasm2, (kin, qpos, qvel), args.iters))}", flush=True)
    except Exception as e:
        print(f"  [real] assemble auto FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
