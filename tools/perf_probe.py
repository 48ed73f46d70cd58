#!/usr/bin/env python
"""Unified performance/bottleneck probe (consolidates the round 2-3
investigation ladder: dispatch_probe{,2,3,4}.py, kbench{,2}.py,
debug_mxu_{gram,kernel}.py — VERDICT r3 weak #7).

Subcommands (all take the chip politely via tpulock where needed):

  kernel       Newton megakernel microbench (the old kbench): random
               well-conditioned inputs, uniform contact layout.
               --B --iters --gram {vpu,mxu}
  rollout      live rollout dispatch pattern (probe2 F/G/H): chunked
               programs + host concat + sync; fresh vs evolved state;
               optional host-CPU hogs.
  iteration    full rollout+update iterations, hard-synced per phase
               (probe3) — the steady-state trainer number.
               --collision {full,plane} re-runs the round-3 root-cause A/B
  evalpoison   train -> eval -> train (probe4): does an eval change
               subsequent training dispatch?
  gram-parity  CPU-only MXU-vs-VPU Gram/kernel parity (debug_mxu_*):
               pure-jnp packed-Gram check + interpret-mode kernel diff.

Historical findings these probes produced (PLAN.md): the 4.5x train-vs-
bench gap was the CLI's --collision plane default; the MXU Gram was
rejected on-chip (12.25 -> 14.30 ms/solve); program content/chunking/
host-CPU load were all eliminated.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

NUM_ENVS = 4096
N_STEPS = 64


def _sync(x):
    import jax
    import jax.numpy as jnp

    float(jax.device_get(jnp.asarray(x).reshape(-1)[0]))


def _take_chip():
    from quadruped_tpu.utils import tpulock

    if not tpulock.acquire_with_preempt(
        "bench", timeout_s=float(os.environ.get("QTPU_LOCK_TIMEOUT", "420"))
    ):
        print(f"lock contested (holder={tpulock.holder()}); probing anyway",
              flush=True)
    from quadruped_tpu.utils import cache as _cache

    _cache.enable()
    return tpulock


def _flagship_env(collision="full"):
    from quadruped_tpu.env.config import Go1Config
    from quadruped_tpu.env.go1 import Go1Env

    return Go1Env(Go1Config(
        ctrl_type="position", solver_iterations=8,
        contact_pools=(8, 28, 12) if collision == "full" else None,
        reward_floor=False, accel_cost_mode="plain", max_unhealthy_time=1.0,
        fallen_start_prob=0.0, collision_mode=collision,
    ))


def _trainer(env):
    from quadruped_tpu.learn.ppo import PPO, PPOConfig

    cfg = PPOConfig(num_envs=NUM_ENVS, n_steps=N_STEPS, rollout_chunk=2,
                    num_minibatches=8, n_epochs=5)
    return PPO(env, cfg)


# --------------------------------------------------------------------- kernel

def cmd_kernel(args):
    lock = _take_chip()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quadruped_tpu.ops.newton import newton_solve_batched

    B, iters = args.B, args.iters
    nv, nf, nl, K = 18, 12, 12, 16
    ne = nf + nl + 6 * K
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
    Mh = rng.normal(0, 1, (B, nv, nv)).astype(np.float32)
    M = jnp.asarray(Mh @ Mh.transpose(0, 2, 1) + 3 * np.eye(nv, dtype=np.float32))
    kw = dict(
        M=M, qacc_smooth=r(B, nv), warmstart=r(B, nv), J=r(B, ne, nv) * 0.3,
        aref=r(B, ne), D=jnp.abs(r(B, ne)) * 100, R=jnp.abs(r(B, ne)) * 0.01,
        floss=jnp.abs(r(B, ne)), active=jnp.ones((B, ne), jnp.float32),
        con_scale=jnp.abs(r(B, K, 6)) + 1, con_fscale=jnp.abs(r(B, K, 6)) + 1,
        con_dim_mask=jnp.ones((B, K, 6), jnp.float32),
        con_active=jnp.ones((B, K), jnp.float32),
        con_Rn=jnp.abs(r(B, K)) * 0.1 + 0.01, con_mu=jnp.abs(r(B, K)) * 0.2,
    )
    static = dict(nv=nv, nf=nf, nl=nl, K=K, iterations=iters,
                  gram_mode=args.gram)
    t0 = time.time()
    out = newton_solve_batched(**kw, **static)
    _sync(out[0])
    print(f"compile+1run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    N = 30
    for _ in range(N):
        out = newton_solve_batched(**kw, **static)
    _sync(out[0])
    dt = (time.time() - t0) / N
    print(json.dumps({
        "B": B, "iters": iters, "gram": args.gram,
        "ms_per_solve": round(dt * 1e3, 3),
        "env_solves_per_sec": round(B / dt, 1),
    }), flush=True)
    lock.release()


# -------------------------------------------------------------------- rollout

def cmd_rollout(args):
    lock = _take_chip()
    import jax
    import multiprocessing

    trainer = _trainer(_flagship_env())
    ts = trainer.init(jax.random.PRNGKey(0))

    def rollout_once(ts):
        ts, traj = trainer.rollout_chunked(ts)
        _sync(traj.reward)
        return ts

    t0 = time.perf_counter()
    ts = rollout_once(ts)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

    def timed(tag, ts):
        t0 = time.perf_counter()
        ts = rollout_once(ts)
        dt = time.perf_counter() - t0
        print(f"  {tag:<50s} {dt:7.2f} s "
              f"({NUM_ENVS*N_STEPS/dt:,.0f} steps/s)", flush=True)
        return ts

    ts = timed("F live pattern (chunked + concat), fresh", ts)
    ts = timed("F again", ts)
    for _ in range(3):
        ts = rollout_once(ts)
    ts = timed("G evolved state regime", ts)

    if args.hogs:
        stop = multiprocessing.Event()

        def cpu_hog(stop):
            x = 1.0
            while not stop.is_set():
                x = x * 1.0000001 + 1e-9

        hogs = [multiprocessing.Process(target=cpu_hog, args=(stop,))
                for _ in range(args.hogs)]
        for h in hogs:
            h.start()
        try:
            ts = timed(f"H + {args.hogs} host CPU hogs", ts)
        finally:
            stop.set()
            for h in hogs:
                h.join(timeout=5)
                h.terminate()
    lock.release()


# ------------------------------------------------------------------ iteration

def cmd_iteration(args):
    lock = _take_chip()
    import jax

    trainer = _trainer(_flagship_env(args.collision))
    ts = trainer.init(jax.random.PRNGKey(0))

    t0 = time.perf_counter()
    ts2, traj = trainer.rollout_chunked(ts)
    _sync(traj.reward)
    ts3, m = trainer._update_with_metrics(ts2, traj)
    _sync(m["mean_reward"])
    print(f"warm: {time.perf_counter() - t0:.1f} s", flush=True)
    ts = ts3

    for it in range(args.n):
        t0 = time.perf_counter()
        ts2, traj = trainer.rollout_chunked(ts)
        _sync(traj.reward)
        t1 = time.perf_counter()
        for leaf in jax.tree.leaves(traj):
            _sync(leaf)
        t2 = time.perf_counter()
        ts3, m = trainer._update_with_metrics(ts2, traj)
        _sync(m["mean_reward"])
        t3 = time.perf_counter()
        for leaf in jax.tree.leaves(ts3.params):
            _sync(leaf)
        t4 = time.perf_counter()
        print(
            f"iter {it}: rollout {t1-t0:7.2f}s | sync traj {t2-t1:6.2f}s | "
            f"update {t3-t2:6.2f}s | sync params {t4-t3:5.2f}s | "
            f"total {t4-t0:7.2f}s ({NUM_ENVS*N_STEPS/(t4-t0):,.0f} steps/s)",
            flush=True,
        )
        ts = ts3
    lock.release()


# ----------------------------------------------------------------- evalpoison

def cmd_evalpoison(args):
    lock = _take_chip()
    os.environ.setdefault("QTPU_EVAL_CHUNK", "100")
    import jax

    from quadruped_tpu.learn.runner import Runner, RunnerConfig

    env = _flagship_env()
    trainer = _trainer(env)
    runner = Runner(env, trainer.cfg, RunnerConfig(
        n_eval_episodes=2, eval_max_time=60.0, save_videos=False,
        verbose=False,
    ), trainer=trainer)
    ts = trainer.init(jax.random.PRNGKey(0))

    def one_iter(ts, tag):
        t0 = time.perf_counter()
        ts, m = trainer.train_iteration_chunked(ts)
        _sync(m["mean_reward"])
        dt = time.perf_counter() - t0
        print(f"  {tag:<28s} {dt:7.2f}s "
              f"({NUM_ENVS*N_STEPS/dt:,.0f} steps/s)", flush=True)
        return ts

    t0 = time.perf_counter()
    ts, _m = trainer.train_iteration_chunked(ts)
    _sync(jax.tree.leaves(ts.params)[0])
    print(f"warm: {time.perf_counter() - t0:.1f} s", flush=True)
    ts = one_iter(ts, "train pre-eval 1")
    ts = one_iter(ts, "train pre-eval 2")
    t0 = time.perf_counter()
    ep_rew, *_ = runner.evaluate(ts, jax.random.PRNGKey(7))
    print(f"  eval                         {time.perf_counter()-t0:7.2f}s "
          f"reward {float(ep_rew.mean()):.2f}", flush=True)
    for i in range(3):
        ts = one_iter(ts, f"train post-eval {i+1}")
    lock.release()


# ------------------------------------------------------------------- assemble

def cmd_assemble(args):
    """Drill into the assemble stage at the PRODUCTION profile (pools
    8,28,12 + batch-last) — profile_phases r4 measured it at 37.4 ms of
    the 63 ms/substep budget (59%).  Times narrowphase alone, then
    narrowphase + pool compaction/gathers, then full assemble, all under
    the same batch-last dispatch production uses."""
    lock = _take_chip()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quadruped_tpu.physics.collision import narrowphase
    from quadruped_tpu.physics.constraint import (
        _packed_const, assemble_auto,
    )
    from quadruped_tpu.physics.dispatch import batch_last
    from quadruped_tpu.physics.kinematics import fk
    from quadruped_tpu.utils import tpu_jit

    env = _flagship_env()
    m, pl_ = env.m, env.pipeline
    layout, table = pl_.layout, pl_.table
    B = args.B
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    st = tpu_jit(jax.vmap(env.reset))(keys)
    st = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, st)
    qpos, qvel = st.qpos, st.qvel
    kin = tpu_jit(jax.vmap(lambda qp, qv: fk(m, qp, qv)))(qpos, qvel)

    def bench(fn, fargs, iters=10):
        out = fn(*fargs)
        _sync(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*fargs)
        _sync(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    print(f"B={B} ncand={table.ncand} pools={layout.pools is not None} "
          f"nefc={layout.nefc}", flush=True)

    nar = batch_last(lambda k: narrowphase(m, table, k))
    jnar = tpu_jit(jax.vmap(nar))
    print(f"  narrowphase              "
          f"{bench(jnar, (kin,))*1e6:9.0f} us", flush=True)

    # narrowphase + pool compaction + packed gathers (mirrors
    # constraint.assemble's pooled selection block, stopping before the
    # J-row construction)
    incm_all = jnp.asarray(np.asarray(layout.con_includemargin), jnp.float32)
    const_tbl = jnp.asarray(_packed_const(layout), jnp.float32)

    def sel_block(k):
        dist_all, pos_all, frame_all = narrowphase(m, table, k)
        act_all = dist_all < incm_all
        data = jnp.concatenate(
            [dist_all[:, None], pos_all, frame_all.reshape(-1, 9)], axis=1
        )
        outs = []
        for cdim, idx, Kc in layout.pools:
            if Kc == 0:
                continue
            idxj = jnp.asarray(idx)
            act_c = act_all[idxj]
            cs = jnp.cumsum(act_c.astype(jnp.int32))
            ks = jnp.arange(Kc, dtype=jnp.int32)
            sel_local = jnp.sum(
                (cs[None, :] <= ks[:, None]).astype(jnp.int32), axis=1
            )
            sel_local = jnp.minimum(sel_local, len(idx) - 1)
            sel_c = idxj[sel_local]
            outs.append((data[sel_c], const_tbl[sel_c]))
        return tuple(outs)

    jsel = tpu_jit(jax.vmap(batch_last(sel_block)))
    print(f"  + pool compact+gathers   "
          f"{bench(jsel, (kin,))*1e6:9.0f} us", flush=True)

    jasm = tpu_jit(jax.vmap(
        lambda k, qp, qv: assemble_auto(m, layout, table, k, qp, qv)
    ))
    print(f"  full assemble            "
          f"{bench(jasm, (kin, qpos, qvel))*1e6:9.0f} us", flush=True)
    lock.release()


# ---------------------------------------------------------------- gram parity

def cmd_gram_parity(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from quadruped_tpu.ops.newton import (
        _grp_of, _mxu_consts, _ngroups, _pack_groups,
    )

    # 1) pure-jnp packed-Gram math vs einsum reference
    nv, ne, B = 18, 40, 128
    rng = np.random.default_rng(0)
    J = rng.normal(size=(B, ne, nv)).astype(np.float32)
    w = rng.uniform(0.0, 2.0, size=(ne, B)).astype(np.float32)
    H_ref = np.einsum("bri,rb,brj->bij", J, w, J)
    grp, G = _grp_of(nv), _ngroups(nv)
    E, W0, maskY = _mxu_consts(nv)
    Jpack = np.asarray(_pack_groups(jnp.asarray(J), nv))
    Hc = np.zeros((nv, nv * 128), np.float32)
    for g in range(G):
        Jp = Jpack[g]
        Wp = w @ E[g]
        Gg = Jp.T @ (Wp * Jp)
        Yg = np.zeros((nv, 128), np.float32)
        for e in range(grp):
            Yg += Gg[nv * e: nv * e + nv, :] * maskY[e: e + 1, :]
        Hc += np.roll(Yg @ W0, grp * g, axis=1)
    H_mxu = np.transpose(np.stack(
        [Hc[:, 128 * j: 128 * (j + 1)] for j in range(nv)], axis=1
    ), (2, 0, 1))
    rel = np.abs(H_mxu - H_ref) / (1.0 + np.abs(H_ref))
    print(f"packed-Gram math: max rel err {rel.max():.2e} "
          f"(bad@1e-3: {int((rel > 1e-3).sum())})", flush=True)

    # 2) interpret-mode kernel diff on real Go1 states, both layouts
    sys.path.insert(0, str(REPO / "tests"))
    from test_ops import ITERS, _batch_inputs

    from quadruped_tpu.env.config import Go1Config
    from quadruped_tpu.env.go1 import Go1Env
    from quadruped_tpu.ops.newton import newton_solve_batched

    for pools in (None, (8, 28, 12)):
        env = Go1Env(Go1Config(ctrl_type="torque", contact_pools=pools))
        _m, M, qs, efc = _batch_inputs(env)
        warm = jnp.zeros_like(qs)
        ncon = efc.con_dist.shape[-1]
        call = lambda mode: newton_solve_batched(
            M, qs, warm, efc.J, efc.aref, efc.D, efc.R, efc.floss,
            efc.active, efc.con_scale, efc.con_fscale, efc.con_dim_mask,
            efc.con_active, efc.con_Rn, efc.con_mu_tilde,
            nv=qs.shape[-1], nf=efc.nf, nl=efc.nl, K=ncon,
            iterations=ITERS, interpret=True, pool_dims=efc.pool_dims,
            gram_mode=mode,
        )
        a = np.asarray(call("vpu")[0])
        b = np.asarray(call("mxu")[0])
        d = np.abs(a - b) / (1.0 + np.abs(a).max())
        print(f"kernel vpu-vs-mxu pools={pools}: max normalized qacc diff "
              f"{d.max():.2e}", flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    k = sub.add_parser("kernel")
    k.add_argument("--B", type=int, default=4096)
    k.add_argument("--iters", type=int, default=8)
    k.add_argument("--gram", default="vpu", choices=["vpu", "mxu"])
    r = sub.add_parser("rollout")
    r.add_argument("--hogs", type=int, default=2)
    i = sub.add_parser("iteration")
    i.add_argument("--n", type=int, default=4)
    i.add_argument("--collision", default="full", choices=["full", "plane"])
    sub.add_parser("evalpoison")
    a = sub.add_parser("assemble")
    a.add_argument("--B", type=int, default=4096)
    sub.add_parser("gram-parity")
    args = ap.parse_args()
    {
        "kernel": cmd_kernel,
        "rollout": cmd_rollout,
        "iteration": cmd_iteration,
        "evalpoison": cmd_evalpoison,
        "assemble": cmd_assemble,
        "gram-parity": cmd_gram_parity,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
