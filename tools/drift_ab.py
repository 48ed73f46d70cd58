"""Trajectory-drift A/B harness: our engine vs the MuJoCo oracle.

Steps both engines from the home pose with the same random ctrl sequence
for N substeps (state-coupled, warmstarted) and reports max qpos/qvel
drift — the measurement behind PLAN.md's solver-profile tables
(iterations, line-search rungs).

The solver profile under test comes from the environment:
    QTPU_SOLVER_ITERS=8 QTPU_LS_RUNGS=8 python tools/drift_ab.py
Runs the XLA single-env path on CPU (the kernel shares its formulas and
is pinned against it by tests/test_ops.py).

Usage: python tools/drift_ab.py [--substeps 300] [--iters 8]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import mujoco  # noqa: E402
import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--substeps", type=int, default=300)
    p.add_argument("--iters", type=int,
                   default=int(os.environ.get("QTPU_SOLVER_ITERS", "8")))
    p.add_argument("--ctrl_type", default="torque")
    p.add_argument("--pools", default=None,
                   help="'K6,K3,K1' condim row pools, e.g. '8,28,12'")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from quadruped_tpu.assets import robot_model, robot_xml
    from quadruped_tpu.physics.forward import Pipeline, step

    m = robot_model("go1", args.ctrl_type)
    m.opt.iterations = args.iters
    pools = (dict(zip((6, 3, 1), map(int, args.pools.split(","))))
             if args.pools else None)
    pl_ = Pipeline.build(m, "full", max_contacts=48, contact_pools=pools)
    mj = mujoco.MjModel.from_xml_string(robot_xml("go1", args.ctrl_type))
    d = mujoco.MjData(mj)

    rng = np.random.default_rng(args.seed)
    ctrls = rng.uniform(-0.4, 0.4, (args.substeps // 10 + 1, 12))

    d.qpos[:] = mj.key_qpos[0]
    d.qvel[:] = 0.0
    q = jnp.asarray(d.qpos, jnp.float32)
    v = jnp.zeros(m.nv, jnp.float32)
    params = m.params()
    stepj = jax.jit(lambda qq, vv, cc, ww: step(pl_, params, qq, vv, cc,
                                                warmstart=ww))

    # first substep un-warmstarted (solve falls back to qacc_smooth)
    c0 = jnp.asarray(ctrls[0], jnp.float32)
    d.ctrl[:] = ctrls[0]
    mujoco.mj_step(mj, d)
    q, v, data = step(pl_, params, q, v, c0)
    warm = data.qacc

    max_dq = max_dv = 0.0
    for i in range(1, args.substeps):
        c = ctrls[i // 10]
        d.ctrl[:] = c
        mujoco.mj_step(mj, d)
        q, v, data = stepj(q, v, jnp.asarray(c, jnp.float32), warm)
        warm = data.qacc
        max_dq = max(max_dq, float(np.abs(np.asarray(q, np.float64)
                                          - d.qpos).max()))
        max_dv = max(max_dv, float(np.abs(np.asarray(v, np.float64)
                                          - d.qvel).max()))
    rungs = os.environ.get("QTPU_LS_RUNGS", "16")
    print(f"iters={args.iters} rungs={rungs} pools={args.pools} "
          f"substeps={args.substeps}: "
          f"max qpos drift {max_dq:.2e}  max qvel drift {max_dv:.2e}")


if __name__ == "__main__":
    main()
