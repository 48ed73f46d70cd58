"""Pallas Newton megakernel vs single-env XLA solver equivalence.

The kernel (quadruped_tpu/ops/newton.py) re-implements the Newton solve
with the env batch on the lane axis; these tests pin it against the
oracle-verified single-env path (physics/solver.py) on CPU via Pallas
interpret mode — the same dispatch (custom_vmap rule) that routes real
TPU training batches into the kernel.
"""

import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.physics.constraint import assemble
from quadruped_tpu.physics.kinematics import fk
from quadruped_tpu.physics.smooth import smooth_dynamics
from quadruped_tpu.physics.solver import solve

DATA = pathlib.Path(__file__).parent / "data"
ITERS = int(__import__("os").environ.get("OPS_ITERS", 6))


@pytest.fixture(scope="module", autouse=True)
def _kernel_on_cpu():
    """Route vmapped solves through the interpreted Pallas kernel for THIS
    module only.  Setting the env var at import time leaked into every
    module collected afterwards (ADVICE r1): test_robustness/test_terrain
    would silently exercise the interpreter instead of the compiled XLA
    path.  The solver-core cache is cleared on both edges because the
    dispatch decision is baked in at trace time."""
    from quadruped_tpu.physics import solver as _solver

    _solver._CORE_CACHE.clear()
    old = os.environ.get("QTPU_KERNEL_ON_CPU")
    os.environ["QTPU_KERNEL_ON_CPU"] = "1"
    yield
    if old is None:
        os.environ.pop("QTPU_KERNEL_ON_CPU", None)
    else:
        os.environ["QTPU_KERNEL_ON_CPU"] = old
    _solver._CORE_CACHE.clear()


@pytest.fixture(scope="module", params=["uniform", "pooled"])
def env(request):
    # pooled = condim row pools (per-class top-K, compact rows); the kernel
    # supports both layouts and both must match the single-env path
    pools = (8, 28, 12) if request.param == "pooled" else None
    return Go1Env(Go1Config(ctrl_type="torque", contact_pools=pools))


def _batch_inputs(env, B=3):
    """(M, qacc_smooth, efc, warm) batched over B perturbed f32 states."""
    m = env.m
    pl_ = env.pipeline
    d = np.load(DATA / "stiff_contact_state.npz")
    params = {
        k[6:]: jnp.asarray(d[k], jnp.float32)
        for k in d.files
        if k.startswith("param_")
    }
    home = np.asarray(env.key_qpos, np.float32)
    rng = np.random.default_rng(0)
    qps, qvs = [], []
    for i in range(B):
        if i % 2 == 0:
            # well-conditioned standing states: near-keyframe, light noise.
            # (Deep-penetration states have near-flat objective valleys
            # where truncated-iteration qacc is not a stable contract —
            # those are covered by the finiteness test via env 1.)
            qp = home + rng.normal(0, 0.005, home.shape).astype(np.float32)
            qv = rng.normal(0, 0.1, m.nv).astype(np.float32)
        else:
            qp = d["qpos"].astype(np.float32)
            qv = d["qvel"].astype(np.float32)
        qps.append(qp)
        qvs.append(qv)
    qps = jnp.asarray(np.stack(qps))
    qvs = jnp.asarray(np.stack(qvs))
    ctrl = jnp.asarray(
        rng.uniform(-0.5, 0.5, (B, m.nu)).astype(np.float32)
    )

    def prep(qp, qv, c):
        kin = fk(m, qp, qv)
        M, L, qfs, qacc_smooth, qfa = smooth_dynamics(
            m, params, kin, qp, qv, c
        )
        efc = assemble(m, pl_.layout, pl_.table, kin, qp, qv)
        return M, qacc_smooth, efc

    M, qs, efc = jax.vmap(prep)(qps, qvs, ctrl)
    return m, M, qs, efc


def test_kernel_matches_single_path(env):
    m, M, qs, efc = _batch_inputs(env)
    B = qs.shape[0]

    # batched path -> custom_vmap rule -> Pallas kernel (interpret on CPU)
    qacc_b, qfrc_b, conf_b = jax.vmap(
        lambda Mx, qx, ex: solve(m, Mx, qx, ex, iterations=ITERS)
    )(M, qs, efc)

    # reference: single-env XLA path, env by env
    for i in range(B):
        efc_i = jax.tree.map(lambda x: x[i], efc)
        qacc_s, qfrc_s, conf_s = solve(
            m, M[i], qs[i], efc_i, iterations=ITERS
        )
        scale = 1.0 + float(jnp.abs(qacc_s).max())
        # stiff fixture env: truncated-iteration qacc wanders in the
        # near-flat objective valley, so pin it loosely; clean states tight
        tol = 5e-2 if i % 2 == 1 else 5e-3
        np.testing.assert_allclose(
            np.asarray(qacc_b[i]) / scale, np.asarray(qacc_s) / scale,
            atol=tol, err_msg=f"qacc mismatch env {i}",
        )
        if i % 2 == 1:
            # stiff fixture env: constraint forces along near-rigid modes
            # are hypersensitive to the remaining Newton residual (f = D z
            # with D ~ 2e3), so at the test's truncated iteration count
            # only qacc is comparable; force convergence on ordinary
            # states is pinned below
            continue
        fscale = 1.0 + float(jnp.abs(qfrc_s).max())
        np.testing.assert_allclose(
            np.asarray(qfrc_b[i]) / fscale, np.asarray(qfrc_s) / fscale,
            atol=2e-2, err_msg=f"qfrc mismatch env {i}",
        )
        cscale = 1.0 + float(jnp.abs(conf_s).max())
        np.testing.assert_allclose(
            np.asarray(conf_b[i]) / cscale, np.asarray(conf_s) / cscale,
            atol=2e-2, err_msg=f"con_force mismatch env {i}",
        )


def test_kernel_finite_on_stiff_state(env):
    """The float32 robustness guards (Cholesky retry, NaN-safe argmin)
    must hold inside the kernel on the captured pre-NaN state."""
    m, M, qs, efc = _batch_inputs(env)
    qacc_b, qfrc_b, conf_b = jax.vmap(
        lambda Mx, qx, ex: solve(m, Mx, qx, ex, iterations=ITERS)
    )(M, qs, efc)
    assert bool(jnp.isfinite(qacc_b).all())
    assert bool(jnp.isfinite(qfrc_b).all())
    assert bool(jnp.isfinite(conf_b).all())


def test_gram_mxu_matches_vpu(env):
    """The MXU-packed Gram (gram_mode='mxu', PLAN lever 3) computes the
    same Hessian as the VPU row-product path.

    Compared at 2 Newton iterations: the packed-lane pipeline is exact to
    f32 summation order (isolated Gram error ~2e-6), but beyond ~3
    iterations the line-search ladder's cone-zone branches amplify last-ulp
    H differences chaotically (measured VPU-vs-MXU qacc spread: 2e-4 @ 2
    iters -> 4.5e-2 @ 6 on the stiff fixture state) — the same
    sensitivity the single-path oracle test tolerates at 5e-2.  Two
    iterations pin the packing math (every group/roll/scatter constant)
    while staying pre-chaos."""
    from quadruped_tpu.ops.newton import newton_solve_batched

    m, M, qs, efc = _batch_inputs(env)
    warm = jnp.zeros_like(qs)
    ncon = efc.con_dist.shape[-1]
    call = lambda mode: newton_solve_batched(
        M, qs, warm, efc.J, efc.aref, efc.D, efc.R, efc.floss, efc.active,
        efc.con_scale, efc.con_fscale, efc.con_dim_mask, efc.con_active,
        efc.con_Rn, efc.con_mu_tilde,
        nv=qs.shape[-1], nf=efc.nf, nl=efc.nl, K=ncon, iterations=2,
        interpret=True, pool_dims=efc.pool_dims, gram_mode=mode,
    )
    qacc_v, f_v, qfrc_v = call("vpu")
    qacc_m, f_m, qfrc_m = call("mxu")
    assert bool(jnp.isfinite(qacc_m).all())
    for a, b, name in ((qacc_v, qacc_m, "qacc"), (qfrc_v, qfrc_m, "qfrc")):
        scale = 1.0 + float(jnp.abs(a).max())
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            atol=1e-3, err_msg=f"{name} vpu-vs-mxu",
        )
