"""One-hot slot-gather + unrolled J-row equivalence (round-5 perf lever).

constraint._gather_rows replaces the per-env top-K row gathers with
one-hot matmuls (on-chip A/B tools/asm_probe2.py: 11.4 -> 4.3 ms at
production shapes), and the contact-Jacobian block replaces the
3-trailing-dim cross/einsum formulation with component-unrolled 2-D math
(8.7 -> 3.0 ms).

Equivalence bars, per lever:

  * gather: BITWISE.  A one-hot row has exactly one nonzero, and
    Precision.HIGHEST splits f32 operands exactly, so oh @ data
    reproduces data[sel] bit-for-bit.
  * J-rows: same math, same written operation order — but XLA lowers the
    einsum contraction through dot/FMA kernels whose accumulation
    rounding differs from elementwise mul+add at the last bit (measured:
    109/3024 J elements off by 1 ULP, association orders ruled out).
    Bar: the POOL-NEUTRALITY standard (PLAN lever 1 / tools/drift_ab.py)
    — trajectory drift from contact-rich fallen states within the same
    envelope layout changes are held to, plus elementwise J agreement to
    float32 ULP scale.  Oracle-parity suites (tests/test_constraint.py,
    tests/test_env.py) remain the ground truth and run with the new
    defaults.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.physics import forward as F
from quadruped_tpu.physics.constraint import assemble
from quadruped_tpu.physics.kinematics import fk


def _traced(fn_builder, gather, jrow, probe_args):
    """jit TRACED while the mode env vars are set (they are consumed at
    trace time inside assemble)."""
    os.environ["QTPU_GATHER"] = gather
    os.environ["QTPU_JROW"] = jrow
    try:
        f = jax.jit(fn_builder())
        f(*probe_args)  # trace now
        return f
    finally:
        os.environ.pop("QTPU_GATHER", None)
        os.environ.pop("QTPU_JROW", None)


def _fallen_probe(env, seed):
    st = env.reset(jax.random.PRNGKey(seed))
    q0 = st.qpos.at[2].set(0.12).at[3:7].set(
        jnp.asarray([0.71, 0.7, 0.0, 0.05], st.qpos.dtype)
    )
    return st, q0


@pytest.mark.parametrize("pools", [(8, 28, 12), None])
def test_onehot_gather_bitwise(pools):
    """gather lever alone: every Efc field bit-identical on a
    contact-rich state, pooled and uniform layouts."""
    env = Go1Env(Go1Config(ctrl_type="torque", contact_pools=pools))
    m, pl = env.m, env.pipeline
    st, q0 = _fallen_probe(env, 0)
    build = lambda: (
        lambda q, v: assemble(m, pl.layout, pl.table, fk(m, q, v), q, v)
    )
    a = _traced(build, "take", "einsum", (q0, st.qvel))(q0, st.qvel)
    b = _traced(build, "onehot", "einsum", (q0, st.qvel))(q0, st.qvel)
    for f_ in dataclasses.fields(type(a)):
        va, vb = getattr(a, f_.name), getattr(b, f_.name)
        if va is None or isinstance(va, tuple):
            continue
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=f_.name
        )


def test_unrolled_jrows_drift_envelope():
    """jrow lever: J within ULP scale on contact states; 300-substep
    contact-rich trajectory drift within the pool-neutrality envelope."""
    env = Go1Env(Go1Config(ctrl_type="torque", contact_pools=(8, 28, 12)))
    m, pl = env.m, env.pipeline
    st, q0 = _fallen_probe(env, 0)
    build_efc = lambda: (
        lambda q, v: assemble(m, pl.layout, pl.table, fk(m, q, v), q, v)
    )
    a = _traced(build_efc, "take", "einsum", (q0, st.qvel))(q0, st.qvel)
    c = _traced(build_efc, "take", "unroll", (q0, st.qvel))(q0, st.qvel)
    scale = np.maximum(np.abs(np.asarray(a.J)), 1.0)
    np.testing.assert_allclose(
        np.asarray(c.J), np.asarray(a.J), rtol=0.0,
        atol=float((2e-7 * scale).max()),
    )
    # elementwise: relative error per element at f32 ULP scale
    rel = np.abs(np.asarray(c.J) - np.asarray(a.J)) / scale
    assert float(rel.max()) < 5e-7

    ctrl = jnp.zeros(12, st.qpos.dtype)
    w0 = jnp.zeros_like(st.qvel)
    probe = (q0, st.qvel, ctrl, w0, st.params)
    build_step = lambda: (
        lambda q, v, cc, w, p: F.step_n(pl, p, q, v, cc, 10, warmstart=w)
    )
    ref = _traced(build_step, "take", "einsum", probe)
    new = _traced(build_step, "onehot", "unroll", probe)
    qa = qb = q0
    va = vb = st.qvel
    wa = wb = w0
    saw_contact = False
    for _ in range(30):
        qa, va, da = ref(qa, va, ctrl, wa, st.params)
        qb, vb, db = new(qb, vb, ctrl, wb, st.params)
        wa, wb = da.qacc, db.qacc
        saw_contact = saw_contact or bool(da.con_active.sum() > 4)
    assert saw_contact, "probe never reached the contact-rich regime"
    # pool-neutrality envelope (PLAN lever 1: 1.13e-4 vs 1.03e-4 qpos
    # drift between layouts was accepted); ULP-seeded divergence over
    # 300 contact-rich substeps stays well inside it
    drift = float(np.max(np.abs(np.asarray(qa) - np.asarray(qb))))
    assert drift < 5e-4, f"trajectory drift {drift} out of envelope"


def test_soa_capsule_family_matches_legacy():
    """Component-unrolled capsule-capsule (QTPU_NARROW=soa, default)
    vs the 3-vector form: same math, ULP bar (bitwise on XLA:CPU)."""
    env = Go1Env(Go1Config(ctrl_type="torque", contact_pools=(8, 28, 12)))
    m, pl = env.m, env.pipeline
    st, q0 = _fallen_probe(env, 0)
    build = lambda: (
        lambda q, v: assemble(m, pl.layout, pl.table, fk(m, q, v), q, v)
    )

    def run(narrow):
        os.environ["QTPU_NARROW"] = narrow
        try:
            f = jax.jit(build())
            return f(q0, st.qvel)
        finally:
            os.environ.pop("QTPU_NARROW", None)

    a, b = run("legacy"), run("soa")
    for name in ("con_dist", "con_pos", "con_frame", "J", "aref", "R"):
        va = np.asarray(getattr(a, name), np.float64)
        vb = np.asarray(getattr(b, name), np.float64)
        scale = np.maximum(np.abs(va), 1.0)
        assert float((np.abs(va - vb) / scale).max()) < 5e-7, name


@pytest.mark.smoke
def test_default_modes_are_the_fast_path():
    os.environ.pop("QTPU_GATHER", None)
    os.environ.pop("QTPU_JROW", None)
    os.environ.pop("QTPU_NARROW", None)
    assert os.environ.get("QTPU_GATHER", "onehot") == "onehot"
    assert os.environ.get("QTPU_JROW", "unroll") == "unroll"
    assert os.environ.get("QTPU_NARROW", "soa") == "soa"
