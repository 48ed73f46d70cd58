"""Deferred cylinder refinement equivalence (round-4 perf lever).

The pooled assemble path defers the 10-iteration cylinder projection
refinement (collision._cylinder_hybrid) until AFTER top-K slot selection
(collision.refine_cylinder_slots), running it on the 12 selected condim-1
slots instead of all 247 capsule_cylinder/cylinder_cylinder candidates.

Soundness argument (collision.narrowphase docstring): capsule(r,h)
encloses cylinder(r,h), so the cheap capsule-capsule approximation
UNDERESTIMATES distance — selection by it never misses a true contact —
and the refinement math applied post-selection is identical to the
refine-everything path.  This test pins the end-to-end consequence:
IDENTICAL trajectories from contact-rich fallen states, both layouts'
dynamics bitwise equal over 30 control-substep blocks.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.physics import forward as F


def _build(defer: bool) -> Go1Env:
    os.environ["QTPU_DEFER_CYL"] = "1" if defer else "0"
    try:
        return Go1Env(Go1Config(ctrl_type="torque", contact_pools=(8, 28, 12)))
    finally:
        del os.environ["QTPU_DEFER_CYL"]


def test_defer_matches_refine_all_on_fallen_trajectories():
    envA, envB = _build(False), _build(True)
    assert not envA.pipeline.layout.defer_cyl
    assert envB.pipeline.layout.defer_cyl

    stepA = jax.jit(
        lambda q, v, c, w, p: F.step_n(envA.pipeline, p, q, v, c, 10,
                                       warmstart=w)
    )
    stepB = jax.jit(
        lambda q, v, c, w, p: F.step_n(envB.pipeline, p, q, v, c, 10,
                                       warmstart=w)
    )
    for seed in range(2):
        st = envA.reset(jax.random.PRNGKey(seed))
        # heavily tilted low start: the contact-rich regime where the
        # cylinder self-pairs actually activate
        q0 = st.qpos.at[2].set(0.12).at[3:7].set(
            jnp.asarray([0.71, 0.7, 0.0, 0.05], st.qpos.dtype)
        )
        qa = qb = q0
        va = vb = st.qvel
        wa = wb = jnp.zeros_like(st.qvel)
        ctrl = jnp.zeros(12, st.qpos.dtype)
        saw_contact = False
        for _ in range(30):
            qa, va, da = stepA(qa, va, ctrl, wa, st.params)
            qb, vb, db = stepB(qb, vb, ctrl, wb, st.params)
            wa, wb = da.qacc, db.qacc
            saw_contact = saw_contact or bool(da.con_active.sum() > 4)
            np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        assert saw_contact, "probe never reached the contact-rich regime"


@pytest.mark.smoke
def test_defer_default_on_for_pooled_only():
    os.environ.pop("QTPU_DEFER_CYL", None)
    pooled = Go1Env(Go1Config(ctrl_type="torque", contact_pools=(8, 28, 12)))
    assert pooled.pipeline.layout.defer_cyl
    plain = Go1Env(Go1Config(ctrl_type="torque"))
    assert not plain.pipeline.layout.defer_cyl
