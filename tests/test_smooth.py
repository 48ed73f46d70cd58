"""FK + smooth dynamics parity vs the mujoco oracle (contacts disabled)."""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quadruped_tpu.assets import go1_model, go1_xml
from quadruped_tpu.physics import kinematics, smooth


@pytest.fixture(scope="module", params=["torque", "position"])
def setup(request):
    ctrl = request.param
    m = go1_model(ctrl)
    mj = mujoco.MjModel.from_xml_string(go1_xml(ctrl))
    return m, mj


def random_states(mj, n, seed=0):
    rng = np.random.default_rng(seed)
    states = []
    for _ in range(n):
        qpos = mj.key_qpos[0].copy()
        qpos[:3] += rng.uniform(-0.5, 0.5, 3)
        quat = rng.normal(size=4)
        qpos[3:7] = quat / np.linalg.norm(quat)
        qpos[7:] += rng.uniform(-0.5, 0.5, 12)
        qvel = rng.uniform(-2.0, 2.0, mj.nv)
        ctrl = rng.uniform(-1.0, 1.0, mj.nu)
        states.append((qpos, qvel, ctrl))
    return states


def test_fk_matches_oracle(setup):
    m, mj = setup
    d = mujoco.MjData(mj)
    for qpos, qvel, _ in random_states(mj, 5):
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(mj, d)
        kin = jax.jit(kinematics.fk, static_argnums=0)(
            m, jnp.asarray(qpos), jnp.asarray(qvel)
        )
        np.testing.assert_allclose(kin.xpos, d.xpos, atol=1e-10)
        sign = np.sign(np.sum(np.asarray(kin.xquat) * d.xquat, axis=1))
        sign[sign == 0] = 1.0
        np.testing.assert_allclose(
            np.asarray(kin.xquat) * sign[:, None], d.xquat, atol=1e-10
        )
        np.testing.assert_allclose(kin.xipos, d.xipos, atol=1e-10)
        np.testing.assert_allclose(
            kin.geom_xpos, d.geom_xpos, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(kin.geom_xmat).reshape(-1, 9), d.geom_xmat, atol=1e-10
        )
        np.testing.assert_allclose(kin.site_xpos, d.site_xpos, atol=1e-10)


def test_mass_matrix_matches_oracle(setup):
    m, mj = setup
    d = mujoco.MjData(mj)
    params = m.params()
    for qpos, qvel, _ in random_states(mj, 5, seed=1):
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(mj, d)
        Mfull = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, Mfull)
        kin = kinematics.fk(m, jnp.asarray(qpos), jnp.asarray(qvel))
        M = smooth.crba(m, params, kin)
        np.testing.assert_allclose(M, Mfull, atol=1e-9)


def test_bias_force_matches_oracle(setup):
    m, mj = setup
    d = mujoco.MjData(mj)
    params = m.params()
    for qpos, qvel, _ in random_states(mj, 5, seed=2):
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(mj, d)
        kin = kinematics.fk(m, jnp.asarray(qpos), jnp.asarray(qvel))
        bias = smooth.rne_bias(m, params, kin, jnp.asarray(qvel))
        np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-9)


def test_smooth_qacc_matches_oracle(setup):
    """Full forward dynamics with contacts/limits/frictionloss disabled."""
    import copy

    m, mj = setup
    mj_nc = copy.copy(mj)  # copy to mutate options
    mj_nc.opt.disableflags |= (
        mujoco.mjtDisableBit.mjDSBL_CONTACT
        | mujoco.mjtDisableBit.mjDSBL_LIMIT
        | mujoco.mjtDisableBit.mjDSBL_FRICTIONLOSS
    )
    d = mujoco.MjData(mj_nc)
    params = m.params()
    for qpos, qvel, ctrl in random_states(mj, 5, seed=3):
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        mujoco.mj_forward(mj_nc, d)
        kin = kinematics.fk(m, jnp.asarray(qpos), jnp.asarray(qvel))
        M, L, qfrc_smooth, qacc_smooth, qfrc_act = smooth.smooth_dynamics(
            m, params, kin, jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)
        )
        np.testing.assert_allclose(qfrc_act, d.qfrc_actuator, atol=1e-9)
        np.testing.assert_allclose(qacc_smooth, d.qacc, atol=1e-6)


def test_fk_vmap_batch():
    """FK must vmap over envs with static shapes."""
    m = go1_model("torque")
    B = 16
    qpos = jnp.tile(jnp.asarray(m.key_qpos[0]), (B, 1))
    qvel = jnp.zeros((B, m.nv))
    kin = jax.jit(jax.vmap(kinematics.fk, in_axes=(None, 0, 0)), static_argnums=0)(
        m, qpos, qvel
    )
    assert kin.xpos.shape == (B, m.nbody, 3)
    assert kin.cdof.shape == (B, m.nv, 6)
