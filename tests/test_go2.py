"""Go2 robot support (BASELINE.json config 4).

The Go2 asset is authored (tools/gen_go2_assets.py), not shipped by the
reference, so the oracle is mujoco compiled from the same XML: the MJCF
field-by-field parity runs in tests/test_mjcf.py (pair fixture); here we
pin the dynamics end-to-end (passive settle matches mujoco) and that the
whole env/reward/terrain stack drives the second robot unchanged.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from quadruped_tpu.assets import robot_model, robot_xml
from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.physics.forward import step_n


def test_go2_passive_settle_matches_mujoco():
    """Drop the Go2 from 2 cm above its home pose with zero torque: both
    engines settle to the same height and posture."""
    env = Go1Env(Go1Config(robot="go2", ctrl_type="torque",
                           fallen_start_prob=0.0))
    qpos0 = np.asarray(env.key_qpos, np.float64).copy()
    qpos0[2] += 0.02

    n_ctrl, n_sub = 40, 10
    params = dict(Go1Env(Go1Config(robot="go2", ctrl_type="torque"))
                  .reset(jax.random.PRNGKey(0)).params)
    q = jnp.asarray(qpos0, jnp.float32)
    v = jnp.zeros(env.m.nv, jnp.float32)
    a = jnp.zeros(12, jnp.float32)
    stepj = jax.jit(
        lambda qq, vv: step_n(env.pipeline, params, qq, vv, a, n_sub)
    )
    for _ in range(n_ctrl):
        q, v, _ = stepj(q, v)
    q_ours = np.asarray(q, np.float64)

    mj = mujoco.MjModel.from_xml_string(robot_xml("go2", "torque"))
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos0
    d.qvel[:] = 0.0
    d.ctrl[:] = 0.0
    for _ in range(n_ctrl * n_sub):
        mujoco.mj_step(mj, d)

    assert np.isfinite(q_ours).all()
    assert abs(q_ours[2] - d.qpos[2]) < 0.01, (q_ours[2], d.qpos[2])
    assert np.max(np.abs(q_ours[7:] - d.qpos[7:])) < 0.1
    qd = abs(float(np.dot(q_ours[3:7], d.qpos[3:7])))
    assert qd > 0.999


def test_go2_env_smoke():
    """Full env stack on the Go2: reset/step/reward finite, obs dims match
    the reference contract, vmapped batch works."""
    env = Go1Env(Go1Config(robot="go2", ctrl_type="torque"))
    assert env.nu == 12
    state = env.reset(jax.random.PRNGKey(0))
    a = jnp.zeros(12, state.qpos.dtype)
    state, obs, reward, term, trunc, info = jax.jit(env.step)(state, a)
    assert obs.shape == (48,)
    assert bool(jnp.isfinite(obs).all()) and bool(jnp.isfinite(reward))

    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    states = jax.vmap(env.reset)(keys)
    states, obs, rew, term, trunc, info = jax.vmap(env.step)(
        states, jnp.zeros((4, 12), state.qpos.dtype)
    )
    assert bool(jnp.isfinite(obs).all())


def test_go2_rough_terrain_env():
    """BASELINE config 4 verbatim: Go2 + rough-terrain heightfield."""
    env = Go1Env(Go1Config(robot="go2", ctrl_type="torque", terrain="rough",
                           terrain_amplitude=0.05))
    state = env.reset(jax.random.PRNGKey(2))
    assert "terrain_amp" in state.params
    stepj = jax.jit(env.step)
    a = jnp.zeros(12, state.qpos.dtype)
    for _ in range(10):
        state, obs, reward, term, trunc, info = stepj(state, a)
    assert bool(jnp.isfinite(state.qpos).all())
