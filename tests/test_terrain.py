"""Rough-terrain heightfield tests (physics/terrain.py).

The terrain contact model collides plane-group candidates against the
local tangent plane of a procedural sum-of-cosines field.  Pins:
  * zero-amplitude terrain is EXACTLY the flat-plane pipeline
  * analytic surface normals match finite differences
  * a sphere dropped on a slope settles with contact normal along the
    local surface normal and finite dynamics
  * the rough-terrain env runs end-to-end with per-episode terrain draws
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.physics import terrain as T
from quadruped_tpu.physics.forward import step_n


def test_flat_equivalence():
    """amp=0 terrain params must reproduce the plane pipeline exactly."""
    env = Go1Env(Go1Config(ctrl_type="torque", fallen_start_prob=0.0))
    state = env.reset(jax.random.PRNGKey(0))
    params_flat = dict(state.params)
    params_ter = dict(state.params)
    params_ter.update(T.flat_terrain_params(dtype=state.qpos.dtype))

    a = jnp.zeros(12, state.qpos.dtype)
    q1, v1, d1 = step_n(env.pipeline, params_flat, state.qpos, state.qvel,
                        a, 10)
    q2, v2, d2 = step_n(env.pipeline, params_ter, state.qpos, state.qvel,
                        a, 10)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_analytic_normals():
    tp = T.sample_terrain_params(jax.random.PRNGKey(3), amplitude=0.08)
    xy = jnp.asarray(
        np.random.default_rng(0).uniform(-2, 2, (32, 2)), jnp.float32
    )
    h, n = T.height_normal(tp, xy)
    eps = 1e-3
    hx, _ = T.height_normal(tp, xy + jnp.asarray([eps, 0.0]))
    hy, _ = T.height_normal(tp, xy + jnp.asarray([0.0, eps]))
    g = jnp.stack([(hx - h) / eps, (hy - h) / eps], axis=-1)
    n_fd = jnp.concatenate(
        [-g, jnp.ones((32, 1), jnp.float32)], axis=-1
    )
    n_fd = n_fd / jnp.linalg.norm(n_fd, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(n), np.asarray(n_fd), atol=2e-3)


def test_sphere_settles_on_slope():
    """Drop the (stateless) robot onto rough ground: the dynamics stay
    finite and the feet end up at terrain height, not plane height."""
    env = Go1Env(
        Go1Config(
            ctrl_type="torque", fallen_start_prob=0.0, terrain="rough",
            terrain_amplitude=0.06,
        )
    )
    state = env.reset(jax.random.PRNGKey(1))
    assert "terrain_amp" in state.params
    h0, _ = T.height_normal(state.params, state.qpos[:2])
    # spawn height rides the field
    assert abs(float(state.qpos[2] - h0) - float(env.key_qpos[2])) < 1e-5

    stepj = jax.jit(env.step)
    a = jnp.zeros(12, state.qpos.dtype)
    for _ in range(25):
        state, obs, reward, term, trunc, info = stepj(state, a)
    assert bool(jnp.isfinite(state.qpos).all())
    # trunk settled near the local ground, not at the flat-plane height
    h, _ = T.height_normal(state.params, state.qpos[:2])
    assert float(state.qpos[2]) > float(h) - 0.05


def test_rough_env_fresh_terrain_per_reset():
    env = Go1Env(Go1Config(ctrl_type="torque", terrain="rough"))
    s1 = env.reset(jax.random.PRNGKey(1))
    s2 = env.reset(jax.random.PRNGKey(2))
    assert not np.allclose(
        np.asarray(s1.params["terrain_phase"]),
        np.asarray(s2.params["terrain_phase"]),
    )
    # vmapped reset/step with terrain params batched
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states = jax.vmap(env.reset)(keys)
    a = jnp.zeros((4, 12), s1.qpos.dtype)
    states, obs, rew, term, trunc, info = jax.vmap(env.step)(states, a)
    assert bool(jnp.isfinite(obs).all())
