"""Command-conditioned multi-gait tests (BASELINE.json config 5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env


def _env():
    return Go1Env(
        Go1Config(ctrl_type="torque", gait_conditioning=True,
                  fallen_start_prob=0.0)
    )


def test_obs_extension_and_clock():
    env = _env()
    assert env.obs_dim == 53
    state = env.reset(jax.random.PRNGKey(0))
    obs = env.obs(state)
    assert obs.shape == (53,)
    onehot = np.asarray(obs[48:51])
    assert onehot.sum() == 1.0 and set(np.unique(onehot)) <= {0.0, 1.0}
    # phase 0: sin=0, cos=1
    np.testing.assert_allclose(np.asarray(obs[51:53]), [0.0, 1.0], atol=1e-6)

    state2, obs2, *_ = jax.jit(env.step)(state, jnp.zeros(12))
    expected_phase = env.cfg.dt / env.cfg.gait_period
    np.testing.assert_allclose(
        float(state2.gait_phase), expected_phase, rtol=1e-5
    )


def test_gait_templates():
    """Each gait's stance template: matching contacts maximize the term."""
    env = _env()
    contacts_trot = jnp.asarray([True, False, False, True])   # FR+RL down
    contacts_pace = jnp.asarray([True, False, True, False])   # right side
    contacts_bound = jnp.asarray([True, True, False, False])  # front pair
    vel = jnp.asarray([0.4, 0.0, 0.0])
    healthy = jnp.asarray(True)
    phase = jnp.asarray(0.25)  # first half of the cycle

    for g, contacts in enumerate(
        (contacts_trot, contacts_pace, contacts_bound)
    ):
        scores = [
            float(
                env._gait_pattern_reward(
                    jnp.asarray(gg), phase, contacts, vel, healthy
                )
            )
            for gg in range(3)
        ]
        assert scores[g] == max(scores), (g, scores)
        np.testing.assert_allclose(scores[g], env.cfg.gait_reward_weight, rtol=1e-6)
    # second half flips the template
    r = env._gait_pattern_reward(
        jnp.asarray(0), jnp.asarray(0.75), ~contacts_trot, vel, healthy
    )
    np.testing.assert_allclose(float(r), env.cfg.gait_reward_weight, rtol=1e-6)
    # standing command gates the term off
    r0 = env._gait_pattern_reward(
        jnp.asarray(0), phase, contacts_trot, jnp.zeros(3), healthy
    )
    assert float(r0) == 0.0


def test_gait_env_end_to_end():
    env = _env()
    keys = jax.random.split(jax.random.PRNGKey(1), 6)
    states = jax.vmap(env.reset)(keys)
    gaits = np.asarray(states.gait)
    assert set(gaits.tolist()) <= {0, 1, 2}
    a = jnp.zeros((6, 12))
    states, obs, rew, term, trunc, info = jax.vmap(env.step)(states, a)
    assert obs.shape == (6, 53)
    assert "gait_pattern_reward" in info
    assert bool(jnp.isfinite(obs).all())


def test_default_env_unchanged():
    """gait off: 48-dim obs, no gait term in info (reference parity)."""
    env = Go1Env(Go1Config(ctrl_type="torque"))
    state = env.reset(jax.random.PRNGKey(0))
    assert env.obs(state).shape == (48,)
    _, _, _, _, _, info = env.step(state, jnp.zeros(12))
    assert "gait_pattern_reward" not in info
