"""Batched-vs-single physics parity.

Every hot stage dispatches through a custom_vmap batch rule on TPU
(solver kernel, batch-last cfrc): vmap(step)(batch) takes a different
code path from step(env_i).  Single-env paths are oracle-pinned
elsewhere (test_constraint.py); this test pins the BATCH rules against
them, so a batch-last rewrite cannot silently diverge.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.physics.forward import step


@pytest.fixture(scope="module")
def env():
    return Go1Env(Go1Config(ctrl_type="torque"))


def test_vmapped_step_matches_per_env(env):
    B = 4
    pl_ = env.pipeline
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    states = jax.vmap(env.reset)(keys)
    # diversify: drop some envs so several have real contacts, keep one
    # airborne (zero contacts) to cover the inactive-slot path
    qpos = states.qpos.at[0, 2].set(1.0)
    qpos = qpos.at[1, 2].set(0.12)       # deep contact
    qvel = states.qvel
    ctrl = 0.4 * jnp.sin(jnp.arange(B * 12, dtype=qpos.dtype)).reshape(B, 12)
    params = states.params
    warm = jnp.zeros_like(qvel)

    stepv = jax.jit(jax.vmap(
        lambda pr, qp, qv, c, w: step(pl_, pr, qp, qv, c, warmstart=w)
    ))
    qp_b, qv_b, data_b = stepv(params, qpos, qvel, ctrl, warm)

    for i in range(B):
        pr_i = jax.tree.map(lambda x: x[i], params)
        qp_i, qv_i, data_i = jax.jit(
            lambda pr, qp, qv, c, w: step(pl_, pr, qp, qv, c, warmstart=w)
        )(pr_i, qpos[i], qvel[i], ctrl[i], warm[i])
        np.testing.assert_allclose(
            np.asarray(qp_b[i]), np.asarray(qp_i), atol=1e-9,
            err_msg=f"qpos env {i}",
        )
        np.testing.assert_allclose(
            np.asarray(qv_b[i]), np.asarray(qv_i), atol=1e-7,
            err_msg=f"qvel env {i}",
        )
        np.testing.assert_allclose(
            np.asarray(data_b.cfrc_ext[i]), np.asarray(data_i.cfrc_ext),
            atol=1e-6, err_msg=f"cfrc env {i}",
        )
