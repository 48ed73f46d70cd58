"""Batch-last dispatch equivalence (fk/smooth/assemble custom_vmap rules).

The trailing-axis vmap rules are default-on only off-CPU (they exist to
put the env batch on the TPU lane axis; on CPU they just inflate compile
times), so this module forces them on and pins their numerics against the
plain batch-first vmap on a small batch — the same-code-different-axes
property that makes the dispatches safe to enable on hardware.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.physics.forward import forward


@pytest.fixture()
def _force_blast(monkeypatch):
    for v in ("QTPU_FK_BLAST", "QTPU_SMOOTH_BLAST", "QTPU_ASM_BLAST"):
        monkeypatch.setenv(v, "1")


def _batched_qacc_cfrc(env, params, qb, vb, ab):
    f = jax.jit(
        jax.vmap(
            lambda q, v, a: (
                lambda sd: (sd.qacc, sd.cfrc_ext)
            )(forward(env.pipeline, params, q, v, a)[0])
        )
    )
    return f(qb, vb, ab)


def test_batch_last_matches_batch_first(_force_blast):
    env = Go1Env(Go1Config(ctrl_type="torque", collision_mode="plane",
                           fallen_start_prob=0.0))
    s = env.reset(jax.random.PRNGKey(0))
    params = dict(s.params)
    rng = np.random.default_rng(0)
    B = 3
    qb = jnp.asarray(
        np.stack([np.asarray(s.qpos) + rng.normal(0, 0.01, env.m.nq)
                  for _ in range(B)]), jnp.float32)
    vb = jnp.asarray(rng.normal(0, 0.1, (B, env.m.nv)), jnp.float32)
    ab = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), jnp.float32)

    qacc_on, cfrc_on = _batched_qacc_cfrc(env, params, qb, vb, ab)

    os.environ["QTPU_FK_BLAST"] = "0"
    os.environ["QTPU_SMOOTH_BLAST"] = "0"
    os.environ["QTPU_ASM_BLAST"] = "0"
    try:
        qacc_off, cfrc_off = _batched_qacc_cfrc(env, params, qb, vb, ab)
    finally:
        for v in ("QTPU_FK_BLAST", "QTPU_SMOOTH_BLAST", "QTPU_ASM_BLAST"):
            os.environ[v] = "1"

    # same code under different vmap axes: only float reassociation noise,
    # amplified by the f32 Newton solve on near-rigid modes — pin scale-
    # normalized like tests/test_ops.py does for the kernel
    qs = 1.0 + float(np.abs(np.asarray(qacc_off)).max())
    np.testing.assert_allclose(
        np.asarray(qacc_on) / qs, np.asarray(qacc_off) / qs, atol=5e-3
    )
    cs = 1.0 + float(np.abs(np.asarray(cfrc_off)).max())
    np.testing.assert_allclose(
        np.asarray(cfrc_on) / cs, np.asarray(cfrc_off) / cs, atol=5e-3
    )
