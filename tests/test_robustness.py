"""float32 robustness regression tests.

Fixtures in tests/data/stiff_contact_state*.npz are real pre-NaN states
captured from a 4096-env TPU rollout (random policy, fallen-start
curriculum): stiff multi-contact configurations where the float32 rank-1
cone-Hessian Gram accumulates enough cancellation error to push the
Newton Hessian indefinite (f64 reconstruction gives mineig +0.013; the
f32 Gram measured mineig -1.17).  Without the solver's Cholesky-shift
fallback these states NaN within 1-3 substeps and, because XLA's
argmin-over-NaN differs between CPU and TPU, poisoned whole TPU training
batches (the reference never sees this class of failure: libmujoco
auto-resets mjData on mjWARN_BADQACC, and runs in float64).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.physics import forward as fwd

DATA = pathlib.Path(__file__).parent / "data"


# NOTE: the round-3 full-tier abort that always struck around this
# module's f32 stiff-state program was root-caused in round 4 to the JAX
# persistent cache's XLA:CPU AOT (de)serialization — fixed at the source:
# quadruped_tpu/utils/cache.py now refuses to enable the persistent cache
# on CPU platforms at all.


@pytest.fixture(scope="module")
def env32():
    return Go1Env(Go1Config(ctrl_type="torque"))


def _load(fn):
    d = np.load(fn)
    params = {
        k[6:]: jnp.asarray(d[k], jnp.float32)
        for k in d.files
        if k.startswith("param_")
    }
    return (
        params,
        jnp.asarray(d["qpos"], jnp.float32),
        jnp.asarray(d["qvel"], jnp.float32),
        jnp.asarray(d["action"], jnp.float32),
        jnp.asarray(d["qacc_warm"], jnp.float32),
    )


@pytest.mark.parametrize(
    "fixture", ["stiff_contact_state.npz", "stiff_contact_state_b.npz"]
)
def test_stiff_contact_state_stays_finite_f32(env32, fixture):
    """10 float32 substeps from a captured near-singular contact state
    must stay finite (solver.py Cholesky-shift fallback + NaN-safe line
    search)."""
    params, qpos, qvel, ctrl, warm = _load(DATA / fixture)
    pl = env32.pipeline
    step = jax.jit(fwd.step, static_argnums=0)
    for _ in range(10):
        qpos, qvel, data = step(pl, params, qpos, qvel, ctrl, warmstart=warm)
        warm = data.qacc
        assert bool(jnp.isfinite(qpos).all()), "qpos went non-finite"
        assert bool(jnp.isfinite(qvel).all()), "qvel went non-finite"
    assert float(jnp.abs(qvel).max()) < 1e3


def test_nonfinite_state_terminates_immediately(env32):
    """A non-finite state must terminate THIS step with zeroed reward/obs
    (MuJoCo auto-resets on mjWARN_BADQACC, so NaN never persists in the
    reference either; a NaN surviving in a batched rollout poisons every
    batch reduction)."""
    env = env32
    state = env.reset(jax.random.PRNGKey(0))
    bad_qpos = state.qpos.at[3].set(jnp.nan)
    import dataclasses

    bad = dataclasses.replace(state, qpos=bad_qpos)
    state2, obs, reward, terminated, truncated, info = env.step(
        bad, jnp.zeros(env.nu)
    )
    assert bool(terminated)
    assert float(reward) == 0.0
    assert bool(jnp.isfinite(obs).all())


def test_autoreset_purges_nonfinite(env32):
    """step_autoreset on a NaN state must come back with a fresh finite
    episode (the TPU-batch equivalent of MuJoCo's in-step auto-reset)."""
    env = env32
    state = env.reset(jax.random.PRNGKey(1))
    import dataclasses

    bad = dataclasses.replace(state, qpos=state.qpos.at[0].set(jnp.inf))
    state2, obs, reward, terminated, truncated, info = env.step_autoreset(
        bad, jnp.zeros(env.nu)
    )
    assert bool(terminated)
    assert bool(jnp.isfinite(state2.qpos).all())
    assert bool(jnp.isfinite(obs).all())
    assert float(reward) == 0.0
