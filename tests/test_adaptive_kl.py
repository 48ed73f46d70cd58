"""Adaptive-KL learning rate (PPOConfig.kl_target, legged_gym-style).

Round-5 motivation: at 262k-sample batches the fixed SB3 lr holds
approx_kl ~0.0025 whether lr is 3e-4 or 1e-3 — 4x under the ~0.01 this
recipe family targets — and the policy mean lags what exploration finds
(results/walk_r4_progress/MEANLAG_75M.md).  The multiplier must move
toward the target in both directions, stay put when disabled, and stay
out of the checkpoint payload (old train_states restore cleanly).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.learn.ppo import PPO, PPOConfig, Transition


@pytest.fixture(scope="module")
def env():
    return Go1Env(Go1Config(ctrl_type="torque"))


def make_trainer(env, **kw):
    return PPO(env, PPOConfig(num_envs=8, n_steps=4, num_minibatches=2,
                              n_epochs=2, **kw))


def synthetic_traj(rng, trainer):
    """A (T, B) trajectory with nonzero advantages so updates move params
    (and hence later-minibatch KLs are nonzero)."""
    cfg = trainer.cfg
    T, B, obs_dim = cfg.n_steps, cfg.num_envs, trainer.env.obs_dim
    ks = jax.random.split(rng, 3)
    obs = jax.random.normal(ks[0], (T, B, obs_dim), jnp.float32)
    action = jax.random.normal(ks[1], (T, B, 12), jnp.float32)
    return Transition(
        obs=obs,
        action=action,
        log_prob=jnp.zeros((T, B), jnp.float32),
        value=jnp.zeros((T, B), jnp.float32),
        reward=jax.random.normal(ks[2], (T, B), jnp.float32),
        terminated=jnp.zeros((T, B), jnp.float32),
        done=jnp.zeros((T, B), jnp.float32),
        bootstrap_value=jnp.zeros((T, B), jnp.float32),
        info={},
    )


def run_update(trainer, seed=0):
    ts = trainer.init(jax.random.PRNGKey(seed))
    traj = synthetic_traj(jax.random.PRNGKey(seed + 1), trainer)
    ts2, metrics = jax.jit(trainer.update)(ts, traj)
    return ts, ts2, metrics


def test_disabled_keeps_mult_at_one(env):
    trainer = make_trainer(env)  # kl_target=None
    ts, ts2, metrics = run_update(trainer)
    assert float(ts.lr_mult) == 1.0
    assert float(ts2.lr_mult) == 1.0
    assert "lr_effective" not in metrics


def test_low_target_shrinks_lr(env):
    # any nonzero KL exceeds 2*target -> every adapt step divides by 1.5
    # (except possibly the first, where KL is exactly 0)
    trainer = make_trainer(env, kl_target=1e-12)
    _, ts2, metrics = run_update(trainer)
    assert float(ts2.lr_mult) < 1.0
    assert "lr_effective" in metrics


def test_high_target_grows_lr_and_clips(env):
    trainer = make_trainer(env, kl_target=1e6)
    _, ts2, _ = run_update(trainer)
    assert float(ts2.lr_mult) > 1.0
    # bound: effective lr never exceeds lr_max
    cfg = trainer.cfg
    assert float(ts2.lr_mult) * cfg.learning_rate <= cfg.lr_max + 1e-12


def test_old_checkpoint_restores_without_lr_mult(env, tmp_path):
    """lr_mult is absent from the checkpoint payload by design: restore
    of a pre-round-5 train_state must not require it, and a fresh resume
    starts re-adapting from 1.0."""
    from quadruped_tpu import checkpoint as ckpt

    trainer = make_trainer(env, kl_target=0.01)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts = dataclasses.replace(ts, lr_mult=jnp.asarray(7.0, jnp.float32))
    ckpt.save_train_state(tmp_path / "ck", ts, {"global_step": 1})
    ts_new = trainer.init(jax.random.PRNGKey(1))
    restored, meta = ckpt.load_train_state(tmp_path / "ck", ts_new)
    assert meta["global_step"] == 1
    np.testing.assert_allclose(float(restored.lr_mult), 1.0)
