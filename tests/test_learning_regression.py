"""Fast seeded learning-progress regression (VERDICT r1 item 6).

Not a convergence test — a guard that the fused sim+PPO stack still
produces a rising reward signal at all: N tiny iterations on CPU from a
fixed seed must show a positive mean-reward trend (first-third vs
last-third average).  The real training evidence lives in
models/gait5M-torque (committed history/plots from a 5M-step on-chip
run)."""

import jax
import numpy as np
import pytest

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.learn.ppo import PPO, PPOConfig


@pytest.mark.slow
def test_reward_improves_over_iterations():
    env = Go1Env(
        Go1Config(ctrl_type="torque", collision_mode="plane",
                  fallen_start_prob=0.0)
    )
    cfg = PPOConfig(
        num_envs=128, n_steps=8, num_minibatches=4, n_epochs=4,
        learning_rate=1e-3,
    )
    trainer = PPO(env, cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    rewards = []
    for _ in range(18):
        ts, metrics = trainer.train_iteration(ts)
        rewards.append(float(metrics["mean_reward"]))
    r = np.asarray(rewards)
    assert np.isfinite(r).all()
    early = r[:6].mean()
    late = r[-6:].mean()
    assert late > early, (early, late, rewards)
