"""Gait-quality regression gate (VERDICT r1 next-step #5).

Loads the committed flagship walking-policy artifact and asserts it still
walks under the current physics/env code: healthy-fraction floor and
tracking-error ceiling that a collapsed reward-farming policy fails
(round-1's farming policy measures healthy ~1%, tracking error ~0.4 m/s;
the gate requires healthy >= 80% and error <= 0.15 m/s over a 20-s eval).

Skips until the artifact exists (results/walk_policy/ is committed by the
flagship run, tools/launch_gait_run.sh / tools/TPU_WORKQUEUE.md §2).
"""

import pathlib

import jax
import numpy as np
import pytest

ARTIFACT = pathlib.Path(__file__).parent.parent / "results" / "walk_policy"


@pytest.mark.skipif(
    not ARTIFACT.exists(),
    reason="walking artifact not committed yet (flagship run pending)",
)
def test_committed_policy_still_walks():
    import json

    from quadruped_tpu.checkpoint import load_policy
    from quadruped_tpu.env.config import Go1Config, RewardWeights
    from quadruped_tpu.env.go1 import Go1Env
    from quadruped_tpu.learn.ppo import PPO, PPOConfig
    from quadruped_tpu.learn.runner import Runner, RunnerConfig

    # the artifact's metadata records the ctrl_type it was trained with
    # (a position-control policy rolled in a torque env is garbage);
    # reward semantics in the eval env are ALWAYS the reference's
    meta = json.loads((ARTIFACT / "metadata.json").read_text())
    env = Go1Env(Go1Config(
        ctrl_type=meta.get("ctrl_type", "position"),
        action_mode=meta.get("action_mode", "raw"),
        action_scale=meta.get("action_scale", 0.3),
        rewards=RewardWeights(recovery=0.0, get_up=0.0),
        fallen_start_prob=0.0,
    ))
    runner = Runner(
        env,
        PPOConfig(num_envs=4, n_steps=4),
        RunnerConfig(n_eval_episodes=2, eval_max_time=20.0,
                     save_videos=False, verbose=False),
    )
    import dataclasses

    ts = runner.trainer.init(jax.random.PRNGKey(0))
    params, _meta = load_policy(str(ARTIFACT), ts.params)
    ts = dataclasses.replace(ts, params=params)

    ep_rew, ep_len, _succ, out = runner.evaluate(ts, jax.random.PRNGKey(1))
    g = out["gait_metrics"]
    # a collapsed farming policy measures healthy ~0.01 / err ~0.4 — the
    # gate is red for it and green for a trotting policy
    assert g["healthy_frac"] >= 0.80, g
    assert g["tracking_error"] <= 0.15, g
    # no early termination inside the 20-s window
    assert float(np.mean(np.asarray(ep_len))) >= 0.95 * 20.0 / env.cfg.dt
