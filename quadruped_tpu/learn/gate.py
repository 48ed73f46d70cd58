"""The walking-artifact quality gate — single source of truth.

Shared by tests/test_gait_gate.py (regression gate on the committed
artifact) and tools/snapshot_walk_policy.py (promotion bar), so the two
can never drift apart (VERDICT r3 next #2).

The bar is designed so a STANDER CANNOT PASS (round 3's flagship was a
perfect stander: healthy 1.0, full episodes, feet_airtime 0.0, distance
0.03 m — and with only 2 eval episodes its tracking error cleared 0.15
with ~18% probability on command-draw luck alone):

  * healthy_frac >= 0.80          — a collapsed farming policy is ~0.01
  * tracking_error <= 0.15 m/s    — a stander's error = mean |v_des|
  * full episodes (>= 95% of the eval window survives)
  * distance >= 0.5 * mean|v_des| * T   — a stander covers ~0 m
  * feet_airtime > 0              — the feet actually leave the ground
  * >= 8 episodes                 — kills the 2-episode command-draw luck

Reference counterpart: its de-facto regression signal is a human watching
videos (training_callback.py:740-751); its README endorses a shipped
artifact as "working well" (README.md:27).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

GATE_EPISODES = 8
GATE_EVAL_TIME = 20.0          # seconds of sim per episode
HEALTHY_MIN = 0.80
TRACKING_MAX = 0.15            # m/s
LENGTH_FRAC_MIN = 0.95
DISTANCE_FRAC_MIN = 0.5        # of commanded |v| * T


def build_gate_env(meta: dict):
    """The EXACT eval env for an artifact: reference reward semantics
    (locomotion profile — no recovery/get_up channels, no fallen starts,
    no train-time shaping), the artifact's recorded policy<->env
    interface fields."""
    from ..env.config import Go1Config, RewardWeights
    from ..env.go1 import Go1Env

    return Go1Env(Go1Config(
        robot=meta.get("robot", "go1"),
        ctrl_type=meta.get("ctrl_type", "position"),
        action_mode=meta.get("action_mode", "raw"),
        action_scale=meta.get("action_scale", 0.3),
        gait_conditioning=meta.get("gait_conditioning", False),
        biped=meta.get("biped", False),
        rewards=RewardWeights(recovery=0.0, get_up=0.0),
        fallen_start_prob=0.0,
    ))


def evaluate_gate(
    artifact: str | Path,
    episodes: int = GATE_EPISODES,
    eval_time: float = GATE_EVAL_TIME,
    seed: int = 1,
) -> dict:
    """Evaluate a policy artifact against the gate.  Returns the verdict
    dict (incl. per-criterion booleans, `gate` overall, and the eval
    trajectory under '_out' for rendering)."""
    import jax

    from .. import checkpoint as ckpt
    from .ppo import PPOConfig
    from .runner import Runner, RunnerConfig

    artifact = Path(artifact)
    meta = json.loads((artifact / "metadata.json").read_text())
    env = build_gate_env(meta)
    runner = Runner(
        env,
        PPOConfig(num_envs=max(2, episodes), n_steps=4),
        RunnerConfig(n_eval_episodes=episodes, eval_max_time=eval_time,
                     save_videos=False, verbose=False),
    )
    ts = runner.trainer.init(jax.random.PRNGKey(0))
    params, _ = ckpt.load_policy_any(str(artifact), ts)
    ts = dataclasses.replace(ts, params=params)

    ep_rew, ep_len, _succ, out = runner.evaluate(ts, jax.random.PRNGKey(seed))
    g = out["gait_metrics"]
    mean_len = float(np.mean(np.asarray(ep_len)))
    full_len = LENGTH_FRAC_MIN * eval_time / env.cfg.dt
    dist_floor = (
        DISTANCE_FRAC_MIN * g["mean_desired_speed"] * eval_time
    )
    checks = {
        "healthy_ok": bool(g["healthy_frac"] >= HEALTHY_MIN),
        "tracking_ok": bool(g["tracking_error"] <= TRACKING_MAX),
        "length_ok": bool(mean_len >= full_len),
        "distance_ok": bool(g["distance"] >= dist_floor),
        # stepping: either the reference airtime reward fires (swings
        # > 0.2 s) or the threshold-free touchdown counter does — a gait
        # with sub-0.2 s swings is still a gait (ADVICE r4 low); a
        # stander scores 0.0 on BOTH.
        "stepping_ok": bool(
            g["feet_airtime"] > 0.0
            or g.get("touchdowns_per_sec", 0.0) > 0.0
        ),
    }
    return {
        "episodes": episodes,
        "healthy_frac": float(g["healthy_frac"]),
        "tracking_error": float(g["tracking_error"]),
        "distance": float(g["distance"]),
        "distance_floor": float(dist_floor),
        "mean_desired_speed": float(g["mean_desired_speed"]),
        "feet_airtime": float(g["feet_airtime"]),
        "touchdowns_per_sec": float(g.get("touchdowns_per_sec", 0.0)),
        "mean_length": mean_len,
        "mean_reward_reference_semantics": float(
            np.mean(np.asarray(ep_rew))
        ),
        **checks,
        "gate": all(checks.values()),
        "_out": out,
        "_ep_len": np.asarray(ep_len),
        "_env": env,
    }
