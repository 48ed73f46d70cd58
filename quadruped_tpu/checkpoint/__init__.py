"""Checkpointing: model/optimizer state, metadata and training history.

Replaces the reference's three persistence mechanisms (SURVEY.md §5):
  1. SB3 model zips (final_model/best_model, train.py:138,
     training_callback.py:483-491)  -> orbax checkpoints of the policy
     params (+ optionally full TrainState)
  2. resume with continued timestep counters (train.py:112-119)
  3. training_history.json beside the best model
     (training_callback.py:493-511) and periodic metadata_N.json
     (checkpoints/standing_training artifacts)
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _as_path(p) -> Path:
    return Path(p).absolute()


def save_policy(path, params: Any, metadata: dict | None = None):
    """Save policy variables (the equivalent of an SB3 model zip)."""
    path = _as_path(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path / "params", params, force=True)
    ckpt.wait_until_finished()
    if metadata is not None:
        (path / "metadata.json").write_text(json.dumps(metadata, indent=1))


def load_policy(path, like: Any):
    path = _as_path(path)
    ckpt = ocp.StandardCheckpointer()
    params = ckpt.restore(path / "params", like)
    meta = {}
    mp = path / "metadata.json"
    if mp.exists():
        meta = json.loads(mp.read_text())
    return params, meta


def load_policy_any(path, ts):
    """Load policy params from either artifact layout.

    best_model dirs carry `params/` (save_policy); periodic checkpoint_N
    dirs carry the full `train_state/` payload (save_train_state) and no
    separate params copy.  Tools that accept both (gait gate,
    snapshot_walk_policy --source checkpoint_N, mean-lag probe) pass an
    initialized TrainState `ts` so the optimizer-state restore template
    is available for the second layout; returns (params, metadata)."""
    path = _as_path(path)
    if (path / "params").exists():
        return load_policy(path, ts.params)
    ts2, meta = load_train_state(path, ts)
    return ts2.params, meta


def save_train_state(path, ts, metadata: dict | None = None):
    """Full-resume checkpoint: params + optimizer + counters (+ metadata).

    The global step counter is NOT part of the device pytree (see
    learn.ppo.TrainState) — callers put it in `metadata` (JSON ints are
    arbitrary precision, so no i32 overflow at any training scale)."""
    path = _as_path(path)
    ckpt = ocp.StandardCheckpointer()
    payload = {
        "params": ts.params,
        "opt_state": ts.opt_state,
        "rand_power": ts.rand_power,
        "rng": ts.rng,
    }
    ckpt.save(path / "train_state", payload, force=True)
    ckpt.wait_until_finished()
    if metadata is not None:
        (path / "metadata.json").write_text(json.dumps(metadata, indent=1))


def load_train_state(path, ts):
    """Restore params/optimizer/counters into an initialized TrainState."""
    path = _as_path(path)
    ckpt = ocp.StandardCheckpointer()
    like = {
        "params": ts.params,
        "opt_state": ts.opt_state,
        "rand_power": ts.rand_power,
        "rng": ts.rng,
    }
    payload = ckpt.restore(path / "train_state", like)
    ts = dataclasses.replace(
        ts,
        params=payload["params"],
        opt_state=payload["opt_state"],
        rand_power=payload["rand_power"],
        rng=payload["rng"],
    )
    meta = {}
    mp = path / "metadata.json"
    if mp.exists():
        meta = json.loads(mp.read_text())
    return ts, meta


class TrainingHistory:
    """training_history.json equivalent (training_callback.py:493-511):
    best reward plus reward/length/success/timestep series, reloadable on
    resume (train.py:75-84)."""

    FIELDS = ("timesteps", "rewards", "lengths", "successes")
    # gait-quality series (VERDICT r1 weak #3): may be shorter than the
    # core series when resuming from a pre-metric history file
    GAIT_FIELDS = ("healthy_frac", "tracking_error", "distance",
                   "feet_airtime", "mean_desired_speed",
                   # threshold-free touchdown counter (ADVICE r4 low);
                   # absent in histories written before round 5
                   "touchdowns_per_sec",
                   # per-gait contact-template match (BASELINE config 5)
                   "gait_match_rate", "gait_match_rate/trot",
                   "gait_match_rate/pace", "gait_match_rate/bound")

    def __init__(self):
        self.best_reward = -float("inf")
        # best-model selection score: defaults to the eval reward
        # (reference semantics, training_callback.py:470-491), but the
        # Runner may pass a gait score instead — under reference reward
        # semantics the max(0, r-c) floor makes every eval reward of an
        # early policy exactly 0.0, so reward-ranked "best" degenerates
        # to "first" (round-3 finding: a 26M-step run whose best_model
        # was frozen at the 262k-step eval)
        self.best_score = -float("inf")
        # which metric produced best_score ("reward" | "gait"); on resume
        # under a different metric the score restarts from -inf — scores
        # from different metrics are not comparable
        self.score_metric = "reward"
        self.series = {k: [] for k in self.FIELDS}
        self.gait = {k: [] for k in self.GAIT_FIELDS}

    def set_score_metric(self, metric: str):
        if metric != self.score_metric:
            self.score_metric = metric
            self.best_score = -float("inf")

    def append(self, timestep, reward, length, success, gait_metrics=None,
               score=None):
        self.series["timesteps"].append(int(timestep))
        self.series["rewards"].append(float(reward))
        self.series["lengths"].append(float(length))
        self.series["successes"].append(bool(success))
        if gait_metrics:
            for k in self.GAIT_FIELDS:
                if k in gait_metrics:
                    self.gait[k].append(float(gait_metrics[k]))
        if reward > self.best_reward:
            self.best_reward = float(reward)
        s = float(reward if score is None else score)
        if s > self.best_score:
            self.best_score = s
            return True
        return False

    def save(self, path):
        payload = {"best_reward": self.best_reward,
                   "best_score": self.best_score,
                   "score_metric": self.score_metric, **self.series,
                   "gait": self.gait}
        _as_path(path).write_text(json.dumps(payload, indent=1))

    @staticmethod
    def load(path) -> "TrainingHistory":
        h = TrainingHistory()
        payload = json.loads(_as_path(path).read_text())
        h.best_reward = payload.get("best_reward", -float("inf"))
        h.best_score = payload.get(
            "best_score", payload.get("best_reward", -float("inf"))
        )
        h.score_metric = payload.get("score_metric", "reward")
        for k in TrainingHistory.FIELDS:
            h.series[k] = list(payload.get(k, []))
        for k in TrainingHistory.GAIT_FIELDS:
            h.gait[k] = list(payload.get("gait", {}).get(k, []))
        return h
