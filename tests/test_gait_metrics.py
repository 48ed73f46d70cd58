"""Gait-quality eval metrics (VERDICT r1 weak #3).

The round-1 training evidence was a collapsed reward-farming policy that
summed-reward eval could not distinguish from walking.  These tests pin
the aggregation semantics of Runner._gait_metrics (masking of post-done
steps, healthy-only tracking error) and the TrainingHistory round-trip of
the new gait series, without touching a device-heavy env.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from quadruped_tpu.checkpoint import TrainingHistory
from quadruped_tpu.learn.runner import Runner


def _fake_out(valid, healthy, err, dist, channels=None, desired=0.3):
    B, T = valid.shape
    return {
        "valid": valid,
        "healthy": healthy,
        "tracking_error": err,
        "distance_from_origin": dist,
        # constant per-episode commanded speed (round 4: the hardened
        # gate's displacement yardstick)
        "desired_speed": np.full((B, T), desired),
        "reward_components": channels or {},
    }


def test_gait_metrics_masks_post_done_steps():
    # episode 0 ends after 2 of 4 steps; frozen steps past done must not
    # count toward healthy_frac or tracking error
    valid = np.array([[1, 1, 0, 0], [1, 1, 1, 1]], bool)
    healthy = np.array([[1, 0, 1, 1], [1, 1, 1, 1]], bool)
    err = np.array([[0.1, 9.0, 9.0, 9.0], [0.2, 0.2, 0.2, 0.2]])
    dist = np.array([[0.0, 0.5, 0.5, 0.5], [0.0, 1.0, 2.0, 3.0]])
    m = Runner._gait_metrics(_fake_out(valid, healthy, err, dist))
    # 6 valid steps, 5 of them healthy
    assert abs(m["healthy_frac"] - 5 / 6) < 1e-9
    # tracking error only over valid & healthy steps: (0.1 + 4*0.2)/5
    assert abs(m["tracking_error"] - (0.1 + 0.8) / 5) < 1e-9
    # final distance per episode averaged: (0.5 + 3.0)/2
    assert abs(m["distance"] - 1.75) < 1e-9


def test_zero_healthy_steps_reports_nan_tracking():
    """A fully collapsed policy must not read as perfect tracking."""
    valid = np.ones((2, 4), bool)
    healthy = np.zeros((2, 4), bool)
    err = np.full((2, 4), 0.4)
    dist = np.zeros((2, 4))
    m = Runner._gait_metrics(_fake_out(valid, healthy, err, dist))
    assert m["healthy_frac"] == 0.0
    assert np.isnan(m["tracking_error"])


def test_gait_metrics_reward_channels_masked():
    valid = np.array([[1, 0]], bool)
    healthy = np.ones((1, 2), bool)
    err = np.zeros((1, 2))
    dist = np.zeros((1, 2))
    ch = {"get_up_reward": np.array([[20.0, 20.0]])}
    m = Runner._gait_metrics(_fake_out(valid, healthy, err, dist, ch))
    # the frozen post-done step's farmed get_up must not count
    assert abs(m["channel/get_up_reward"] - 20.0) < 1e-9


def test_gait_metrics_collapsed_policy_signature():
    # a collapsed farming policy: unhealthy nearly all episode, large error
    T = 100
    valid = np.ones((2, T), bool)
    healthy = np.zeros((2, T), bool)
    healthy[:, :5] = True  # briefly healthy after reset
    err = np.full((2, T), 0.4)
    dist = np.zeros((2, T))
    m = Runner._gait_metrics(_fake_out(valid, healthy, err, dist))
    assert m["healthy_frac"] < 0.1  # the gate a walking policy passes


def test_touchdowns_per_sec_threshold_free():
    """ADVICE r4 low: a gait with sub-0.2 s swings pays no reference
    airtime reward (feet_airtime reads 0.0) but must still register as
    stepping.  The touchdown counter detects the airtime accumulator
    resetting after >= 2 control steps airborne; single-step jitter and
    standers read 0.0."""
    dt = 0.02
    B, T = 1, 8
    valid = np.ones((B, T), bool)
    healthy = np.ones((B, T), bool)
    err = np.zeros((B, T))
    dist = np.zeros((B, T))

    # foot 0: a real 3-step swing (0.06 s < 0.2 s threshold) touching
    # down at t=4; foot 1: single-step jitter (not counted); feet 2-3
    # planted throughout (stander signature)
    fa = np.zeros((B, T, 4))
    fa[0, 1:4, 0] = [dt, 2 * dt, 3 * dt]   # airborne t=1..3, down at t=4
    fa[0, 2, 1] = dt                        # 1-step blip, down at t=3
    out = _fake_out(valid, healthy, err, dist)
    out["feet_air"] = fa
    m = Runner._gait_metrics(out, dt=dt)
    # one touchdown event over T*dt = 0.16 s of sim
    assert abs(m["touchdowns_per_sec"] - 1 / (T * dt)) < 1e-9

    # a stander: no feet ever airborne -> exactly 0.0
    out2 = _fake_out(valid, healthy, err, dist)
    out2["feet_air"] = np.zeros((B, T, 4))
    assert Runner._gait_metrics(out2, dt=dt)["touchdowns_per_sec"] == 0.0

    # histories without the field (pre-round-5 evals) simply omit it
    m3 = Runner._gait_metrics(_fake_out(valid, healthy, err, dist), dt=dt)
    assert "touchdowns_per_sec" not in m3


def test_gait_match_rate_per_gait():
    """BASELINE config 5 metric: fraction of foot-steps matching the
    commanded gait's stance/swing template at the shared clock phase.
    A perfect trot scores 1.0; all-four-stance scores 0.5 (template
    expects two feet in stance at any phase)."""
    dt = 0.02
    B, T = 1, 6
    valid = np.ones((B, T), bool)
    healthy = np.ones((B, T), bool)
    base = _fake_out(valid, healthy, np.zeros((B, T)), np.zeros((B, T)))

    # perfect trot: phase < 0.5 -> FR+RL stance (airtime 0), FL+RR swing
    fa = np.zeros((B, T, 4))
    phase = np.array([[0.1, 0.2, 0.3, 0.6, 0.7, 0.8]])
    for t in range(T):
        if phase[0, t] < 0.5:
            fa[0, t, 1] = fa[0, t, 2] = dt   # FL, RR airborne
        else:
            fa[0, t, 0] = fa[0, t, 3] = dt   # FR, RL airborne
    out = dict(base, feet_air=fa, gait=np.zeros((B, T), int),
               gait_phase=phase)
    from quadruped_tpu.learn.runner import Runner as R

    m = R._gait_metrics(out, dt=dt)
    assert m["gait_match_rate"] == 1.0
    assert m["gait_match_rate/trot"] == 1.0
    assert "gait_match_rate/pace" not in m   # never commanded

    # a stander (all stance, airtime 0 everywhere): half the template
    # matches at any phase
    out2 = dict(base, feet_air=np.zeros((B, T, 4)),
                gait=np.zeros((B, T), int), gait_phase=phase)
    assert R._gait_metrics(out2, dt=dt)["gait_match_rate"] == 0.5

    # same stepping pattern commanded as PACE (template FR+RR first
    # half): diagonal stepping matches pace on 2 of 4 feet
    out3 = dict(out, gait=np.ones((B, T), int))
    m3 = R._gait_metrics(out3, dt=dt)
    assert m3["gait_match_rate/pace"] == 0.5


def test_training_history_gait_roundtrip(tmp_path):
    h = TrainingHistory()
    h.append(1000, 5.0, 100.0, False,
             gait_metrics={"healthy_frac": 0.97, "tracking_error": 0.08,
                           "distance": 12.0})
    h.append(2000, 6.0, 120.0, True,
             gait_metrics={"healthy_frac": 0.99, "tracking_error": 0.05,
                           "distance": 15.0})
    p = tmp_path / "training_history.json"
    h.save(p)
    h2 = TrainingHistory.load(p)
    assert h2.gait["healthy_frac"] == [0.97, 0.99]
    assert h2.gait["tracking_error"] == [0.08, 0.05]
    assert h2.series["rewards"] == [5.0, 6.0]


def test_training_history_loads_pre_gait_files(tmp_path):
    # resume from a round-1 history file with no gait series
    h = TrainingHistory()
    h.append(1000, 5.0, 100.0, False)
    p = tmp_path / "training_history.json"
    payload = {"best_reward": 5.0, **h.series}
    import json

    p.write_text(json.dumps(payload))
    h2 = TrainingHistory.load(p)
    assert h2.series["rewards"] == [5.0]
    assert h2.gait["healthy_frac"] == []
