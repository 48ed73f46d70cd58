"""Anti-standing lever semantics (round 4, VERDICT r3 next #1/#2).

The round-3 flagship converged to a perfect stander; these tests pin the
two train-time levers that break the standing local optimum and the
hardened gait-metric signals that make a stander detectable:

  * command_speed_floor: every sampled x-command magnitude >= floor,
    sign mix preserved, reference sampling untouched at floor 0
  * stand_still_cost: charged exactly when healthy + commanded + all four
    feet in stance; vanishes the moment a foot swings; absent at weight 0
  * Runner eval-env restoration: a Runner built on a shaped+levered train
    env evaluates under full reference semantics (floor, dynamic accel,
    no command floor, no stand-still term)
  * gait metrics carry mean_desired_speed and feet_airtime — the
    displacement/stepping yardsticks the hardened gate asserts on
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env


@pytest.fixture(scope="module")
def levered_env():
    # fallen_start_prob 0 as in the shaped training profile (cli/train.py
    # make_env): with the default 20% fallen-start curriculum, a fallen
    # reset is unhealthy and the (deliberately) health-gated stand-still
    # cost is not charged until the robot gets up
    return Go1Env(Go1Config(
        ctrl_type="position", action_mode="centered",
        command_speed_floor=0.15, stand_still_cost=1.5,
        reward_floor=False, accel_cost_mode="plain",
        fallen_start_prob=0.0,
    ))


@pytest.mark.smoke
def test_command_speed_floor_mapping(levered_env):
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    vx = np.asarray(
        jax.vmap(lambda k: levered_env.reset(k).desired_vel[0])(keys)
    )
    assert np.abs(vx).min() >= 0.15 - 1e-6
    assert np.abs(vx).max() <= 0.5 + 1e-6
    # both signs still commanded
    assert 0.2 < (vx > 0).mean() < 0.8
    # y/z commands keep the reference's zeros (go1_mujoco_env.py:107-108)
    dv = np.asarray(levered_env.reset(keys[0]).desired_vel)
    assert dv[1] == 0.0 and dv[2] == 0.0


@pytest.mark.smoke
def test_stand_still_cost_semantics(levered_env):
    env = levered_env
    # jitted step, as in production: eager stepping compiles the physics
    # scan as a standalone primitive program, and XLA:CPU's compile of
    # that program segfaults on some of this VM pool's host generations
    # (see quadruped_tpu/utils/cache.py — same family as the round-3
    # suite aborts); the fused jit program compiles fine everywhere
    step = jax.jit(env.step)
    st = env.reset(jax.random.PRNGKey(3))
    # settle a few steps so all four feet carry load at the home pose
    for _ in range(25):
        st, _obs, _r, _t, _tr, info = step(st, jnp.zeros(12))
    assert bool(np.all(np.asarray(st.last_feet_forces) > 1.0)), (
        "home pose should have all four feet loaded"
    )
    # standing under a moving command: the cost is charged at full weight
    # on healthy steps.  The charge is deliberately health-gated, and the
    # reference's health quirk (the "pitch" range (-pi, 0] applied to the
    # quat-y COMPONENT, go1_mujoco_env.py:435-458) flips with millirad
    # trunk jitter while standing — so assert over a window: the charge
    # fires, and every step it fires the robot was commanded + loaded.
    cmd = jnp.asarray([0.3, 0.0, 0.0], st.qpos.dtype)
    s, charges, moved = st, [], []
    for _ in range(30):
        s = dataclasses.replace(s, desired_vel=cmd)
        s, _o, _r, _t, _tr, info = step(s, jnp.zeros(12))
        charges.append(float(info["stand_still_cost"]))
        moved.append(abs(float(s.qvel[0])))
    assert min(charges) == pytest.approx(-1.5), (
        "standing under command never charged"
    )
    assert max(moved) < 0.1, "probe robot should be standing, not moving"
    # command below the 0.1 gate: never charged
    st_idle = dataclasses.replace(
        st, desired_vel=jnp.asarray([0.05, 0.0, 0.0], st.qpos.dtype)
    )
    _s, _o, _r, _t, _tr, info = step(st_idle, jnp.zeros(12))
    assert info["stand_still_cost"] == 0.0
    # weight 0 (reference semantics): the channel does not exist at all
    ref = Go1Env(dataclasses.replace(env.cfg, stand_still_cost=0.0))
    st_cmd = dataclasses.replace(st, desired_vel=cmd)
    _s, _o, _r, _t, _tr, info = jax.jit(ref.step)(st_cmd, jnp.zeros(12))
    assert "stand_still_cost" not in info


@pytest.mark.smoke
def test_stand_still_velocity_mode(levered_env):
    """Round 5: the velocity trigger charges stepping-in-place (which the
    contact trigger missed — the 60M flagship's dodge) and releases only
    on commanded-direction translation."""
    env = Go1Env(dataclasses.replace(
        levered_env.cfg, stand_still_mode="velocity"
    ))
    step = jax.jit(env.step)
    st = env.reset(jax.random.PRNGKey(3))
    for _ in range(25):
        st, _o, _r, _t, _tr, info = step(st, jnp.zeros(12))
    cmd = jnp.asarray([0.3, 0.0, 0.0], st.qpos.dtype)
    # stationary under command: charged regardless of foot contacts
    s, charges = st, []
    for _ in range(20):
        s = dataclasses.replace(s, desired_vel=cmd)
        s, _o, _r, _t, _tr, info = step(s, jnp.zeros(12))
        charges.append(float(info["stand_still_cost"]))
    assert min(charges) == pytest.approx(-1.5)
    # translating at the command: never charged — inject forward base
    # velocity above the 30% threshold (0.09 m/s for a 0.3 command)
    qv = st.qvel.at[0].set(0.3)
    s2 = dataclasses.replace(st, qvel=qv, desired_vel=cmd)
    _s, _o, _r, _t, _tr, info = step(s2, jnp.zeros(12))
    assert info["stand_still_cost"] == 0.0
    # moving the WRONG way at full speed: charged (projection < 0)
    qv = st.qvel.at[0].set(-0.3)
    s3 = dataclasses.replace(st, qvel=qv, desired_vel=cmd)
    _s, _o, _r, _t, _tr, info = step(s3, jnp.zeros(12))
    assert info["stand_still_cost"] == pytest.approx(-1.5)


@pytest.mark.smoke
def test_runner_eval_env_restores_reference_semantics(levered_env):
    from quadruped_tpu.learn.ppo import PPOConfig
    from quadruped_tpu.learn.runner import Runner, RunnerConfig

    r = Runner(
        levered_env, PPOConfig(num_envs=2, n_steps=4),
        RunnerConfig(n_eval_episodes=2, save_videos=False, verbose=False),
    )
    ec = r.eval_env.cfg
    assert ec.reward_floor and ec.accel_cost_mode == "dynamic"
    assert ec.command_speed_floor == 0.0 and ec.stand_still_cost == 0.0
    assert ec.feet_airtime_bootstrap == 0.0
    # physics/interface must be untouched
    assert ec.ctrl_type == "position" and ec.action_mode == "centered"


@pytest.mark.smoke
def test_gait_metrics_expose_stander_signals():
    from quadruped_tpu.learn.runner import Runner

    B, T = 3, 6
    z = np.zeros((B, T))
    out = {
        "valid": np.ones((B, T), bool),
        "healthy": np.ones((B, T), bool),
        "tracking_error": z + 0.3,
        "desired_speed": z + 0.3,
        "distance_from_origin": z + 0.01,
        "reward_components": {"feet_airtime_reward": z},
    }
    g = Runner._gait_metrics(out)
    # the stander signature: commanded but no displacement, no stepping
    assert g["mean_desired_speed"] == pytest.approx(0.3)
    assert g["feet_airtime"] == 0.0
    assert g["distance"] == pytest.approx(0.01)
    # a walker's numbers pass the same yardsticks
    out["distance_from_origin"] = np.tile(
        np.linspace(0, 0.3 * T, T), (B, 1)
    )
    out["reward_components"]["feet_airtime_reward"] = z + 0.02
    g2 = Runner._gait_metrics(out)
    assert g2["feet_airtime"] > 0.0
    assert g2["distance"] >= 0.5 * g2["mean_desired_speed"] * T
