"""Golden-value tests for the Go1 env against an independent numpy oracle.

The oracle drives CPU MuJoCo for physics and re-implements the reference
reward/obs formulas (SURVEY.md section 2, C2-C6) directly in the test.  To
avoid chaotic divergence, the oracle is state-coupled: at every control
step it is reset to the env's pre-step state, so obs/reward comparisons are
exact-tolerance, not trajectory-tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from quadruped_tpu.assets import go1_xml
from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import FEET_BODIES, CONTACT_BODIES, Go1Env


@pytest.fixture(scope="module")
def env():
    return Go1Env(Go1Config(ctrl_type="torque"))


@pytest.fixture(scope="module")
def oracle_model(env):
    return mujoco.MjModel.from_xml_string(go1_xml("torque"))


def euler_from_quat_np(w, x, y, z):
    t0 = 2.0 * (w * x + y * z)
    t1 = 1.0 - 2.0 * (x * x + y * y)
    roll = np.arctan2(t0, t1)
    t2 = np.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = np.arcsin(t2)
    t3 = 2.0 * (w * z + x * y)
    t4 = 1.0 - 2.0 * (y * y + z * z)
    yaw = np.arctan2(t3, t4)
    return np.array([roll, pitch, yaw])


def projected_gravity_np(qpos):
    euler = euler_from_quat_np(*qpos[3:7])
    pg = np.dot(np.array([0, 0, -9.81]), euler) * euler
    n = np.linalg.norm(pg)
    return pg if n == 0 else pg / n


class Oracle:
    """Reference-formula scoreboard over a mujoco rollout (quadruped)."""

    def __init__(self, mj):
        self.mj = mj
        self.d = mujoco.MjData(mj)
        self.key_qpos = mj.key_qpos[0].copy()
        r = mj.actuator_ctrlrange
        off = 0.5 * 0.1 * (r[:, 1] - r[:, 0])
        self.soft = np.stack([r[:, 0] + off, r[:, 1] - off], axis=1)
        self.default_joint = mj.key_ctrl[0].copy()

    def health(self, qpos, qvel):
        sv = np.concatenate([qpos, qvel])
        if not np.isfinite(sv).all():
            return False
        if not (0.22 <= qpos[2] <= 1.8):
            return False
        if not (-np.deg2rad(80) <= qpos[4] <= np.deg2rad(80)):
            return False
        if not (-np.pi <= qpos[5] <= 0.0):
            return False
        return True

    def health_dev(self, qpos):
        def dev(v, lo, hi):
            if lo <= v <= hi:
                return 0.0
            return min(abs(v - lo), abs(v - hi))
        return np.array(
            [
                dev(qpos[2], 0.22, 1.8),
                dev(qpos[4], -np.deg2rad(80), np.deg2rad(80)),
                dev(qpos[5], -np.pi, 0.0),
            ]
        )

    def run_step(self, qpos, qvel, action, env_stateful):
        """10 mujoco substeps from (qpos,qvel); returns (obs, reward) using
        the stateful vars dict (mutated in place)."""
        mj, d = self.mj, self.d
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = action
        for _ in range(10):
            mujoco.mj_step(mj, d)
        mujoco.mj_rnePostConstraint(mj, d)

        s = env_stateful
        dt = 0.02
        healthy = self.health(d.qpos, d.qvel)
        pg = projected_gravity_np(d.qpos)

        # obs (go1_mujoco_env.py:915-947); last_action is pre-update
        obs = np.concatenate(
            [
                d.qvel[:3] * 2.0,
                d.qvel[3:6] * 0.25,
                pg,
                s["desired_vel"] * 2.0,
                d.qpos[7:] - self.key_qpos[7:],
                d.qvel[6:] * 0.05,
                s["last_action"],
            ]
        ).clip(-100, 100)

        # rewards
        lin = np.exp(-np.sum((s["desired_vel"][:2] - d.qvel[:2]) ** 2) / 0.25) * 2.0
        ang = np.exp(-((s["desired_vel"][2] - d.qvel[5]) ** 2) / 0.25) * 1.0
        healthy_r = 1.0 if healthy else 0.0

        feet_forces = np.linalg.norm(d.cfrc_ext[list(FEET_BODIES)], axis=1)
        curr = feet_forces > 1.0
        filt = np.logical_or(curr, s["last_contacts"])
        s["last_contacts"] = curr
        first = (s["feet_air_time"] > 0.0) * filt
        s["feet_air_time"] = s["feet_air_time"] + dt
        air = np.sum(((s["feet_air_time"] - 0.2).clip(min=0.0) ** 2) * first)
        air *= np.linalg.norm(s["desired_vel"][:2]) > 0.1
        s["feet_air_time"] = s["feet_air_time"] * ~filt
        feet_air = air * 5.0

        dev = self.health_dev(d.qpos)
        if healthy:
            recovery = 0.0
            s["last_health_dev"] = np.zeros(3)
        else:
            recovery = np.sum(s["last_health_dev"] - dev) * 10.0
            s["last_health_dev"] = dev

        if healthy:
            get_up = 0.0
        else:
            height = np.clip(d.xpos[1][2] / 0.22, 0.0, 1.0)
            orient = 1.0 - np.sum(pg[:2] ** 2)
            get_up = (1.5 * height + 0.5 * orient) * 20.0

        scale = 1.0 if healthy else 0.1
        torque = np.sum(d.qfrc_actuator[-12:] ** 2) * scale * 2e-4
        act_rate = np.sum((s["last_action"] - action) ** 2) * scale * 0.01
        vert = d.qvel[2] ** 2 * 2.0
        xy_ang = np.sum(d.qvel[3:5] ** 2) * 0.05
        oor = (self.soft[:, 0] - d.qpos[7:]).clip(min=0) + (
            d.qpos[7:] - self.soft[:, 1]
        ).clip(min=0)
        jlim = np.sum(oor) * 10.0
        jvel = np.sum(d.qvel[6:] ** 2) * 0.01
        jacc = (
            np.sum(d.qacc[6:] ** 2 / (np.abs(d.qvel[6:]) + 1e-6)) * scale * 2e-4
        )
        coll = float(np.linalg.norm(d.cfrc_ext[list(CONTACT_BODIES)]) > 0.1)
        unhealthy_c = 0.0 if healthy else 5.0
        orientation = np.sum(pg[:2] ** 2) * 1.0
        default_c = np.sum((d.qpos[7:] - self.default_joint) ** 2) * 0.1

        reward = max(
            0.0,
            (lin + ang + healthy_r + feet_air + recovery + get_up)
            - (torque + act_rate + vert + xy_ang + jlim + jvel + jacc + coll
               + unhealthy_c + orientation + default_c),
        )
        s["last_action"] = action.copy()
        return obs, reward, d.qpos.copy(), d.qvel.copy()


def _run_parity(env, oracle, n_steps, action_fn, atol_obs=2e-4,
                atol_rew=2e-3, atol_drift=1e-4, seed=0):
    state = env.reset(jax.random.PRNGKey(seed))
    state = dataclasses.replace(state, desired_vel=jnp.asarray([0.4, 0.0, 0.0]))
    stateful = dict(
        desired_vel=np.array([0.4, 0.0, 0.0]),
        last_action=np.zeros(12),
        last_contacts=np.zeros(4, bool),
        feet_air_time=np.zeros(4),
        last_health_dev=np.zeros(3),
    )
    stepj = jax.jit(lambda s, a: env.step(s, a))
    for t in range(n_steps):
        action = action_fn(t)
        pre_qpos = np.array(state.qpos)
        pre_qvel = np.array(state.qvel)
        state, obs, reward, term, trunc, info = stepj(state, jnp.asarray(action))
        o_obs, o_rew, o_qpos, o_qvel = oracle.run_step(
            pre_qpos, pre_qvel, action, stateful
        )
        np.testing.assert_allclose(np.asarray(obs), o_obs, atol=atol_obs,
                                   err_msg=f"obs mismatch at step {t}")
        np.testing.assert_allclose(float(reward), o_rew, atol=atol_rew,
                                   err_msg=f"reward mismatch at step {t}")
        # keep the oracle's stateful vars coherent with MY trajectory:
        # re-sync its physics state to mine (divergence control)
        drift = np.abs(np.array(state.qpos) - o_qpos).max()
        assert drift < atol_drift, f"physics drift {drift} at step {t}"
    return state, info


@pytest.mark.smoke
def test_obs_reward_parity(env, oracle_model):
    """State-coupled parity: my env vs numpy oracle over 40 control steps,
    covering healthy standing, walking commands and a fall."""
    oracle = Oracle(oracle_model)
    rng_a = np.random.default_rng(3)
    _run_parity(env, oracle, 40, lambda t: rng_a.uniform(-0.6, 0.6, 12))


def test_obs_reward_parity_position():
    """Same parity loop on the POSITION-servo model (kp=100 actuators,
    ctrl = target joint angle; go1_position.xml)."""
    env = Go1Env(Go1Config(ctrl_type="position"))
    mj = mujoco.MjModel.from_xml_string(go1_xml("position"))
    oracle = Oracle(mj)
    home = mj.key_ctrl[0].copy()
    rng_a = np.random.default_rng(5)
    # kp=100 servos are stiffer than raw torques: allow slightly looser
    # velocity-obs tolerance for accumulated solver-iteration differences
    _run_parity(
        env, oracle, 40, lambda t: home + rng_a.uniform(-0.35, 0.35, 12),
        atol_obs=1e-3, atol_rew=5e-3, atol_drift=3e-4,
    )


class BipedOracle(Oracle):
    """Reference-formula scoreboard for BIPED mode: quadruped base terms
    minus orientation/default-pos, plus the upright reward, the alternating
    rear-feet bonus and the 10 extra biped costs
    (go1_mujoco_env.py:269-430, 869-904)."""

    def __init__(self, mj):
        super().__init__(mj)
        import mujoco as mj_

        def bid(n):
            return mj_.mj_name2id(mj, mj_.mjtObj.mjOBJ_BODY.value, n)

        def sid(n):
            return mj_.mj_name2id(mj, mj_.mjtObj.mjOBJ_SITE.value, n)

        self.front_knees = [bid("FR_calf"), bid("FL_calf")]
        self.front_feet_sites = [sid("FR"), sid("FL")]
        self.rear_hips = [bid("RR_hip"), bid("RL_hip")]
        self.front_hips = [bid("FR_hip"), bid("FL_hip")]
        self.unwanted = [bid(n) for n in (
            "trunk", "FR_thigh", "FL_thigh", "RR_thigh", "RL_thigh",
            "FR_calf", "FL_calf")]
        self.limb = {
            "fr": {bid("FR_hip"), bid("FR_thigh"), bid("FR_calf")},
            "fl": {bid("FL_hip"), bid("FL_thigh"), bid("FL_calf")},
            "rr": {bid("RR_hip"), bid("RR_thigh"), bid("RR_calf")},
            "rl": {bid("RL_hip"), bid("RL_thigh"), bid("RL_calf")},
        }

    def self_collision_count(self):
        d, mj = self.d, self.mj
        count = 0
        for i in range(d.ncon):
            b1 = mj.geom_bodyid[d.contact[i].geom1]
            b2 = mj.geom_bodyid[d.contact[i].geom2]
            pair = lambda A, B: (b1 in A and b2 in B) or (b2 in A and b1 in B)
            if pair(self.limb["fr"], self.limb["fl"]):
                count += 1
            elif pair(self.limb["rr"], self.limb["rl"]):
                count += 1
        return count

    def run_step(self, qpos, qvel, action, s):
        mj, d = self.mj, self.d
        import mujoco as mj_

        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = action
        for _ in range(10):
            mj_.mj_step(mj, d)
        mj_.mj_rnePostConstraint(mj, d)

        healthy = self.health(d.qpos, d.qvel)
        pg = projected_gravity_np(d.qpos)
        obs = np.concatenate(
            [
                d.qvel[:3] * 2.0,
                d.qvel[3:6] * 0.25,
                pg,
                s["desired_vel"] * 2.0,
                d.qpos[7:] - self.key_qpos[7:],
                d.qvel[6:] * 0.05,
                s["last_action"],
            ]
        ).clip(-100, 100)

        lin = np.exp(-np.sum((s["desired_vel"][:2] - d.qvel[:2]) ** 2) / 0.25) * 2.0
        ang = np.exp(-((s["desired_vel"][2] - d.qvel[5]) ** 2) / 0.25) * 1.0
        healthy_r = 1.0 if healthy else 0.0

        feet_forces = np.linalg.norm(d.cfrc_ext[list(FEET_BODIES)], axis=1)
        curr = feet_forces > 1.0
        # biped: alternating rear-feet bonus; air-time state NOT updated
        feet_air = float(curr[2] != curr[3]) * 5.0

        dev = self.health_dev(d.qpos)
        if healthy:
            recovery = 0.0
            s["last_health_dev"] = np.zeros(3)
        else:
            recovery = np.sum(s["last_health_dev"] - dev) * 10.0
            s["last_health_dev"] = dev
        if healthy:
            get_up = 0.0
        else:
            height = np.clip(d.xpos[1][2] / 0.22, 0.0, 1.0)
            orient = 1.0 - np.sum(pg[:2] ** 2)
            get_up = (1.5 * height + 0.5 * orient) * 20.0

        upright = max(0.0, d.xmat[1].reshape(3, 3)[:, 0] @ np.array([0, 0, 1.0])) * 15.0
        rewards = lin + ang + healthy_r + feet_air + get_up + recovery + upright

        scale = 1.0 if healthy else 0.1
        torque = np.sum(d.qfrc_actuator[-12:] ** 2) * scale * 2e-4
        act_rate = np.sum((s["last_action"] - action) ** 2) * scale * 0.01
        vert = d.qvel[2] ** 2 * 2.0
        xy_ang = np.sum(d.qvel[3:5] ** 2) * 0.05
        oor = (self.soft[:, 0] - d.qpos[7:]).clip(min=0) + (
            d.qpos[7:] - self.soft[:, 1]
        ).clip(min=0)
        jlim = np.sum(oor) * 10.0
        jvel = np.sum(d.qvel[6:] ** 2) * 0.01
        jacc = np.sum(d.qacc[6:] ** 2 / (np.abs(d.qvel[6:]) + 1e-6)) * scale * 2e-4
        coll = float(np.linalg.norm(d.cfrc_ext[list(CONTACT_BODIES)]) > 0.1)
        unhealthy_c = 0.0 if healthy else 5.0

        front_contact = np.sum(feet_forces[:2] ** 2) * 50.0
        rear_airborne = 5.0 if np.all(feet_forces[2:] < 1.0) else 0.0
        feet_z = d.site_xpos[self.front_feet_sites][:, 2]
        knees_z = d.xpos[self.front_knees][:, 2]
        front_foot_height = np.sum((knees_z - feet_z).clip(min=0.0)) * 8.0
        rh = d.xpos[self.rear_hips]
        crossed = max(0.0, rh[0, 1] - rh[1, 1]) * 5.0
        low_hips = np.sum((0.2 - rh[:, 2]).clip(min=0.0)) * 10.0 * 9.0
        fh_z = d.xpos[self.front_hips][:, 2]
        below_hips = np.sum(((fh_z - feet_z).clip(min=0.0)) ** 2) * 6.0
        abduction = np.sum(d.qpos[7:][[0, 3, 6, 9]] ** 2) * 0.7
        unwanted = np.sum(
            np.linalg.norm(d.cfrc_ext[self.unwanted], axis=1) ** 2
        ) * 150.0
        selfc = self.self_collision_count() * 25.0

        costs = (
            torque + act_rate + vert + xy_ang + jlim + jvel + jacc + coll
            + unhealthy_c + front_contact + rear_airborne + front_foot_height
            + crossed + low_hips + below_hips + abduction + unwanted + selfc
        )
        reward = max(0.0, rewards - costs)
        s["last_action"] = action.copy()
        return obs, reward, d.qpos.copy(), d.qvel.copy()


def test_biped_reward_parity():
    """State-coupled golden parity for the BIPED cost stack (upright,
    front-contact, crossed-legs, low-hips, abduction, unwanted-contact,
    self-collision, ...) on the torque model from the ready pose."""
    env = Go1Env(Go1Config(ctrl_type="torque", biped=True,
                           fallen_start_prob=0.0))
    mj = mujoco.MjModel.from_xml_string(go1_xml("torque"))
    oracle = BipedOracle(mj)
    rng_a = np.random.default_rng(11)
    state, info = _run_parity(
        env, oracle, 25, lambda t: rng_a.uniform(-0.35, 0.35, 12),
        atol_rew=5e-3,
    )
    assert "biped_upright_reward" in info and "self_collision_cost" in info


def test_reset_distribution(env):
    keys = jax.random.split(jax.random.PRNGKey(1), 200)
    states = jax.jit(jax.vmap(env.reset))(keys)
    z = np.asarray(states.qpos[:, 2])
    fallen = np.isclose(z, 0.1)
    assert 0.1 < fallen.mean() < 0.3  # 20% fallen-start curriculum
    dv = np.asarray(states.desired_vel)
    assert (dv[:, 0] >= -0.5).all() and (dv[:, 0] <= 0.5).all()
    assert (dv[:, 1:] == 0).all()
    assert np.asarray(states.qvel).max() == 0


def test_rand_power_noise():
    env = Go1Env(Go1Config(ctrl_type="torque", rand_power=1.0))
    keys = jax.random.split(jax.random.PRNGKey(2), 64)
    states = jax.jit(jax.vmap(env.reset))(keys)
    joints = np.asarray(states.qpos[:, 7:])
    home = env.key_qpos[7:]
    stand = ~np.isclose(np.asarray(states.qpos[:, 2]), 0.1)
    spread = np.abs(joints[stand] - home).mean()
    assert 0.02 < spread < 0.3  # gaussian sigma 0.1*rand_power applied
    lo, hi = env.jnt_range_hinges[:, 0], env.jnt_range_hinges[:, 1]
    assert (joints >= lo - 1e-9).all() and (joints <= hi + 1e-9).all()


def test_unhealthy_timer_and_truncation():
    cfg = Go1Config(ctrl_type="torque", max_episode_time=0.1)  # 5 steps
    env = Go1Env(cfg)
    state = env.reset(jax.random.PRNGKey(3))
    stepj = jax.jit(lambda s, a: env.step(s, a))
    for t in range(5):
        state, obs, r, term, trunc, info = stepj(state, jnp.zeros(12))
    assert bool(trunc)
    assert not bool(term)  # unhealthy needs 15s, impossible here


def test_autoreset():
    cfg = Go1Config(ctrl_type="torque", max_episode_time=0.1)
    env = Go1Env(cfg)
    state = env.reset(jax.random.PRNGKey(4))
    stepj = jax.jit(lambda s, a: env.step_autoreset(s, a))
    for t in range(6):
        state, obs, r, term, trunc, info = stepj(state, jnp.zeros(12))
    assert int(state.steps) <= 1  # wrapped around


def test_biped_mode_smoke():
    cfg = Go1Config(ctrl_type="torque", biped=True)
    env = Go1Env(cfg)
    state = env.reset(jax.random.PRNGKey(5))
    # biped ready pose: vertical trunk at z=0.65 unless fallen-start fired
    stepj = jax.jit(lambda s, a: env.step(s, a))
    state, obs, r, term, trunc, info = stepj(state, jnp.zeros(12))
    assert obs.shape == (48,)
    assert np.isfinite(float(r))
    assert "biped_upright_reward" in info
    assert "self_collision_cost" in info


def test_vmap_batch_step(env):
    keys = jax.random.split(jax.random.PRNGKey(6), 8)
    states = jax.vmap(env.reset)(keys)
    actions = jnp.zeros((8, 12))
    stepv = jax.jit(jax.vmap(env.step_autoreset))
    states, obs, r, term, trunc, info = stepv(states, actions)
    assert obs.shape == (8, 48)
    assert r.shape == (8,)


def test_actuator_latency_dr():
    """With max_latency_steps, the physics sees delayed actions."""
    import dataclasses
    from quadruped_tpu.env.config import DomainRandomization

    cfg = Go1Config(
        ctrl_type="torque",
        dr=DomainRandomization(enabled=True, max_latency_steps=2,
                               friction_range=(1.0, 1.0),
                               mass_range=(1.0, 1.0), kp_range=(1.0, 1.0),
                               damping_range=(1.0, 1.0)),
    )
    env = Go1Env(cfg)
    s0 = env.reset(jax.random.PRNGKey(0))
    s_lat = dataclasses.replace(s0, latency=jnp.asarray(2, jnp.int32))
    s_now = dataclasses.replace(s0, latency=jnp.asarray(0, jnp.int32))
    stepj = jax.jit(lambda s, a: env.step(s, a))
    big = jnp.ones(12)
    # latency 2: the first big action must have no effect for 2 steps
    a_lat, _, _, _, _, _ = stepj(s_lat, big)
    a_now, _, _, _, _, _ = stepj(s_now, big)
    assert not np.allclose(np.asarray(a_lat.qpos), np.asarray(a_now.qpos))
    # delay semantics: latency-2 env fed [big, big, big] applies the action
    # stream [0, 0, big] (ring buffer starts zeroed), so its physics state
    # must track a latency-0 env fed exactly that delayed stream
    s_d = s_lat
    s_ref = s_now
    delayed = [jnp.zeros(12), jnp.zeros(12), big]
    for k in range(3):
        s_d, *_ = stepj(s_d, big)
        s_ref, *_ = stepj(s_ref, delayed[k])
        np.testing.assert_allclose(
            np.asarray(s_d.qpos), np.asarray(s_ref.qpos), atol=1e-12,
            err_msg=f"latency-delayed action stream diverged at step {k}",
        )
        np.testing.assert_allclose(
            np.asarray(s_d.qvel), np.asarray(s_ref.qvel), atol=1e-12,
        )


def test_action_mode_centered():
    """action_mode='centered' re-bases ctrl at the home keyframe
    (config.py action_mode): zero action must HOLD the home stance in
    position mode, while the reference 'raw' parameterization collapses
    (action=0 targets all-zero joint angles = straight legs).  Also pins
    the transform itself: a centered action a must produce the same
    physics as the raw ctrl key_ctrl + scale*a."""
    mk = lambda mode: Go1Env(Go1Config(
        ctrl_type="position", action_mode=mode, action_scale=0.3,
        fallen_start_prob=0.0,
    ))
    env_c, env_r = mk("centered"), mk("raw")
    zeros = jnp.zeros(12)
    key = jax.random.PRNGKey(7)

    # transform equivalence: one step from the same state
    s_c = env_c.reset(key)
    s_r = env_r.reset(key)
    a = 0.1 * jnp.arange(12, dtype=jnp.float32)
    raw_ctrl = jnp.asarray(env_c.default_joint_position, jnp.float32) + 0.3 * a
    n_c, *_ = jax.jit(env_c.step)(s_c, a)
    n_r, *_ = jax.jit(env_r.step)(s_r, raw_ctrl)
    np.testing.assert_allclose(
        np.asarray(n_c.qpos), np.asarray(n_r.qpos), atol=1e-12,
        err_msg="centered step != raw step at the equivalent ctrl",
    )

    # stance: zero action holds home (z stays near 0.27) for 2.4 s in
    # centered mode; raw collapses through the healthy_z floor (0.22)
    step_c = jax.jit(env_c.step)
    step_r = jax.jit(env_r.step)
    s_c, s_r = env_c.reset(key), env_r.reset(key)
    for _ in range(120):
        s_c, *_ = step_c(s_c, zeros)
        s_r, *_ = step_r(s_r, zeros)
    assert float(s_c.qpos[2]) > 0.24, "centered zero-action must stand"
    assert float(s_r.qpos[2]) < 0.22, "raw zero-action should collapse"
