"""Reference-side environment for the quality-parity harness.

Real MuJoCo C physics (the reference's dependency C13, requirements.txt:81)
driven by the reference's exact env semantics (go1_mujoco_env.py):

  * 48-dim observation with previous-action + euler-projected-gravity
    quirks (go1_mujoco_env.py:915-947, 596-608)
  * full quadruped reward stack with unhealthy discounts and the
    max(0, rewards - costs) floor (go1_mujoco_env.py:791-913)
  * reset from keyframe, 20% fallen starts, rand_power joint noise,
    desired-velocity resample (go1_mujoco_env.py:949-1015)
  * termination after 15 s continuously unhealthy; truncation at 120 s
    (go1_mujoco_env.py:64, 129-130, 487-498)

SB3 is not installed in this image, so the learner half of the reference
stack (tools/parity/torch_ppo.py) reimplements SB3 PPO's published
defaults in torch; this module is the MuJoCo half.  The formulas here are
the same ones the repo's oracle parity tests pin (tests/test_env.py) —
this is the reference behavior, independently executed on the reference's
physics engine.
"""

from __future__ import annotations

import numpy as np

import mujoco

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from quadruped_tpu.assets import go1_xml  # same MJCF the reference compiles

FEET_BODIES = [4, 7, 10, 13]
CONTACT_BODIES = [2, 3, 5, 6, 8, 9, 11, 12]


def euler_from_quat(w, x, y, z):
    t0 = 2.0 * (w * x + y * z)
    t1 = 1.0 - 2.0 * (x * x + y * y)
    roll = np.arctan2(t0, t1)
    t2 = np.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = np.arcsin(t2)
    t3 = 2.0 * (w * z + x * y)
    t4 = 1.0 - 2.0 * (y * y + z * z)
    yaw = np.arctan2(t3, t4)
    return np.array([roll, pitch, yaw])


def projected_gravity(qpos):
    euler = euler_from_quat(*qpos[3:7])
    pg = np.dot(np.array([0.0, 0.0, -9.81]), euler) * euler
    n = np.linalg.norm(pg)
    return pg if n == 0 else pg / n


class ReferenceGo1Env:
    """Single reference env (numpy/MuJoCo).  Gymnasium-style API."""

    DT = 0.02            # frame_skip 10 x 0.002 (go1_mujoco_env.py:49)
    MAX_STEPS = 6000     # 120 s truncation (go1_mujoco_env.py:64)
    MAX_UNHEALTHY = 15.0  # seconds (go1_mujoco_env.py:129-130)

    def __init__(self, ctrl_type="torque", rand_power=0.0,
                 fallen_start_prob=0.2, seed=0,
                 w_recovery=10.0, w_get_up=20.0):
        # w_recovery/w_get_up=0 + fallen_start_prob=0 is the 'locomotion'
        # profile: the objective the reference's walking-era artifacts
        # (models/2024-04-*) were trained on, before the fall-recovery
        # channels were added for the standing task
        self.w_recovery = w_recovery
        self.w_get_up = w_get_up
        self.mj = mujoco.MjModel.from_xml_string(go1_xml(ctrl_type))
        self.d = mujoco.MjData(self.mj)
        self.rng = np.random.default_rng(seed)
        self.rand_power = rand_power
        self.fallen_start_prob = fallen_start_prob
        self.key_qpos = self.mj.key_qpos[0].copy()
        r = self.mj.actuator_ctrlrange
        off = 0.5 * 0.1 * (r[:, 1] - r[:, 0])
        self.soft = np.stack([r[:, 0] + off, r[:, 1] - off], axis=1)
        self.default_joint = self.mj.key_ctrl[0].copy()
        self.act_low = r[:, 0].copy()
        self.act_high = r[:, 1].copy()
        self.obs_dim = 48
        self.act_dim = 12

    # ------------------------------------------------------------- helpers

    def _health(self, qpos, qvel):
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

    def _health_dev(self, qpos):
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

    def _obs(self):
        d = self.d
        return np.concatenate(
            [
                d.qvel[:3] * 2.0,
                d.qvel[3:6] * 0.25,
                projected_gravity(d.qpos),
                self.desired_vel * 2.0,
                d.qpos[7:] - self.key_qpos[7:],
                d.qvel[6:] * 0.05,
                self.last_action,
            ]
        ).clip(-100, 100).astype(np.float32)

    # ----------------------------------------------------------------- API

    def reset(self):
        mj, d = self.mj, self.d
        mujoco.mj_resetData(mj, d)
        qpos = self.key_qpos.copy()
        if self.rng.random() < self.fallen_start_prob:
            angle = self.rng.uniform(np.pi / 2.1, np.pi / 1.5)
            axis = (
                np.array([1.0, 0, 0]) if self.rng.random() < 0.5
                else np.array([0.0, 1, 0])
            )
            s, c = np.sin(angle / 2), np.cos(angle / 2)
            qpos[3:7] = np.array([c, *(s * axis)])
            qpos[2] = 0.1
        noise = self.rng.normal(size=12) * (0.1 * self.rand_power)
        lo = mj.jnt_range[1:, 0]
        hi = mj.jnt_range[1:, 1]
        qpos[7:] = np.clip(qpos[7:] + noise, lo, hi)
        d.qpos[:] = qpos
        d.qvel[:] = 0.0
        d.ctrl[:] = qpos[7:]
        mujoco.mj_forward(mj, d)
        self.desired_vel = np.array([self.rng.uniform(-0.5, 0.5), 0.0, 0.0])
        self.last_action = np.zeros(12)
        self.last_contacts = np.zeros(4, bool)
        self.feet_air_time = np.zeros(4)
        self.last_health_dev = np.zeros(3)
        self.time_unhealthy = 0.0
        self.steps = 0
        return self._obs()

    def step(self, action):
        mj, d = self.mj, self.d
        action = np.clip(action, self.act_low, self.act_high)
        d.ctrl[:] = action
        for _ in range(10):
            mujoco.mj_step(mj, d)
        mujoco.mj_rnePostConstraint(mj, d)
        self.steps += 1

        healthy = self._health(d.qpos, d.qvel)
        pg = projected_gravity(d.qpos)

        # rewards (weights: go1_mujoco_env.py:69-89)
        lin = np.exp(
            -np.sum((self.desired_vel[:2] - d.qvel[:2]) ** 2) / 0.25
        ) * 2.0
        ang = np.exp(-((self.desired_vel[2] - d.qvel[5]) ** 2) / 0.25) * 1.0
        healthy_r = 1.0 if healthy else 0.0

        feet_forces = np.linalg.norm(d.cfrc_ext[FEET_BODIES], axis=1)
        curr = feet_forces > 1.0
        filt = np.logical_or(curr, self.last_contacts)
        self.last_contacts = curr
        first = (self.feet_air_time > 0.0) * filt
        self.feet_air_time = self.feet_air_time + self.DT
        air = np.sum(((self.feet_air_time - 0.2).clip(min=0.0) ** 2) * first)
        air *= np.linalg.norm(self.desired_vel[:2]) > 0.1
        self.feet_air_time = self.feet_air_time * ~filt
        feet_air = air * 5.0

        dev = self._health_dev(d.qpos)
        if healthy:
            recovery = 0.0
            self.last_health_dev = np.zeros(3)
        else:
            recovery = np.sum(self.last_health_dev - dev) * self.w_recovery
            self.last_health_dev = dev

        if healthy:
            get_up = 0.0
        else:
            height = np.clip(d.xpos[1][2] / 0.22, 0.0, 1.0)
            orient = 1.0 - np.sum(pg[:2] ** 2)
            get_up = (1.5 * height + 0.5 * orient) * self.w_get_up

        scale = 1.0 if healthy else 0.1
        torque = np.sum(d.qfrc_actuator[-12:] ** 2) * scale * 2e-4
        act_rate = np.sum((self.last_action - action) ** 2) * scale * 0.01
        vert = d.qvel[2] ** 2 * 2.0
        xy_ang = np.sum(d.qvel[3:5] ** 2) * 0.05
        oor = (self.soft[:, 0] - d.qpos[7:]).clip(min=0) + (
            d.qpos[7:] - self.soft[:, 1]
        ).clip(min=0)
        jlim = np.sum(oor) * 10.0
        jvel = np.sum(d.qvel[6:] ** 2) * 0.01
        jacc = (
            np.sum(d.qacc[6:] ** 2 / (np.abs(d.qvel[6:]) + 1e-6))
            * scale * 2e-4
        )
        coll = float(np.linalg.norm(d.cfrc_ext[CONTACT_BODIES]) > 0.1)
        unhealthy_c = 0.0 if healthy else 5.0
        orientation = np.sum(pg[:2] ** 2) * 1.0
        default_c = np.sum((d.qpos[7:] - self.default_joint) ** 2) * 0.1

        reward = max(
            0.0,
            (lin + ang + healthy_r + feet_air + recovery + get_up)
            - (torque + act_rate + vert + xy_ang + jlim + jvel + jacc + coll
               + unhealthy_c + orientation + default_c),
        )
        self.last_action = action.copy()

        self.time_unhealthy = 0.0 if healthy else self.time_unhealthy + self.DT
        terminated = self.time_unhealthy > self.MAX_UNHEALTHY
        truncated = self.steps >= self.MAX_STEPS
        info = {
            "healthy": healthy,
            "tracking_error": float(
                np.linalg.norm(self.desired_vel[:2] - d.qvel[:2])
            ),
        }
        return self._obs(), reward, terminated, truncated, info
