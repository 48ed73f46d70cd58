"""Pure-functional Go1 velocity-command locomotion environment.

TPU-first redesign of the reference Gymnasium env (go1_mujoco_env.py):
immutable EnvState pytree, pure reset/step closed over the compiled
physics pipeline, `vmap`-batched over thousands of envs and `lax.scan`-able
for fused rollouts.  Semantics replicate the reference exactly, including
its quirks (documented inline with file:line citations):

  * obs contains the *previous* action (go1_mujoco_env.py:933,529 — the
    _last_action attribute is read in _get_obs before being updated)
  * projected_gravity uses the reference's euler-angle formula
    (go1_mujoco_env.py:596-608), not a quaternion rotation
  * the health check reads quaternion x/y components as "roll"/"pitch"
    (go1_mujoco_env.py:435-458 vs qpos layout at 916-921)
  * collision_cost is a Frobenius norm over all contact bodies, yielding a
    0/1 indicator (go1_mujoco_env.py:688-693, np.linalg.norm without axis)
  * body/site kinematics and cfrc in rewards are pre-integration values of
    the final substep (MuJoCo leaves xpos stale after mj_step), while obs
    and velocity rewards use post-integration qpos/qvel
  * reward floored at zero: max(0, rewards - costs) (go1_mujoco_env.py:911)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..mjcf.model import PhysicsModel
from ..physics.forward import Pipeline, step_n
from ..physics.math import axis_angle_to_quat, euler_from_quat
from .config import Go1Config

# body ids (validated against model in __init__): world, trunk, then
# hip/thigh/calf x FR,FL,RR,RL — feet forces live on the calf bodies
TRUNK = 1
FEET_BODIES = (4, 7, 10, 13)            # go1_mujoco_env.py:124
FRONT_FEET_BODIES = (4, 7)              # go1_mujoco_env.py:125
CONTACT_BODIES = (2, 3, 5, 6, 8, 9, 11, 12)  # go1_mujoco_env.py:126

TERM_NOT = 0
TERM_NOT_FINITE = 1
TERM_Z = 2
TERM_ROLL = 3
TERM_PITCH = 4


@flax.struct.dataclass
class EnvState:
    qpos: jax.Array                 # (nq,)
    qvel: jax.Array                 # (nv,)
    params: Any                     # physics ModelParams pytree (DR-able)
    rng: jax.Array                  # PRNG key
    steps: jax.Array                # i32
    time_unhealthy: jax.Array       # f
    feet_air_time: jax.Array        # (4,)
    last_contacts: jax.Array        # (4,) bool
    last_action: jax.Array          # (12,)
    desired_vel: jax.Array          # (3,)
    last_health_dev: jax.Array      # (3,) z/roll/pitch deviations
    front_feet_touched: jax.Array   # bool
    last_feet_forces: jax.Array     # (4,) cfrc norms from previous step
    rand_power: jax.Array           # curriculum reset-noise scale (C8)
    qacc_warm: jax.Array            # (nv,) solver warmstart (qacc_warmstart)
    action_buf: jax.Array           # (max_latency+1, 12) actuator-latency DR
    latency: jax.Array              # i32 per-episode action delay in steps
    gait: jax.Array                 # i32 commanded gait (0 trot/1 pace/2 bound)
    gait_phase: jax.Array           # f in [0,1): shared gait clock


class Go1Env:
    """Static env object: compiled pipeline + config + derived constants.

    All methods are pure functions of (state, action); instances are
    hashable by identity for use as static jit arguments.
    """

    def __init__(self, cfg: Go1Config, model: PhysicsModel | None = None):
        from ..assets import robot_model

        self.cfg = cfg
        self.m = model if model is not None else robot_model(
            getattr(cfg, "robot", "go1"), cfg.ctrl_type
        )
        if cfg.solver_iterations is not None:
            self.m.opt.iterations = int(cfg.solver_iterations)
        mode = cfg.collision_mode
        if cfg.biped and mode == "plane":
            mode = "full"  # self-collision costs need self pairs
        pools = None
        if cfg.contact_pools is not None and mode != "full":
            # round 2's flagship runs silently lost the pooled layout (and
            # its +26% measured throughput) this way — never again quietly
            import warnings

            warnings.warn(
                "contact_pools requires collision_mode='full'; ignoring "
                f"pools in {mode!r} mode",
                stacklevel=2,
            )
        if cfg.contact_pools is not None and mode == "full":
            if len(cfg.contact_pools) != 3:
                raise ValueError(
                    "contact_pools must be (K_condim6, K_condim3, "
                    f"K_condim1); got {cfg.contact_pools!r}"
                )
            pools = dict(zip((6, 3, 1), cfg.contact_pools))
        self.pipeline = Pipeline.build(
            self.m, mode,
            max_contacts=cfg.max_contacts if mode == "full" else None,
            contact_pools=pools,
        )

        m = self.m
        assert m.body_names[TRUNK] == "trunk"
        assert [m.body_names[i] for i in FEET_BODIES] == [
            "FR_calf", "FL_calf", "RR_calf", "RL_calf",
        ]
        self.key_qpos = m.key_qpos[0].copy()
        # reference quirk: default joint position = key_ctrl (zeros for the
        # torque model, home pose for position), go1_mujoco_env.py:105
        self.default_joint_position = m.key_ctrl[0].copy()
        # soft joint range from actuator ctrlrange, go1_mujoco_env.py:134-145
        r = m.actuator_ctrlrange
        off = 0.5 * (1 - cfg.soft_joint_factor) * (r[:, 1] - r[:, 0])
        self.soft_joint_range = np.stack([r[:, 0] + off, r[:, 1] - off], axis=1)
        self.jnt_range_hinges = m.jnt_range[1:, :].copy()  # go1_mujoco_env.py:981

        # site ids for feet (named FR FL RR RL), go1_mujoco_env.py:155-164
        self.feet_sites = [m.site_names.index(s) for s in ("FR", "FL", "RR", "RL")]
        self.front_feet_sites = self.feet_sites[:2]
        self.front_knee_bodies = [m.name2id("body", n) for n in ("FR_calf", "FL_calf")]
        self.rear_hip_bodies = [m.name2id("body", n) for n in ("RR_hip", "RL_hip")]
        self.front_hip_bodies = [m.name2id("body", n) for n in ("FR_hip", "FL_hip")]
        self.unwanted_contact_bodies = [
            m.name2id("body", n)
            for n in ("trunk", "FR_thigh", "FL_thigh", "RR_thigh", "RL_thigh",
                      "FR_calf", "FL_calf")
        ]

        # self-collision candidate masks (biped), go1_mujoco_env.py:202-217
        lay = self.pipeline.layout
        b1, b2 = lay.con_body1, lay.con_body2
        def limb(*names):
            return {m.name2id("body", n) for n in names}
        fr = limb("FR_hip", "FR_thigh", "FR_calf")
        fl = limb("FL_hip", "FL_thigh", "FL_calf")
        rr = limb("RR_hip", "RR_thigh", "RR_calf")
        rl = limb("RL_hip", "RL_thigh", "RL_calf")
        def pair_mask(A, B):
            return np.array(
                [(x in A and y in B) or (x in B and y in A)
                 for x, y in zip(b1, b2)]
            )
        self.self_collision_mask = pair_mask(fr, fl) | pair_mask(rr, rl)

        self.gravity_vec = m.opt.gravity.copy()
        self.nu = m.nu
        # 48 (go1_mujoco_env.py:151-153) + gait one-hot/clock when enabled
        self.obs_dim = 48 + (5 if cfg.gait_conditioning else 0)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    # ------------------------------------------------------------------ reset

    def reset(
        self, rng: jax.Array, params: Any | None = None,
        rand_power: jax.Array | float | None = None,
    ) -> EnvState:
        """reset_model equivalent (go1_mujoco_env.py:949-1001).

        rand_power is a dynamic input so the curriculum (reference
        CurriculumCallback, training_callback.py:24-69) can anneal it
        without recompilation."""
        cfg = self.cfg
        if params is None:
            params = jax.tree.map(jnp.asarray, self.m.params())
        if rand_power is None:
            rand_power = cfg.rand_power
        (rng, k_fall, k_angle, k_axis, k_noise, k_vel, k_dr) = jax.random.split(rng, 7)

        qpos = jnp.asarray(self.key_qpos)
        dtype = qpos.dtype

        # 20%: fallen start (roll or pitch 85-120 deg, z=0.1), lines 953-965
        angle = jax.random.uniform(k_angle, (), dtype, jnp.pi / 2.1, jnp.pi / 1.5)
        roll_quat = axis_angle_to_quat(jnp.asarray([1.0, 0, 0], dtype), angle)
        pitch_quat = axis_angle_to_quat(jnp.asarray([0.0, 1, 0], dtype), angle)
        fall_quat = jnp.where(
            jax.random.uniform(k_axis, ()) < 0.5, roll_quat, pitch_quat
        )
        fallen = jax.random.uniform(k_fall, ()) < cfg.fallen_start_prob

        if cfg.biped:
            ready = jnp.asarray(cfg.biped_ready_joints, dtype)
            pitch = jnp.deg2rad(jnp.asarray(cfg.biped_ready_pitch_deg, dtype))
            biped_quat = axis_angle_to_quat(jnp.asarray([0.0, 1, 0], dtype), pitch)
            alt_joints, alt_z, alt_quat = ready, cfg.biped_ready_height, biped_quat
        else:
            alt_joints, alt_z, alt_quat = (
                qpos[7:], qpos[2], qpos[3:7]
            )

        joints = jnp.where(fallen, qpos[7:], alt_joints)
        z = jnp.where(fallen, 0.1, alt_z)
        quat = jnp.where(fallen, fall_quat, alt_quat)

        # joint noise scaled by rand_power, clipped to limits, lines 974-982
        rp = jnp.asarray(rand_power, dtype)
        noise = jax.random.normal(k_noise, (12,), dtype) * (0.1 * rp)
        joints = jnp.clip(
            joints + noise,
            jnp.asarray(self.jnt_range_hinges[:, 0], dtype),
            jnp.asarray(self.jnt_range_hinges[:, 1], dtype),
        )

        qpos = qpos.at[2].set(z).at[3:7].set(quat).at[7:].set(joints)
        qvel = jnp.zeros(self.m.nv, dtype)

        desired = jax.random.uniform(
            k_vel, (3,), dtype,
            jnp.asarray(cfg.desired_vel_min, dtype),
            jnp.asarray(cfg.desired_vel_max, dtype),
        )
        if cfg.command_speed_floor > 0:
            # anti-standing lever (a), config.py: remap the x-command's
            # magnitude U(0, hi) -> U(floor, hi) keeping its sign, so no
            # training episode is trackable by standing still.  Train-time
            # deviation from go1_mujoco_env.py:1011-1015; the eval env
            # keeps floor 0 (learn/runner.py).
            hi = abs(cfg.desired_vel_max[0])
            lo = jnp.asarray(cfg.command_speed_floor, dtype)
            sign = jnp.where(desired[0] >= 0, 1.0, -1.0).astype(dtype)
            mag = lo + (jnp.abs(desired[0]) / hi) * (hi - lo)
            desired = desired.at[0].set(sign * mag)

        # k_gait drawn here, BEFORE k_dr is consumed by _randomize: threefry
        # split children are counter-positional, so splitting k_dr again
        # after _randomize's split(k_dr, 4) would make the commanded gait a
        # deterministic function of the mass-DR draw (ADVICE r1, medium)
        k_dr, k_lat, k_ter, k_gait = jax.random.split(k_dr, 4)
        if cfg.dr.enabled:
            # randomize from the NOMINAL model params, never from the
            # incoming (already-randomized) episode params: re-randomizing
            # state.params on every autoreset would compound multiplicative
            # factors into an unbounded geometric random walk
            params = self._randomize(
                jax.tree.map(jnp.asarray, self.m.params()), k_dr
            )
        if cfg.terrain == "rough":
            # fresh heightfield every episode (physics/terrain.py); spawn z
            # rides the field height under the trunk so the reset pose
            # clears the ground the same way it does on the flat plane
            from ..physics.terrain import height_normal, sample_terrain_params

            params = dict(params)
            params.update(
                sample_terrain_params(
                    k_ter, cfg.terrain_waves, cfg.terrain_amplitude,
                    cfg.terrain_wavelength, dtype,
                )
            )
            h0, _ = height_normal(params, qpos[:2])
            qpos = qpos.at[2].add(h0)
        if cfg.dr.enabled and cfg.dr.max_latency_steps > 0:
            latency = jax.random.randint(
                k_lat, (), 0, cfg.dr.max_latency_steps + 1
            )
        else:
            latency = jnp.zeros((), jnp.int32)

        if cfg.gait_conditioning:
            gait = jax.random.randint(k_gait, (), 0, 3)
        else:
            gait = jnp.zeros((), jnp.int32)

        return EnvState(
            qpos=qpos,
            qvel=qvel,
            params=params,
            rng=rng,
            steps=jnp.zeros((), jnp.int32),
            time_unhealthy=jnp.zeros((), dtype),
            feet_air_time=jnp.zeros(4, dtype),
            last_contacts=jnp.zeros(4, bool),
            last_action=jnp.zeros(12, dtype),
            desired_vel=desired,
            last_health_dev=jnp.zeros(3, dtype),
            front_feet_touched=jnp.zeros((), bool),
            last_feet_forces=jnp.zeros(4, dtype),
            rand_power=rp,
            qacc_warm=jnp.zeros(self.m.nv, dtype),
            action_buf=jnp.zeros(
                (self.cfg.dr.max_latency_steps + 1, 12), dtype
            ),
            latency=latency.astype(jnp.int32),
            gait=gait.astype(jnp.int32),
            gait_phase=jnp.zeros((), dtype),
        )

    def _randomize(self, params, rng):
        cfg = self.cfg.dr
        ks = jax.random.split(rng, 4)
        u = lambda k, r, shape=(): jax.random.uniform(
            k, shape, minval=r[0], maxval=r[1]
        )
        params = dict(params)
        params["geom_friction"] = params["geom_friction"] * u(ks[0], cfg.friction_range)
        params["body_mass"] = params["body_mass"] * u(ks[1], cfg.mass_range)
        params["body_inertia"] = params["body_inertia"] * u(ks[1], cfg.mass_range)
        params["actuator_kp"] = params["actuator_kp"] * u(ks[2], cfg.kp_range)
        params["dof_damping"] = params["dof_damping"] * u(ks[3], cfg.damping_range)
        return params

    # ------------------------------------------------------------------- obs

    def _projected_gravity(self, qpos):
        """Reference formula (go1_mujoco_env.py:596-608): gravity projected
        onto the *euler angle vector* then normalized — a quirk replicated
        verbatim for obs/reward parity."""
        w, x, y, z = qpos[3], qpos[4], qpos[5], qpos[6]
        roll, pitch, yaw = euler_from_quat(qpos[3:7])
        euler = jnp.stack([roll, pitch, yaw])
        g = jnp.asarray(self.gravity_vec, qpos.dtype)
        pg = jnp.dot(g, euler) * euler
        n = jnp.linalg.norm(pg)
        return jnp.where(n == 0, pg, pg / jnp.where(n == 0, 1.0, n))

    def obs(self, state: EnvState) -> jax.Array:
        """48-dim observation (go1_mujoco_env.py:915-947)."""
        cfg = self.cfg
        qpos, qvel = state.qpos, state.qvel
        dof_pos = qpos[7:] - jnp.asarray(self.key_qpos[7:], qpos.dtype)
        o = jnp.concatenate(
            [
                qvel[:3] * cfg.obs_scale_lin_vel,
                qvel[3:6] * cfg.obs_scale_ang_vel,
                self._projected_gravity(qpos),
                state.desired_vel * cfg.obs_scale_lin_vel,
                dof_pos * cfg.obs_scale_dof_pos,
                qvel[6:] * cfg.obs_scale_dof_vel,
                state.last_action,
            ]
        )
        if cfg.gait_conditioning:
            # command-conditioned multi-gait (BASELINE.json config 5):
            # gait one-hot + the shared gait clock as sin/cos -> 53 dims
            ph = 2.0 * jnp.pi * state.gait_phase
            o = jnp.concatenate(
                [
                    o,
                    (state.gait == jnp.arange(3)).astype(o.dtype),
                    jnp.sin(ph)[None].astype(o.dtype),
                    jnp.cos(ph)[None].astype(o.dtype),
                ]
            )
        return jnp.clip(o, -cfg.clip_obs, cfg.clip_obs)

    # ----------------------------------------------------------------- health

    def _health(self, qpos, qvel):
        """(is_healthy, reason) — go1_mujoco_env.py:433-471 semantics:
        'roll'/'pitch' are quaternion x/y components (state_vector[4:6])."""
        cfg = self.cfg
        state_vec = jnp.concatenate([qpos, qvel])
        finite = jnp.all(jnp.isfinite(state_vec))
        z_ok = (cfg.healthy_z[0] <= qpos[2]) & (qpos[2] <= cfg.healthy_z[1])
        roll_ok = (cfg.healthy_roll[0] <= qpos[4]) & (qpos[4] <= cfg.healthy_roll[1])
        pitch_ok = (cfg.healthy_pitch[0] <= qpos[5]) & (qpos[5] <= cfg.healthy_pitch[1])
        healthy = finite & z_ok & roll_ok & pitch_ok
        reason = jnp.where(
            ~finite, TERM_NOT_FINITE,
            jnp.where(~z_ok, TERM_Z,
                      jnp.where(~roll_ok, TERM_ROLL,
                                jnp.where(~pitch_ok, TERM_PITCH, TERM_NOT))),
        )
        return healthy, reason

    def _health_deviation(self, qpos):
        """Deviation from healthy ranges (go1_mujoco_env.py:544-564)."""
        cfg = self.cfg
        def dev(v, lo, hi):
            inside = (lo <= v) & (v <= hi)
            d = jnp.minimum(jnp.abs(v - lo), jnp.abs(v - hi))
            return jnp.where(inside, 0.0, d)
        return jnp.stack(
            [
                dev(qpos[2], *cfg.healthy_z),
                dev(qpos[4], *cfg.healthy_roll),
                dev(qpos[5], *cfg.healthy_pitch),
            ]
        )

    # ------------------------------------------------------------------- step

    def step(self, state: EnvState, action: jax.Array):
        """One control step = frame_skip physics substeps + obs/reward/term.

        Returns (new_state, obs, reward, terminated, truncated, info).
        """
        cfg = self.cfg
        dtype = state.qpos.dtype
        steps = state.steps + 1

        # biped: front feet touched check BEFORE sim, from previous-step
        # contact forces (go1_mujoco_env.py:476-479)
        front_touched = state.front_feet_touched
        if cfg.biped:
            front_touched = front_touched | jnp.any(
                state.last_feet_forces[:2] > 1.0
            )

        # actuator-latency DR: the physics sees the action from `latency`
        # control steps ago (BASELINE.json config 3); latency 0 = passthrough
        if cfg.dr.max_latency_steps > 0:
            action_buf = jnp.roll(state.action_buf, 1, axis=0)
            action_buf = action_buf.at[0].set(action.astype(dtype))
            applied = action_buf[state.latency]
        else:
            action_buf = state.action_buf
            applied = action.astype(dtype)

        # action_mode="centered": ctrl re-based at the home keyframe (see
        # config.py) — the transform sits between the policy and the
        # actuators only; reward/obs/last_action all still see the policy
        # action, and actuation clamps ctrl to ctrlrange downstream
        if cfg.action_mode == "centered":
            ctrl = (
                jnp.asarray(self.default_joint_position, dtype)
                + cfg.action_scale * applied
            )
        else:
            ctrl = applied

        qpos, qvel, data = step_n(
            self.pipeline, state.params, state.qpos, state.qvel,
            ctrl, cfg.frame_skip, warmstart=state.qacc_warm,
        )

        healthy, reason = self._health(qpos, qvel)

        feet_forces = jnp.linalg.norm(data.cfrc_ext[jnp.asarray(FEET_BODIES)], axis=1)

        reward, reward_info, new_feet_air, new_contacts, new_dev = self._reward(
            state, action.astype(dtype), qpos, qvel, data, healthy, feet_forces
        )

        time_unhealthy = jnp.where(
            healthy, 0.0, state.time_unhealthy + cfg.dt
        ).astype(dtype)
        # Non-finite state terminates IMMEDIATELY (not via the 15s unhealthy
        # timer): MuJoCo's mj_step auto-resets mjData on mjWARN_BADQACC, so
        # the reference never carries NaN state across steps either
        # (go1_mujoco_env.py:438-440 merely marks state_not_finite
        # unhealthy because libmujoco already guarantees finiteness).  A
        # NaN state left in a batched rollout poisons every reduction
        # (batch reward means, PPO gradients), so it must leave the batch
        # at once; reward/obs from such a step are zeroed.
        finite = jnp.isfinite(qpos).all() & jnp.isfinite(qvel).all()
        terminated = (time_unhealthy > cfg.max_unhealthy_time) | ~finite
        truncated = steps >= cfg.max_episode_steps

        bipedal_success = (
            truncated & ~front_touched if cfg.biped
            else jnp.zeros((), bool)
        )

        info = {
            "x_position": qpos[0],
            "y_position": qpos[1],
            "distance_from_origin": jnp.linalg.norm(qpos[0:2]),
            "termination_reason": jnp.where(
                terminated | ~healthy, reason, TERM_NOT
            ),
            "bipedal_success": bipedal_success,
            # active contact candidates dropped beyond the K solver slots on
            # the last substep — nonzero means contact physics is being
            # silently softened and max_contacts should be raised (ADVICE r1)
            "contact_overflow": data.con_overflow,
            **reward_info,
        }

        gait_phase = jnp.mod(
            state.gait_phase + cfg.dt / cfg.gait_period, 1.0
        ).astype(dtype)

        new_state = dataclasses.replace(
            state,
            qpos=qpos,
            qvel=qvel,
            gait_phase=gait_phase,
            steps=steps,
            time_unhealthy=time_unhealthy,
            feet_air_time=new_feet_air,
            last_contacts=new_contacts,
            last_action=action.astype(dtype),
            last_health_dev=new_dev,
            front_feet_touched=front_touched,
            last_feet_forces=feet_forces,
            qacc_warm=data.qacc,
            action_buf=action_buf,
        )
        # NOTE: obs uses the PREVIOUS action (reference quirk, see module
        # docstring) — so it is computed with state.last_action, not action
        obs_state = dataclasses.replace(new_state, last_action=state.last_action)
        observation = self.obs(obs_state)
        reward = jnp.where(
            finite & jnp.isfinite(reward), reward, jnp.zeros_like(reward)
        )
        observation = jnp.where(finite, observation, jnp.zeros_like(observation))
        return new_state, observation, reward, terminated, truncated, info

    # ------------------------------------------------------------- multi-gait

    # stance sets during the FIRST half of the gait cycle, feet ordered
    # (FR, FL, RR, RL); the other diagonal/pair takes the second half
    _GAIT_STANCE = np.array(
        [
            [1, 0, 0, 1],   # trot: diagonal pairs
            [1, 0, 1, 0],   # pace: lateral pairs (right side first)
            [1, 1, 0, 0],   # bound: front pair then rear pair
        ],
        np.float32,
    )

    def _gait_pattern_reward(self, gait, phase, curr_contact, desired_vel,
                             healthy):
        """Command-conditioned gait shaping (BASELINE.json config 5):
        reward feet whose contact state matches the commanded gait's
        stance/swing template at the shared clock phase.  Gated on a
        non-trivial velocity command and health (standing still should not
        be forced to step)."""
        cfg = self.cfg
        tmpl = jnp.asarray(self._GAIT_STANCE)[gait]          # (4,)
        first_half = phase < 0.5
        expected = jnp.where(first_half, tmpl, 1.0 - tmpl)
        match = (curr_contact.astype(expected.dtype) == expected)
        moving = jnp.linalg.norm(desired_vel[:2]) > 0.1
        r = jnp.mean(match.astype(expected.dtype))
        return jnp.where(
            moving & healthy, r, 0.0
        ) * cfg.gait_reward_weight

    # ----------------------------------------------------------------- reward

    def _reward(self, state, action, qpos, qvel, data, healthy, feet_forces):
        cfg = self.cfg
        dtype = qpos.dtype
        w, c = cfg.rewards, cfg.costs
        pg = self._projected_gravity(qpos)

        # --- positive rewards -------------------------------------------------
        lin_err = jnp.sum(jnp.square(state.desired_vel[:2] - qvel[:2]))
        linear_vel = jnp.exp(-lin_err / cfg.tracking_sigma) * w.linear_vel_tracking
        ang_err = jnp.square(state.desired_vel[2] - qvel[5])
        angular_vel = jnp.exp(-ang_err / cfg.tracking_sigma) * w.angular_vel_tracking
        healthy_r = jnp.where(healthy, 1.0, 0.0) * w.healthy

        # feet air time (go1_mujoco_env.py:634-668); biped: alternation bonus
        curr_contact = feet_forces > 1.0
        if cfg.biped:
            alternating = curr_contact[2] != curr_contact[3]
            feet_air = jnp.where(alternating, 1.0, 0.0) * w.feet_airtime
            new_feet_air_time = state.feet_air_time
            new_contacts = state.last_contacts
        else:
            contact_filter = curr_contact | state.last_contacts
            new_contacts = curr_contact
            first_contact = (state.feet_air_time > 0.0) * contact_filter
            air = state.feet_air_time + cfg.dt
            over = jnp.clip(air - 0.2, min=0.0)
            feet_air = jnp.sum(jnp.square(over) * first_contact)
            feet_air = feet_air * (
                jnp.linalg.norm(state.desired_vel[:2]) > 0.1
            )
            feet_air = feet_air * w.feet_airtime
            if cfg.feet_airtime_bootstrap:
                # anti-standing lever (config.py): linear payment per
                # touchdown with >= 0.1 s of airtime — reachable by
                # exploration where the reference's quadratic-above-0.2s
                # payout is not.  Train-time only; eval env zeroes it.
                qualifying = first_contact * (air >= 0.1)
                feet_air = feet_air + (
                    jnp.sum(qualifying)
                    * (jnp.linalg.norm(state.desired_vel[:2]) > 0.1)
                    * jnp.where(healthy, 1.0, 0.0)
                    * cfg.feet_airtime_bootstrap
                )
            new_feet_air_time = air * ~contact_filter

        # recovery (go1_mujoco_env.py:535-580)
        dev = self._health_deviation(qpos)
        improvement = jnp.sum(state.last_health_dev - dev)
        recovery = jnp.where(healthy, 0.0, improvement) * w.recovery
        new_dev = jnp.where(healthy, jnp.zeros(3, dtype), dev)

        # get up (go1_mujoco_env.py:220-243): pre-integration trunk height
        trunk_z = data.kin.xpos[TRUNK, 2]
        height_r = jnp.clip(trunk_z / cfg.healthy_z[0], 0.0, 1.0)
        orient_good = 1.0 - jnp.sum(jnp.square(pg[:2]))
        get_up = jnp.where(healthy, 0.0, 1.5 * height_r + 0.5 * orient_good)
        get_up = get_up * w.get_up

        rewards = linear_vel + angular_vel + healthy_r + feet_air + recovery + get_up

        if cfg.gait_conditioning and not cfg.biped:
            gait_r = self._gait_pattern_reward(
                state.gait, state.gait_phase, curr_contact,
                state.desired_vel, healthy,
            )
            rewards = rewards + gait_r

        # --- costs ------------------------------------------------------------
        unhealthy_scale = jnp.where(healthy, 1.0, 0.1)
        torque = jnp.sum(jnp.square(data.qfrc_actuator[-12:]))
        ctrl_cost = torque * unhealthy_scale * c.torque
        action_rate = jnp.sum(jnp.square(state.last_action - action))
        action_rate_cost = action_rate * unhealthy_scale * c.action_rate
        vertical = jnp.square(qvel[2]) * c.vertical_vel
        xy_ang = jnp.sum(jnp.square(qvel[3:5])) * c.xy_angular_vel
        soft = jnp.asarray(self.soft_joint_range, dtype)
        out_of_range = jnp.clip(soft[:, 0] - qpos[7:], min=0.0) + jnp.clip(
            qpos[7:] - soft[:, 1], min=0.0
        )
        joint_limit = jnp.sum(out_of_range) * c.joint_limit
        joint_vel = jnp.sum(jnp.square(qvel[6:])) * c.joint_velocity
        # accel cost: "dynamic" is the reference formula
        # (go1_mujoco_env.py:736-751); "plain"/"off" are documented
        # train-time shaping deviations (see config.py) — the dynamic
        # denominator |qvel|+1e-6 makes the cost explode at rest, which is
        # half of why the reference's current objective can't bootstrap
        if cfg.accel_cost_mode == "plain":
            joint_accel = (
                jnp.sum(jnp.square(data.qacc[6:]))
                * unhealthy_scale * c.joint_acceleration_plain
            )
        elif cfg.accel_cost_mode == "off":
            joint_accel = jnp.zeros((), dtype)
        else:
            accel = jnp.sum(
                jnp.square(data.qacc[6:]) / (jnp.abs(qvel[6:]) + 1e-6)
            )
            joint_accel = accel * unhealthy_scale * c.joint_acceleration
        # collision: Frobenius norm over the 8 contact bodies -> indicator
        coll = (
            jnp.linalg.norm(data.cfrc_ext[jnp.asarray(CONTACT_BODIES)]) > 0.1
        ).astype(dtype) * c.collision
        unhealthy_cost = jnp.where(healthy, 0.0, 1.0) * c.unhealthy_state

        # anti-standing lever (c), config.py: dense pressure to follow a
        # motion command.  0-weight by default (reference has no such
        # term); eval env keeps it 0.  Trigger per stand_still_mode:
        #   contact  — all four feet in stance (r4; dodgeable by stepping
        #              in place, which the 60M flagship learned to do)
        #   velocity — commanded-direction speed < 30% of the command:
        #              only actual commanded translation escapes
        moving_cmd = jnp.linalg.norm(state.desired_vel[:2]) > 0.1
        if cfg.stand_still_mode == "velocity":
            cmd_norm = jnp.maximum(
                jnp.linalg.norm(state.desired_vel[:2]), 1e-6
            )
            proj = jnp.dot(qvel[:2], state.desired_vel[:2]) / cmd_norm
            ss_trigger = moving_cmd & healthy & (proj < 0.3 * cmd_norm)
        else:
            ss_trigger = moving_cmd & healthy & jnp.all(curr_contact)
        stand_still = (
            jnp.where(ss_trigger, 1.0, 0.0) * cfg.stand_still_cost
        )

        costs = (
            ctrl_cost + action_rate_cost + vertical + xy_ang + joint_limit
            + joint_vel + joint_accel + coll + unhealthy_cost + stand_still
        )

        # full per-channel decomposition: a superset of the reference's
        # reward_info (go1_mujoco_env.py:860-867 emits only 6 keys) — the
        # extra channels power the launch preflight
        # (tools/preflight_signal.py), the dead-signal diagnosis
        # (learn/runner.py) and eval channel metrics; costs are negative,
        # matching the reference's sign convention
        reward_info = {
            **(
                {"gait_pattern_reward": gait_r}
                if (cfg.gait_conditioning and not cfg.biped) else {}
            ),
            "linear_vel_tracking_reward": linear_vel,
            "reward_ctrl": -ctrl_cost,
            "reward_survive": healthy_r,
            "recovery_reward": recovery,
            "get_up_reward": get_up,
            "unhealthy_state_cost": -unhealthy_cost,
            "angular_vel_tracking_reward": angular_vel,
            "feet_airtime_reward": feet_air,
            "action_rate_cost": -action_rate_cost,
            "vertical_vel_cost": -vertical,
            "xy_angular_vel_cost": -xy_ang,
            "joint_limit_cost": -joint_limit,
            "joint_velocity_cost": -joint_vel,
            "joint_acceleration_cost": -joint_accel,
            "collision_cost": -coll,
            **(
                {"stand_still_cost": -stand_still}
                if cfg.stand_still_cost else {}
            ),
        }

        if cfg.biped:
            bw = cfg.biped_weights
            kin = data.kin
            trunk_fwd = kin.xmat[TRUNK][:, 0]
            upright = jnp.clip(trunk_fwd[2], min=0.0) * bw.upright
            front_forces = feet_forces[:2]
            if cfg.biped_contact_mode == "indicator":
                # bounded train-time form (see config.py): count of
                # loaded front feet instead of force-squared
                front_contact = jnp.sum(
                    (front_forces > 1.0).astype(dtype)
                ) * (bw.front_contact / 10.0)
            else:
                front_contact = (
                    jnp.sum(jnp.square(front_forces)) * bw.front_contact
                )
            rear_airborne = jnp.where(
                jnp.all(feet_forces[2:] < 1.0), bw.rear_feet_airborne, 0.0
            )
            feet_z = kin.site_xpos[jnp.asarray(self.front_feet_sites), 2]
            knees_z = kin.xpos[jnp.asarray(self.front_knee_bodies), 2]
            front_foot_height = jnp.sum(
                jnp.clip(knees_z - feet_z, min=0.0)
            ) * bw.front_foot_height
            rear_hips = kin.xpos[jnp.asarray(self.rear_hip_bodies)]
            crossed = jnp.clip(rear_hips[0, 1] - rear_hips[1, 1], min=0.0) * bw.crossed_legs
            low_hips = jnp.sum(
                jnp.clip(0.2 - rear_hips[:, 2], min=0.0)
            ) * 10.0 * bw.low_rear_hips
            front_hips_z = kin.xpos[jnp.asarray(self.front_hip_bodies), 2]
            below_hips = jnp.sum(
                jnp.square(jnp.clip(front_hips_z - feet_z, min=0.0))
            ) * bw.front_feet_below_hips
            abduction = jnp.sum(
                jnp.square(qpos[7:][jnp.asarray([0, 3, 6, 9])])
            ) * bw.abduction_joints
            unwanted_norms = jnp.linalg.norm(
                data.cfrc_ext[jnp.asarray(self.unwanted_contact_bodies)],
                axis=1,
            )
            if cfg.biped_contact_mode == "indicator":
                unwanted = jnp.sum(
                    (unwanted_norms > 1.0).astype(dtype)
                ) * (bw.unwanted_contact / 10.0)
            else:
                unwanted = (
                    jnp.sum(jnp.square(unwanted_norms)) * bw.unwanted_contact
                )
            self_mask = jnp.asarray(self.self_collision_mask)
            if data.con_sel is not None:
                self_mask = self_mask[data.con_sel]
            selfc = jnp.sum(
                data.con_active & self_mask
            ).astype(dtype) * bw.self_collision

            rewards = rewards + upright
            costs = (
                costs + front_contact + rear_airborne + front_foot_height
                + crossed + low_hips + below_hips + abduction + unwanted + selfc
            )
            reward_info.update(
                biped_upright_reward=upright,
                biped_front_contact_cost=-front_contact,
                biped_rear_feet_airborne_cost=-rear_airborne,
                biped_front_foot_height_cost=-front_foot_height,
                biped_crossed_legs_cost=-crossed,
                biped_low_rear_hips_cost=-low_hips,
                biped_front_feet_below_hips_cost=-below_hips,
                biped_abduction_joints_cost=-abduction,
                biped_unwanted_contact_cost=-unwanted,
                self_collision_cost=-selfc,
            )
        else:
            orientation = jnp.sum(jnp.square(pg[:2])) * c.orientation
            default_pos = jnp.sum(
                jnp.square(qpos[7:] - jnp.asarray(self.default_joint_position, dtype))
            ) * c.default_joint_position
            costs = costs + orientation + default_pos
            reward_info.update(
                orientation_cost=-orientation,
                default_joint_position_cost=-default_pos,
            )

        raw = rewards - costs
        # reference floor (go1_mujoco_env.py:911); reward_floor=False is
        # the train-time shaping deviation that keeps gradient alive when
        # costs dominate (the floored objective is flat there)
        reward = jnp.maximum(0.0, raw) if cfg.reward_floor else raw
        reward_info["reward_raw"] = raw
        return reward, reward_info, new_feet_air_time, new_contacts, new_dev

    # -------------------------------------------------------------- autoreset

    def step_autoreset(self, state: EnvState, action: jax.Array):
        """step + reset-on-done, fully on-device (replaces SubprocVecEnv
        autoreset, reference C15).  The returned obs on reset steps is the
        fresh post-reset observation, matching VecEnv semantics."""
        new_state, obs, reward, terminated, truncated, info = self.step(
            state, action
        )
        done = terminated | truncated
        info["terminal_observation"] = obs
        rng, reset_rng = jax.random.split(new_state.rng)
        new_state = dataclasses.replace(new_state, rng=rng)
        fresh = self.reset(
            reset_rng, params=state.params, rand_power=state.rand_power
        )
        picked = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(done, (1,) * a.ndim) if a.ndim else done, a, b
            ),
            fresh,
            new_state,
        )
        obs = jnp.where(done, self.obs(picked), obs)
        return picked, obs, reward, terminated, truncated, info
