"""Rough-terrain physics vs a MuJoCo heightfield oracle (VERDICT r1 #10).

The TPU terrain model collides plane-group candidates against the LOCAL
TANGENT PLANE of a smooth procedural field (physics/terrain.py).  MuJoCo
has no such primitive; its oracle is an `hfield` geom — the same field
sampled on a fine grid (1.6 cm spacing, much finer than the foot sphere
r=0.022 m), with the floor plane's contact parameters.  This bounds the
tangent-plane approximation end-to-end: drop the robot (passive, zero
torque) onto identical rough ground in both engines and require it to
settle at the same place, height, and posture.

Error sources bounded together: tangent-plane vs true curved surface
(curvature radius ~ wavelength²/amplitude ≈ 25 m at the defaults, vs
2.2 cm foot spheres), MuJoCo's piecewise-linear prism collision vs the
smooth field, and f32-vs-f64 solver drift.  The settle comparison is the
behavioral bound the env actually relies on; exact per-substep parity is
pinned separately for the flat plane (tests/test_env.py).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from quadruped_tpu.assets import go1_xml
from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from quadruped_tpu.physics import terrain as T
from quadruped_tpu.physics.forward import step_n

AMP = 0.04      # config defaults (Go1Config.terrain_amplitude/wavelength)
WAVELEN = 1.0
HALF = 4.0      # hfield half-extent (m)
NGRID = 512     # 1.6 cm grid spacing


def _mj_hfield_model(tp):
    """MuJoCo model: our physics XML with the floor plane replaced by an
    hfield sampled from the same terrain draw."""
    xml = go1_xml("torque")
    zmax = 2.0 * AMP + 1e-4
    asset = (
        f'<asset><hfield name="terrain" nrow="{NGRID}" ncol="{NGRID}" '
        f'size="{HALF} {HALF} {zmax} 0.1" /></asset>'
    )
    xml = xml.replace("<worldbody>", asset + "<worldbody>", 1)
    # same contact attributes as the plane it replaces; shifted down so the
    # [0, zmax] hfield data maps onto field heights [-AMP, AMP]
    xml = xml.replace(
        '<geom type="plane" pos="0 0 0"',
        f'<geom type="hfield" hfield="terrain" pos="0 0 {-AMP - 1e-4}"',
    )
    mj = mujoco.MjModel.from_xml_string(xml)

    xs = np.linspace(-HALF, HALF, NGRID)
    xx, yy = np.meshgrid(xs, xs, indexing="xy")   # rows vary in y
    xy = jnp.asarray(np.stack([xx, yy], -1), jnp.float32)
    h, _n = T.height_normal(tp, xy.reshape(-1, 2))
    h = np.asarray(h, np.float64).reshape(NGRID, NGRID)
    mj.hfield_data[:] = ((h + AMP) / zmax).reshape(-1)
    return mj


def test_settle_on_rough_ground_matches_hfield_oracle():
    env = Go1Env(
        Go1Config(ctrl_type="torque", terrain="rough",
                  terrain_amplitude=AMP, terrain_wavelength=WAVELEN,
                  fallen_start_prob=0.0)
    )
    state = env.reset(jax.random.PRNGKey(7))
    tp = {k: state.params[k] for k in T.TERRAIN_KEYS}

    # identical start: keyframe pose dropped from 2 cm above local ground
    qpos0 = np.asarray(env.key_qpos, np.float64).copy()
    h0, _ = T.height_normal(tp, jnp.asarray(qpos0[:2], jnp.float32))
    qpos0[2] = float(h0) + qpos0[2] + 0.02

    n_ctrl, n_sub = 40, 10   # 0.8 s — settled well before this

    # --- TPU-native side (tangent-plane terrain) ---------------------------
    params = dict(state.params)
    q = jnp.asarray(qpos0, state.qpos.dtype)
    v = jnp.zeros_like(state.qvel)
    a = jnp.zeros(12, q.dtype)
    stepj = jax.jit(
        lambda qq, vv: step_n(env.pipeline, params, qq, vv, a, n_sub)
    )
    for _ in range(n_ctrl):
        q, v, _d = stepj(q, v)
    q_ours = np.asarray(q, np.float64)

    # --- MuJoCo hfield oracle ----------------------------------------------
    mj = _mj_hfield_model(tp)
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos0
    d.qvel[:] = 0.0
    d.ctrl[:] = 0.0
    for _ in range(n_ctrl * n_sub):
        mujoco.mj_step(mj, d)
    q_mj = d.qpos.copy()

    # both settled (finite, resting near the ground)
    assert np.isfinite(q_ours).all() and np.isfinite(q_mj).all()

    # trunk height above the LOCAL field at each engine's own xy
    def clearance(qp):
        h, _ = T.height_normal(tp, jnp.asarray(qp[:2], jnp.float32))
        return float(qp[2]) - float(h)

    c_ours, c_mj = clearance(q_ours), clearance(q_mj)
    # tangent-plane error bound: settle height within 1 cm of the oracle
    assert abs(c_ours - c_mj) < 0.01, (c_ours, c_mj)
    # neither slid away: same resting spot within 5 cm
    assert np.linalg.norm(q_ours[:2] - q_mj[:2]) < 0.05
    # same posture: joint angles within 0.1 rad
    assert np.max(np.abs(q_ours[7:] - q_mj[7:])) < 0.1
    # similar orientation (quaternion dot)
    qd = abs(float(np.dot(q_ours[3:7], q_mj[3:7])))
    assert qd > 0.999, qd


def test_foot_gap_matches_smooth_field():
    """Static narrowphase bound: for foot spheres placed over the field,
    the tangent-plane gap equals the true smooth-field distance to within
    (r + |h|) * O(curvature) — at the defaults < 0.5 mm."""
    tp = T.sample_terrain_params(
        jax.random.PRNGKey(11), amplitude=AMP, wavelength=WAVELEN
    )
    rng = np.random.default_rng(4)
    centers = np.column_stack(
        [rng.uniform(-2, 2, 256), rng.uniform(-2, 2, 256),
         rng.uniform(0.0, 0.15, 256)]
    ).astype(np.float32)
    r = 0.022  # foot sphere radius

    ppos, n = T.local_plane(tp, jnp.asarray(centers))
    gap_plane = (
        jnp.einsum("bi,bi->b", jnp.asarray(centers) - ppos, n) - r
    )

    # true distance to the smooth surface: nearest point found by local
    # projection iteration (the surface is C-inf and low-curvature)
    def true_gap(c):
        xy = c[:2]
        for _ in range(20):
            h, nn = T.height_normal(tp, jnp.asarray(xy, jnp.float32))
            p = np.array([xy[0], xy[1], float(h)])
            # project the center onto the tangent plane at the current
            # estimate; its xy is the next footpoint estimate
            delta = c - p
            step = delta - np.asarray(nn) * float(np.dot(delta, np.asarray(nn)))
            xy = xy + 0.8 * step[:2]
        h, nn = T.height_normal(tp, jnp.asarray(xy, jnp.float32))
        p = np.array([xy[0], xy[1], float(h)])
        return float(np.linalg.norm(c - p)) * np.sign(
            float(np.dot(c - p, np.asarray(nn)))
        ) - r

    idx = rng.choice(256, 48, replace=False)
    errs = [
        abs(float(gap_plane[i]) - true_gap(centers[i].astype(np.float64)))
        for i in idx
    ]
    assert max(errs) < 5e-4, max(errs)
