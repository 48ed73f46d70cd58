"""Smooth (constraint-free) dynamics: CRBA mass matrix, RNEA bias forces,
passive forces and actuation.

Everything is expressed in the absolute Plücker coordinates produced by
`kinematics.fk` (world axes, moments about kin.ref), where composite rigid
body inertias add without transforms.  All tree recursions are flattened
into static-mask matmuls (subtree/ancestor masks), and per-body math is
batched over the whole body axis: the entire smooth pass is ~30 XLA ops —
op-dispatch count, not FLOPs, is the cost model for these small tensors.

Replaces MuJoCo's mj_crb / mj_rne / mj_passive / mj_fwdActuation (reference
dependency C13).  Oracle-tested against mj_fullM, qfrc_bias, qfrc_passive,
qfrc_actuator and qacc in tests/test_smooth.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mjcf.model import ACT_MOTOR, ACT_POSITION, JNT_FREE, PhysicsModel
from .kinematics import Kin, ancestor_dof_pair_mask, tree_levels
from .math import chol_factor, chol_solve, force_cross, motion_cross, skew


def body_inertias(m: PhysicsModel, params, kin: Kin) -> jax.Array:
    """(nbody, 6, 6) spatial inertia of each body about kin.ref, world axes.

    H = [[I_c - m c~ c~,  m c~],
         [-m c~,          m 1 ]]   with c = com - ref.
    """
    dtype = kin.xpos.dtype
    mass = jnp.asarray(params["body_mass"], dtype)
    diag = jnp.asarray(params["body_inertia"], dtype)
    c = kin.xipos - kin.ref
    R = kin.ximat
    Ic = R @ (diag[..., None] * jnp.swapaxes(R, -1, -2))
    cx = skew(c)
    mcx = mass[:, None, None] * cx
    eye = jnp.eye(3, dtype=dtype)
    top = jnp.concatenate([Ic - mcx @ cx, mcx], axis=-1)
    bot = jnp.concatenate([-mcx, mass[:, None, None] * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crba(m: PhysicsModel, params, kin: Kin) -> jax.Array:
    """(nv, nv) joint-space inertia matrix (== mj_fullM + armature)."""
    lv = tree_levels(m)
    H = body_inertias(m, params, kin)
    dtype = H.dtype
    # composite subtree inertias: one static-mask matmul on flattened 6x6
    sub = jnp.asarray(lv.sub_body, dtype)
    Hc = (sub @ H.reshape(m.nbody, 36)).reshape(m.nbody, 6, 6)
    # f_d = Hc[body(d)] @ cdof_d ; M[e,d] = cdof_e . f_d on ancestor pairs
    F = jnp.einsum("dij,dj->di", Hc[m.dof_bodyid], kin.cdof)
    P = kin.cdof @ F.T
    mask = jnp.asarray(ancestor_dof_pair_mask(m))
    W = jnp.where(mask, P, 0.0)
    M = W + W.T - jnp.diag(jnp.diag(W))
    return M + jnp.diag(jnp.asarray(params["dof_armature"], M.dtype))


def rne_bias(m: PhysicsModel, params, kin: Kin, qvel: jax.Array) -> jax.Array:
    """(nv,) bias forces C(q,v)v + G(q)  (== mujoco qfrc_bias).

    RNEA with qacc = 0 and base acceleration -g (gravity trick).  The
    velocity-product acceleration recursion a_i = a_p + v_i x (S qdot)
    telescopes to a_i = a_0 + sum_{ancestors j} bias_j, evaluated as one
    ancestor-mask matmul; free-joint translation axes are world-fixed and
    contribute no bias.
    """
    dtype = qvel.dtype
    lv = tree_levels(m)
    gravity = jnp.asarray(params["gravity"], dtype)
    H = body_inertias(m, params, kin)

    # per-body body-fixed joint velocity (hinges + free rotational dofs)
    svel = jnp.asarray(lv.svel_mask, dtype) @ (kin.cdof * qvel[:, None])
    bias = motion_cross(kin.cvel, svel)                    # (nbody, 6)
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -gravity])
    acc = a0 + jnp.asarray(lv.anc_body, dtype) @ bias      # (nbody, 6)

    # body forces f = H a + v x* (H v); subtree-accumulate; project on dofs
    Hv = jnp.einsum("bij,bj->bi", H, kin.cvel)
    f = jnp.einsum("bij,bj->bi", H, acc) + force_cross(kin.cvel, Hv)
    fs = jnp.asarray(lv.sub_body, dtype) @ f               # (nbody, 6)
    return jnp.einsum("di,di->d", kin.cdof, fs[m.dof_bodyid])


def passive_force(m: PhysicsModel, params, qvel: jax.Array) -> jax.Array:
    """qfrc_passive: joint damping (springs unused by the Go1 models)."""
    return -jnp.asarray(params["dof_damping"], qvel.dtype) * qvel


def actuator_force(
    m: PhysicsModel, params, qpos: jax.Array, qvel: jax.Array, ctrl: jax.Array
) -> jax.Array:
    """qfrc_actuator from clamped ctrl.

    motor:    force = gear * ctrl                       (go1_torque.xml:216-227)
    position: force = clamp(kp*(ctrl - q) - kv*qdot) * gear
                                                        (go1_position.xml servos)
    """
    dtype = qpos.dtype
    lo = jnp.asarray(m.actuator_ctrlrange[:, 0], dtype)
    hi = jnp.asarray(m.actuator_ctrlrange[:, 1], dtype)
    limited = jnp.asarray(m.actuator_ctrllimited)
    c = jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)

    gear = jnp.asarray(params["actuator_gear"], dtype)
    kp = jnp.asarray(params["actuator_kp"], dtype)
    kv = jnp.asarray(m.actuator_kv, dtype)
    qadr = m.jnt_qposadr[m.actuator_trnid]
    dadr = m.jnt_dofadr[m.actuator_trnid]

    motor_f = gear * c
    pos_f = kp * (c - qpos[qadr]) - kv * qvel[dadr]
    flo = jnp.asarray(m.actuator_forcerange[:, 0], dtype)
    fhi = jnp.asarray(m.actuator_forcerange[:, 1], dtype)
    flimited = jnp.asarray(m.actuator_forcelimited)
    pos_f = jnp.where(flimited, jnp.clip(pos_f, flo, fhi), pos_f)
    force = jnp.where(m.actuator_kind == ACT_MOTOR, motor_f, pos_f * gear)

    qfrc = jnp.zeros(m.nv, dtype)
    return qfrc.at[dadr].add(force)


def smooth_dynamics(
    m: PhysicsModel, params, kin: Kin, qpos, qvel, ctrl
):
    """Returns (M, L, qfrc_smooth, qacc_smooth, qfrc_actuator)."""
    M = crba(m, params, kin)
    bias = rne_bias(m, params, kin, qvel)
    qfrc_act = actuator_force(m, params, qpos, qvel, ctrl)
    qfrc_smooth = qfrc_act + passive_force(m, params, qvel) - bias
    # unrolled factor/solve: lapack-style batched cholesky/triangular-solve
    # custom calls are very slow vmapped on TPU (see math.chol_factor)
    L = chol_factor(M)
    qacc_smooth = chol_solve(L, qfrc_smooth)
    return M, L, qfrc_smooth, qacc_smooth, qfrc_act


# ---------------------------------------------------------------------------
# batch-LAST smooth dispatch (shared rule: physics/dispatch.py)
# ---------------------------------------------------------------------------

import weakref as _weakref

from .dispatch import batch_last, blast_enabled

_SMOOTH_CORE: "_weakref.WeakKeyDictionary[PhysicsModel, object]" = (
    _weakref.WeakKeyDictionary()
)


def smooth_dynamics_auto(m, params, kin, qpos, qvel, ctrl):
    """smooth_dynamics with the env batch on the TPU lane axis under vmap
    (CRBA/RNEA/actuation carry tiny trailing dims otherwise).
    QTPU_SMOOTH_BLAST: 1 on, 0 off; default on for TPU/GPU, off on CPU."""
    if not blast_enabled("QTPU_SMOOTH_BLAST"):
        return smooth_dynamics(m, params, kin, qpos, qvel, ctrl)
    core = _SMOOTH_CORE.get(m)
    if core is None:
        core = batch_last(
            lambda p, k, q, v, c: smooth_dynamics(m, p, k, q, v, c)
        )
        _SMOOTH_CORE[m] = core
    return core(params, kin, qpos, qvel, ctrl)
