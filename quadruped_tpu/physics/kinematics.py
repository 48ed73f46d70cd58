"""Forward kinematics and velocity kinematics.

All spatial quantities use "absolute" Plücker coordinates: world axes, with
moments referenced at a point `ref` near the robot (the root body's origin).
In these coordinates composite inertias simply add, Jacobian rows are dot
products, and no per-joint 6x6 transforms are needed — the whole pipeline is
a short, static unroll over the 14-body tree that XLA fuses and vmaps over
thousands of envs.

Replaces MuJoCo's mj_kinematics/mj_comPos/mj_comVel (reference dependency
C13; fields consumed by the env: xpos, xmat, site_xpos — see
go1_mujoco_env.py:234,322,360,384).

Conventions (oracle-verified): free joint qvel = (world linear, body-frame
angular); hinge axis/anchor fixed in the child body frame.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..mjcf.model import JNT_FREE, JNT_HINGE, PhysicsModel
from .math import quat_mul, quat_normalize, quat_rotate, quat_to_mat


@flax.struct.dataclass
class Kin:
    """Per-state kinematic cache (single env; vmap for batches)."""

    xpos: jax.Array        # (nbody, 3) body frame origins, world
    xquat: jax.Array       # (nbody, 4)
    xmat: jax.Array        # (nbody, 3, 3)
    xipos: jax.Array       # (nbody, 3) body CoM, world
    ximat: jax.Array       # (nbody, 3, 3) inertial frame axes, world
    geom_xpos: jax.Array   # (ngeom, 3)
    geom_xmat: jax.Array   # (ngeom, 3, 3)
    site_xpos: jax.Array   # (nsite, 3)
    ref: jax.Array         # (3,) reference point for all Plücker moments
    cdof: jax.Array        # (nv, 6) dof motion vectors [omega; v_ref]
    cvel: jax.Array        # (nbody, 6) body spatial velocity [omega; v_ref]


def fk(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array) -> Kin:
    dtype = qpos.dtype

    def const(x):
        return jnp.asarray(x, dtype=dtype)

    xpos = [jnp.zeros(3, dtype)]
    xquat = [const([1.0, 0, 0, 0])]

    # ---- positions ----------------------------------------------------------
    for i in range(1, m.nbody):
        p = int(m.body_parentid[i])
        xq = quat_mul(xquat[p], const(m.body_quat[i]))
        xp = xpos[p] + quat_rotate(xquat[p], const(m.body_pos[i]))
        for j in range(int(m.body_jntadr[i]), int(m.body_jntadr[i]) + int(m.body_jntnum[i])):
            adr = int(m.jnt_qposadr[j])
            if m.jnt_type[j] == JNT_FREE:
                xp = qpos[adr : adr + 3]
                xq = quat_normalize(qpos[adr + 3 : adr + 7])
            elif m.jnt_type[j] == JNT_HINGE:
                theta = qpos[adr]
                axis = const(m.jnt_axis[j])
                half = 0.5 * theta
                qj = jnp.concatenate(
                    [jnp.cos(half)[None], axis * jnp.sin(half)]
                )
                anchor = xp + quat_rotate(xq, const(m.jnt_pos[j]))
                xq = quat_mul(xq, qj)
                xp = anchor - quat_rotate(xq, const(m.jnt_pos[j]))
            else:
                raise NotImplementedError("joint type")
        xpos.append(xp)
        xquat.append(xq)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = quat_to_mat(xquat)

    xipos = xpos + jax.vmap(quat_rotate)(xquat, const(m.body_ipos))
    ximat = xmat @ quat_to_mat(const(m.body_iquat))

    geom_xpos = xpos[m.geom_bodyid] + jax.vmap(quat_rotate)(
        xquat[m.geom_bodyid], const(m.geom_pos)
    )
    geom_xmat = quat_to_mat(
        jax.vmap(quat_mul)(xquat[m.geom_bodyid], const(m.geom_quat))
    )
    if m.nsite:
        site_xpos = xpos[m.site_bodyid] + jax.vmap(quat_rotate)(
            xquat[m.site_bodyid], const(m.site_pos)
        )
    else:
        site_xpos = jnp.zeros((0, 3), dtype)

    # reference point for Plücker moments: first root body origin (trunk)
    ref = xpos[1] if m.nbody > 1 else jnp.zeros(3, dtype)

    # ---- dof motion vectors -------------------------------------------------
    cdof = [None] * m.nv
    for j in range(m.njnt):
        b = int(m.jnt_bodyid[j])
        dadr = int(m.jnt_dofadr[j])
        if m.jnt_type[j] == JNT_FREE:
            zero = jnp.zeros(3, dtype)
            for k in range(3):  # world-frame translations
                e = const(np.eye(3)[k])
                cdof[dadr + k] = jnp.concatenate([zero, e])
            R = xmat[b]
            arm = ref - xpos[b]
            for k in range(3):  # body-frame rotations about body origin
                w = R[:, k]
                cdof[dadr + 3 + k] = jnp.concatenate([w, jnp.cross(w, arm)])
        else:  # hinge
            axis_w = xmat[b] @ const(m.jnt_axis[j])
            anchor = xpos[b] + quat_rotate(xquat[b], const(m.jnt_pos[j]))
            cdof[dadr] = jnp.concatenate(
                [axis_w, jnp.cross(axis_w, ref - anchor)]
            )
    cdof = jnp.stack(cdof)

    # ---- body spatial velocities (forward accumulation) --------------------
    cvel = [jnp.zeros(6, dtype)]
    for i in range(1, m.nbody):
        p = int(m.body_parentid[i])
        v = cvel[p]
        dadr, dnum = int(m.body_dofadr[i]), int(m.body_dofnum[i])
        if dnum:
            v = v + cdof[dadr : dadr + dnum].T @ qvel[dadr : dadr + dnum]
        cvel.append(v)
    cvel = jnp.stack(cvel)

    return Kin(
        xpos=xpos,
        xquat=xquat,
        xmat=xmat,
        xipos=xipos,
        ximat=ximat,
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        site_xpos=site_xpos,
        ref=ref,
        cdof=cdof,
        cvel=cvel,
    )


def point_jacobian(m: PhysicsModel, kin: Kin, point: jax.Array, body_id):
    """Translational Jacobian rows (nv, 3) of a world point on `body_id`.

    J[d] = v_d(point) = cdof_v[d] + cdof_w[d] x (point - ref), masked to the
    ancestor dof chain of body_id.  `body_id` is a static python int.
    """
    mask = jnp.asarray(ancestor_dof_mask(m)[body_id], dtype=point.dtype)
    arm = point - kin.ref
    jac = kin.cdof[:, 3:] + jnp.cross(kin.cdof[:, :3], arm[None, :])
    return jac * mask[:, None]


_ANC_CACHE: dict[int, np.ndarray] = {}


def ancestor_dof_mask(m: PhysicsModel) -> np.ndarray:
    """(nbody, nv) bool: dof d affects body b."""
    key = id(m)
    if key not in _ANC_CACHE:
        mask = np.zeros((m.nbody, m.nv), dtype=bool)
        for b in range(1, m.nbody):
            i = b
            while i != 0:
                dadr, dnum = int(m.body_dofadr[i]), int(m.body_dofnum[i])
                if dnum:
                    mask[b, dadr : dadr + dnum] = True
                i = int(m.body_parentid[i])
        _ANC_CACHE[key] = mask
    return _ANC_CACHE[key]


def ancestor_dof_pair_mask(m: PhysicsModel) -> np.ndarray:
    """(nv, nv) bool: dof e is on the ancestor chain of dof d (e affects
    the body carrying d).  Used to assemble the CRBA mass matrix."""
    body_mask = ancestor_dof_mask(m)
    out = np.zeros((m.nv, m.nv), dtype=bool)
    for d in range(m.nv):
        b = int(m.dof_bodyid[d])
        out[:, d] = body_mask[b]
    # count each unordered pair once (dof order is topological, so an
    # ancestor dof always has the lower index; same-joint pairs would
    # otherwise be double-counted by the W + W^T symmetrization in crba)
    return np.triu(out)
