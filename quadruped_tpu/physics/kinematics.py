"""Forward kinematics and velocity kinematics (level-synchronous).

All spatial quantities use "absolute" Plücker coordinates: world axes, with
moments referenced at a point `ref` near the robot (the root body's origin).
In these coordinates composite inertias simply add, Jacobian rows are dot
products, and no per-joint 6x6 transforms are needed.

TPU-first structure: bodies are processed level-by-level down the tree
(Go1: trunk -> 4 hips -> 4 thighs -> 4 calves), with each level's quaternion
math batched across its bodies, and all tree accumulations (cvel) expressed
as one static-mask matmul.  This keeps the op count per step small — the
dominant cost model on TPU for this workload is op dispatch, not FLOPs.

Replaces MuJoCo's mj_kinematics/mj_comPos/mj_comVel (reference dependency
C13; fields consumed by the env: xpos, xmat, site_xpos — see
go1_mujoco_env.py:234,322,360,384).

Conventions (oracle-verified): free joint qvel = (world linear, body-frame
angular); hinge axis/anchor fixed in the child body frame.
"""

from __future__ import annotations

import dataclasses

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


@dataclasses.dataclass(eq=False)
class _Levels:
    """Static tree schedule: bodies grouped by depth, joints by type."""

    levels: list  # list of dicts with numpy index arrays
    hinge_jnt: np.ndarray      # all hinge joint ids (model order)
    hinge_body: np.ndarray
    hinge_dof: np.ndarray
    hinge_qadr: np.ndarray
    free_jnt: np.ndarray
    # velocity-bias dof mask: dofs whose motion vector is body-fixed
    # (hinges + free rotational); free translations are world-fixed
    svel_mask: np.ndarray      # (nbody, nv)
    anc_body: np.ndarray       # (nbody, nbody) ancestor-or-self (excl world)
    sub_body: np.ndarray       # (nbody, nbody) subtree: sub[b,d]=1 if d in subtree(b)


import weakref

# WeakKeyDictionary on the live model, not id(m): id reuse after GC would
# serve a stale closure (same fix as the five sibling caches, ADVICE r1)
_LVL_CACHE: "weakref.WeakKeyDictionary[PhysicsModel, _Levels]" = (
    weakref.WeakKeyDictionary()
)


def tree_levels(m: PhysicsModel) -> _Levels:
    if m in _LVL_CACHE:
        return _LVL_CACHE[m]
    depth = np.zeros(m.nbody, dtype=int)
    for i in range(1, m.nbody):
        depth[i] = depth[m.body_parentid[i]] + 1
    levels = []
    for d in range(1, depth.max() + 1):
        ids = np.where(depth == d)[0]
        jnt = np.full(len(ids), -1)
        for k, b in enumerate(ids):
            assert m.body_jntnum[b] <= 1, "fast path supports <=1 joint/body"
            if m.body_jntnum[b] == 1:
                jnt[k] = m.body_jntadr[b]
        hinge = np.array([k for k in range(len(ids)) if jnt[k] >= 0
                          and m.jnt_type[jnt[k]] == JNT_HINGE])
        free = np.array([k for k in range(len(ids)) if jnt[k] >= 0
                         and m.jnt_type[jnt[k]] == JNT_FREE])
        levels.append(
            dict(
                ids=ids,
                parents=m.body_parentid[ids].copy(),
                hinge_k=hinge.astype(int),
                free_k=free.astype(int),
                jnt=jnt,
            )
        )

    hinge_jnt = np.where(m.jnt_type == JNT_HINGE)[0]
    free_jnt = np.where(m.jnt_type == JNT_FREE)[0]

    svel_mask = np.zeros((m.nbody, m.nv))
    for j in range(m.njnt):
        b = int(m.jnt_bodyid[j])
        d = int(m.jnt_dofadr[j])
        if m.jnt_type[j] == JNT_HINGE:
            svel_mask[b, d] = 1.0
        else:  # free: rotational dofs only
            svel_mask[b, d + 3 : d + 6] = 1.0

    anc_body = np.zeros((m.nbody, m.nbody))
    for b in range(1, m.nbody):
        i = b
        while i != 0:
            anc_body[b, i] = 1.0
            i = int(m.body_parentid[i])
    sub_body = anc_body.T.copy()  # sub[b, d] = 1 iff b is ancestor-or-self of d

    lv = _Levels(
        levels=levels,
        hinge_jnt=hinge_jnt,
        hinge_body=m.jnt_bodyid[hinge_jnt].copy(),
        hinge_dof=m.jnt_dofadr[hinge_jnt].copy(),
        hinge_qadr=m.jnt_qposadr[hinge_jnt].copy(),
        free_jnt=free_jnt,
        svel_mask=svel_mask,
        anc_body=anc_body,
        sub_body=sub_body,
    )
    _LVL_CACHE[m] = lv
    return lv


def fk(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array) -> Kin:
    dtype = qpos.dtype
    lv = tree_levels(m)

    def const(x):
        return jnp.asarray(x, dtype=dtype)

    nb = m.nbody
    xpos = jnp.zeros((nb, 3), dtype)
    xquat = jnp.zeros((nb, 4), dtype).at[:, 0].set(1.0)

    # ---- positions: one batched pass per tree level -------------------------
    for lev in lv.levels:
        ids = lev["ids"]
        pq = xquat[lev["parents"]]
        pp = xpos[lev["parents"]]
        xq = quat_mul(pq, const(m.body_quat[ids]))
        xp = pp + quat_rotate(pq, const(m.body_pos[ids]))
        if len(lev["free_k"]):
            for k in lev["free_k"]:
                adr = int(m.jnt_qposadr[lev["jnt"][k]])
                xp = xp.at[k].set(qpos[adr : adr + 3])
                xq = xq.at[k].set(quat_normalize(qpos[adr + 3 : adr + 7]))
        hk = lev["hinge_k"]
        if len(hk):
            jids = lev["jnt"][hk]
            theta = qpos[m.jnt_qposadr[jids]]
            axis = const(m.jnt_axis[jids])
            half = 0.5 * theta
            qj = jnp.concatenate(
                [jnp.cos(half)[:, None], axis * jnp.sin(half)[:, None]], axis=1
            )
            jpos = const(m.jnt_pos[jids])
            anchor = xp[hk] + quat_rotate(xq[hk], jpos)
            xq_h = quat_mul(xq[hk], qj)
            xp_h = anchor - quat_rotate(xq_h, jpos)
            xq = xq.at[hk].set(xq_h)
            xp = xp.at[hk].set(xp_h)
        xpos = xpos.at[ids].set(xp)
        xquat = xquat.at[ids].set(xq)

    xmat = quat_to_mat(xquat)
    xipos = xpos + quat_rotate(xquat, const(m.body_ipos))
    ximat = xmat @ quat_to_mat(const(m.body_iquat))
    geom_xpos = xpos[m.geom_bodyid] + quat_rotate(
        xquat[m.geom_bodyid], const(m.geom_pos)
    )
    geom_xmat = quat_to_mat(quat_mul(xquat[m.geom_bodyid], const(m.geom_quat)))
    if m.nsite:
        site_xpos = xpos[m.site_bodyid] + quat_rotate(
            xquat[m.site_bodyid], const(m.site_pos)
        )
    else:
        site_xpos = jnp.zeros((0, 3), dtype)

    # reference point for Plücker moments: first root body origin (trunk)
    ref = xpos[1] if m.nbody > 1 else jnp.zeros(3, dtype)

    # ---- dof motion vectors (all hinges batched; free joints unrolled) ------
    cdof = jnp.zeros((m.nv, 6), dtype)
    if len(lv.hinge_jnt):
        hb = lv.hinge_body
        axis_w = jnp.einsum(
            "jab,jb->ja", xmat[hb], const(m.jnt_axis[lv.hinge_jnt])
        )
        anchor = xpos[hb] + quat_rotate(
            xquat[hb], const(m.jnt_pos[lv.hinge_jnt])
        )
        vref = jnp.cross(axis_w, ref[None, :] - anchor)
        cdof = cdof.at[lv.hinge_dof].set(
            jnp.concatenate([axis_w, vref], axis=1)
        )
    for j in lv.free_jnt:
        b = int(m.jnt_bodyid[j])
        dadr = int(m.jnt_dofadr[j])
        R = xmat[b]
        arm = ref - xpos[b]
        # translations: world axes; rotations: body axes about body origin
        trans = jnp.concatenate([jnp.zeros((3, 3), dtype), jnp.eye(3, dtype=dtype)], axis=1)
        rot = jnp.concatenate([R.T, jnp.cross(R.T, arm[None, :])], axis=1)
        cdof = cdof.at[dadr : dadr + 3].set(trans)
        cdof = cdof.at[dadr + 3 : dadr + 6].set(rot)

    # ---- body spatial velocities: one ancestor-mask matmul ------------------
    cvel = jnp.asarray(ancestor_dof_mask(m), dtype) @ (cdof * qvel[:, None])

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


_ANC_CACHE: "weakref.WeakKeyDictionary[PhysicsModel, np.ndarray]" = (
    weakref.WeakKeyDictionary()
)


def ancestor_dof_mask(m: PhysicsModel) -> np.ndarray:
    """(nbody, nv) bool: dof d affects body b."""
    key = m
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


# ---------------------------------------------------------------------------
# batch-LAST fk dispatch (shared rule: physics/dispatch.py)
# ---------------------------------------------------------------------------

import weakref as _weakref

from .dispatch import batch_last, blast_enabled

# WeakKeyDictionary on the live model, not id(m) (ADVICE r1: id reuse
# after GC would serve a stale closure)
_FK_CORE: "_weakref.WeakKeyDictionary[PhysicsModel, object]" = (
    _weakref.WeakKeyDictionary()
)


def fk_auto(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array) -> Kin:
    """fk with the env batch on the TPU lane axis under vmap (body frames
    carry 3/4-wide trailing dims otherwise).  QTPU_FK_BLAST: 1 forces on,
    0 off; default = on for TPU/GPU, off on CPU."""
    if not blast_enabled("QTPU_FK_BLAST"):
        return fk(m, qpos, qvel)
    core = _FK_CORE.get(m)
    if core is None:
        core = batch_last(lambda q, v: fk(m, q, v))
        _FK_CORE[m] = core
    return core(qpos, qvel)
