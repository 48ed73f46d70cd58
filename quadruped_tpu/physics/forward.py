"""Full physics step: forward dynamics + semi-implicit Euler integration.

Pipeline per substep (all fused under jit, vmapped over envs):
    fk -> smooth dynamics (CRBA/RNEA/actuation) -> narrowphase ->
    constraint assembly -> Newton solve -> implicit-damping Euler.

Equivalent of MuJoCo's mj_step (reference hot loop: 10 substeps per
control step, go1_mujoco_env.py:481 via frame_skip=10).

Integration semantics (oracle-verified): qacc is the explicit solver
output; velocities integrate with implicit joint damping,
    v' = v + h (M + h diag(damping))^{-1} (M qacc),
free-joint quaternions integrate exactly by the body-frame angular
velocity; hinge/translation coordinates are explicit Euler.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..mjcf.model import JNT_FREE, JNT_HINGE, PhysicsModel
from .collision import CollisionTable, build_table
from .constraint import EfcLayout, assemble, assemble_auto, build_layout
from .kinematics import Kin, fk_auto
from .math import chol_factor, chol_solve, quat_integrate
from .smooth import smooth_dynamics_auto
from .solver import solve


@dataclasses.dataclass(eq=False)
class Pipeline:
    """Static compiled pipeline: model + collision table + efc layout.

    Build once per (model, collision mode); hashable by identity so it can
    be a static jit argument.
    """

    m: PhysicsModel
    table: CollisionTable
    layout: EfcLayout

    @staticmethod
    def build(
        m: PhysicsModel, mode: str = "plane", max_contacts: int | None = None,
        contact_pools: dict | None = None,
        defer_cyl_refine: bool | None = None,
    ) -> "Pipeline":
        import os

        table = build_table(m, mode)
        if max_contacts is not None and max_contacts >= table.ncand:
            max_contacts = None
            contact_pools = None
        # deferred cylinder refinement (round-4 perf lever): default ON
        # for pooled layouts — the 10-iteration projection runs on the K
        # selected slots instead of all 247 cylinder candidates; the
        # un-pooled/oracle paths keep refine-everything semantics.
        # QTPU_DEFER_CYL=0/1 overrides for A/B.
        if defer_cyl_refine is None:
            defer_cyl_refine = contact_pools is not None
        env_over = os.environ.get("QTPU_DEFER_CYL")
        if env_over is not None:
            defer_cyl_refine = env_over == "1"
        return Pipeline(
            m=m, table=table,
            layout=build_layout(
                m, table, max_contacts, contact_pools,
                defer_cyl=defer_cyl_refine,
            ),
        )


@dataclasses.dataclass
class StepData:
    """Per-substep outputs consumed by the env layer."""

    kin: Kin
    qacc: jax.Array            # (nv,)
    qfrc_actuator: jax.Array   # (nv,)
    cfrc_ext: jax.Array        # (nbody, 6) (torque, force) at body CoM, world
    con_force: jax.Array       # (ncon, 6) contact-frame forces
    con_dist: jax.Array        # (ncon,)
    con_active: jax.Array      # (ncon,) bool
    con_sel: jax.Array | None  # (ncon,) candidate index per solver slot
    con_overflow: jax.Array    # () i32 active candidates dropped beyond K


jax.tree_util.register_dataclass(
    StepData,
    data_fields=[
        "kin", "qacc", "qfrc_actuator", "cfrc_ext", "con_force", "con_dist",
        "con_active", "con_sel", "con_overflow",
    ],
    meta_fields=[],
)


def forward(
    pl: Pipeline, params: dict[str, Any], qpos: jax.Array, qvel: jax.Array,
    ctrl: jax.Array, warmstart: jax.Array | None = None,
):
    """Forward dynamics at (qpos, qvel, ctrl).  Returns (StepData, M).

    The whole pipeline runs under matmul precision 'highest': TPU f32
    matmuls default to bf16 passes, which destroys the PSD-ness of the
    Newton Hessian (NaN Cholesky) and physics accuracy.  These matmuls are
    tiny (18x18); MXU throughput is irrelevant here.
    """
    with jax.default_matmul_precision("highest"):
        m = pl.m
        kin = fk_auto(m, qpos, qvel)
        M, L, qfrc_smooth, qacc_smooth, qfrc_act = smooth_dynamics_auto(
            m, params, kin, qpos, qvel, ctrl
        )
        # rough-terrain heightfield (physics/terrain.py): present in params
        # whenever the env enables terrain; plane contacts then collide
        # against the local tangent plane of the field
        terrain = (
            {k: params[k] for k in ("terrain_amp", "terrain_freq",
                                    "terrain_phase")}
            if "terrain_amp" in params else None
        )
        efc = assemble_auto(m, pl.layout, pl.table, kin, qpos, qvel,
                            terrain=terrain)
        qacc, qfrc_constraint, con_force = solve(
            m, M, qacc_smooth, efc, warmstart=warmstart
        )
        cfrc = cfrc_ext(pl, params, kin, efc, con_force)
    return (
        StepData(
            kin=kin,
            qacc=qacc,
            qfrc_actuator=qfrc_act,
            cfrc_ext=cfrc,
            con_force=con_force,
            con_dist=efc.con_dist,
            con_active=efc.con_active,
            con_sel=efc.con_sel,
            con_overflow=efc.con_overflow,
        ),
        M,
    )


import weakref

# WeakKeyDictionary on the live Pipeline, not id(pl): see solver._CORE_CACHE
_CFRC_CONST: "weakref.WeakKeyDictionary[Pipeline, tuple]" = (
    weakref.WeakKeyDictionary()
)


def _cfrc_consts(pl: Pipeline):
    """Static one-hot accumulation matrices: TPU scatters lower to slow
    sort-based kernels under vmap, so every segment-sum here is expressed
    as a (constant) 0/1 matmul instead."""
    if pl not in _CFRC_CONST:
        m = pl.m
        root_of = np.asarray(m.body_rootid)
        root_oh = np.zeros((m.nbody, m.nbody), np.float32)
        root_oh[root_of, np.arange(m.nbody)] = 1.0  # (root, body)
        world_mask = np.ones(m.nbody, np.float32)
        world_mask[0] = 0.0
        _CFRC_CONST[pl] = (root_of, root_oh, world_mask)
    return _CFRC_CONST[pl]


def cfrc_ext(pl: Pipeline, params, kin: Kin, efc, con_force: jax.Array) -> jax.Array:
    """Per-body external contact force accumulation, MuJoCo cfrc_ext layout:
    6-vector (torque, force) in world axes, torque about the subtree CoM of
    the body's kinematic root (oracle-verified against mj_rnePostConstraint).

    The reference reads norms of these rows for the feet-contact, collision
    and unwanted-contact reward terms (go1_mujoco_env.py:611-613, 688-693,
    771-781); tests pin this against mjData.cfrc_ext.

    Under vmap with the top-K contact layout this dispatches to a
    batch-LAST formulation (_cfrc_core): the batch rides the 128-lane axis
    instead of leaving 3/6-wide trailing dims padded to full tiles —
    measured 2.1x at 4096 envs (tools notes in PLAN.md)."""
    if efc.con_sel is not None:
        return _cfrc_core(pl)(
            jnp.asarray(params["body_mass"], con_force.dtype),
            kin.xipos, efc.con_pos, efc.con_frame, con_force,
            efc.con_active, efc.con_sel,
        )
    return _cfrc_single(pl, params, kin, efc, con_force)


def _cfrc_single(pl: Pipeline, params, kin: Kin, efc, con_force: jax.Array) -> jax.Array:
    m = pl.m
    dtype = con_force.dtype
    active = efc.con_active.astype(dtype)[:, None]
    # contact-frame rows are (n, t1, t2): world force and torque on geom2
    force_w = jnp.einsum("ci,cik->ck", con_force[:, :3], efc.con_frame) * active
    torque_w = jnp.einsum("ci,cik->ck", con_force[:, 3:], efc.con_frame) * active

    root_of, root_oh_np, world_mask_np = _cfrc_consts(pl)
    root_oh = jnp.asarray(root_oh_np, dtype)

    # per-root subtree CoM (mass-weighted over each root's tree) — one
    # static-mask matmul instead of a scatter-add
    mass = jnp.asarray(params["body_mass"], dtype)
    nroot_com = root_oh @ (mass[:, None] * kin.xipos)
    wsum = root_oh @ mass
    root_com = nroot_com / jnp.maximum(wsum, 1e-12)[:, None]
    # world body: subtree_com[0] is the whole-system CoM
    total_com = jnp.sum(mass[:, None] * kin.xipos, axis=0) / jnp.maximum(
        jnp.sum(mass), 1e-12
    )
    root_com = root_com.at[0].set(total_com)
    ref_b = root_com[root_of]                      # (nbody, 3)

    b1 = jnp.asarray(pl.layout.con_body1)
    b2 = jnp.asarray(pl.layout.con_body2)
    if efc.con_sel is not None:
        b1 = b1[efc.con_sel]
        b2 = b2[efc.con_sel]
    arm2 = efc.con_pos - ref_b[b2]
    arm1 = efc.con_pos - ref_b[b1]
    t2 = torque_w + jnp.cross(arm2, force_w)
    t1 = torque_w + jnp.cross(arm1, force_w)
    # segment-sum over (possibly dynamic) body ids via comparison one-hots:
    # (nbody, ncon) @ (ncon, 3) matmuls — no scatter anywhere
    bodies = jnp.arange(m.nbody)[:, None]
    oh2 = (bodies == b2[None, :]).astype(dtype)
    oh1 = (bodies == b1[None, :]).astype(dtype)
    cfrc_t = oh2 @ t2 - oh1 @ t1
    cfrc_f = (oh2 - oh1) @ force_w
    cfrc = jnp.concatenate([cfrc_t, cfrc_f], axis=1)
    # mujoco does not accumulate external forces onto the world body
    return cfrc * jnp.asarray(world_mask_np, dtype)[:, None]


_CFRC_CORE: "weakref.WeakKeyDictionary[Pipeline, object]" = (
    weakref.WeakKeyDictionary()
)


def _cfrc_core(pl: Pipeline):
    """custom_vmap cfrc accumulation: single-env path is _cfrc_single
    (oracle-exact); the batch rule is batch-LAST so the env batch rides
    the TPU lane axis (same dispatch pattern as solver._solver_core)."""
    if pl in _CFRC_CORE:
        return _CFRC_CORE[pl]

    import types

    from jax import custom_batching

    @custom_batching.custom_vmap
    def core(mass, xipos, con_pos, con_frame, con_force, con_active, con_sel):
        kin_v = types.SimpleNamespace(xipos=xipos)
        efc_v = types.SimpleNamespace(
            con_active=con_active, con_frame=con_frame, con_pos=con_pos,
            con_sel=con_sel,
        )
        return _cfrc_single(pl, {"body_mass": mass}, kin_v, efc_v, con_force)

    @core.def_vmap
    def _rule(axis_size, in_batched, *args):
        flat_b = jax.tree.leaves(in_batched)
        args = [
            x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            for x, b in zip(args, flat_b)
        ]
        mass, xipos, con_pos, con_frame, con_force, con_active, con_sel = (
            jnp.moveaxis(x, 0, -1) for x in args
        )
        out = _cfrc_blast(
            pl, mass, xipos, con_pos, con_frame, con_force, con_active,
            con_sel,
        )
        return jnp.moveaxis(out, -1, 0), True

    _CFRC_CORE[pl] = core
    return core


def _cfrc_blast(pl, mass, xipos, con_pos, con_frame, con_force, con_active,
                con_sel):
    """Batch-LAST cfrc accumulation.  Shapes: mass (nbody,B),
    xipos (nbody,3,B), con_pos (K,3,B), con_frame (K,3,3,B),
    con_force (K,6,B), con_active (K,B), con_sel (K,B)."""
    m = pl.m
    dtype = con_force.dtype
    root_of, root_oh_np, world_mask_np = _cfrc_consts(pl)
    act = con_active.astype(dtype)[:, None, :]                # (K,1,B)
    # world force/torque on geom2: frame rows are (n, t1, t2)
    force_w = sum(
        con_force[:, i, None, :] * con_frame[:, i, :, :] for i in range(3)
    ) * act                                                   # (K,3,B)
    torque_w = sum(
        con_force[:, 3 + i, None, :] * con_frame[:, i, :, :]
        for i in range(3)
    ) * act
    root_oh = jnp.asarray(root_oh_np, dtype)                  # (nbody,nbody)
    mx = mass[:, None, :] * xipos                             # (nbody,3,B)
    nroot_com = jnp.einsum("rb,bdB->rdB", root_oh, mx)
    wsum = jnp.einsum("rb,bB->rB", root_oh, mass)
    root_com = nroot_com / jnp.maximum(wsum, 1e-12)[:, None, :]
    total_com = jnp.sum(mx, 0) / jnp.maximum(jnp.sum(mass, 0), 1e-12)
    root_com = root_com.at[0].set(total_com)
    ref_b = root_com[jnp.asarray(root_of)]                    # (nbody,3,B)

    b1c = jnp.asarray(pl.layout.con_body1)[con_sel]           # (K,B)
    b2c = jnp.asarray(pl.layout.con_body2)[con_sel]

    def cross(a, b):                                          # (K,3,B)
        ax, ay, az = a[:, 0], a[:, 1], a[:, 2]
        bx, by, bz = b[:, 0], b[:, 1], b[:, 2]
        return jnp.stack(
            [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=1
        )

    # segment-sum over dynamic body ids as a small unrolled loop over the
    # (static, tiny) body list: each step is full-lane (K,3,B) work; body 0
    # (world) stays zero, matching mujoco
    rows_t, rows_f = [jnp.zeros((3,) + mass.shape[1:], dtype)], [
        jnp.zeros((3,) + mass.shape[1:], dtype)
    ]
    for b in range(1, m.nbody):
        m1 = (b1c == b).astype(dtype)[:, None, :]             # (K,1,B)
        m2 = (b2c == b).astype(dtype)[:, None, :]
        arm = con_pos - ref_b[b][None]                        # (K,3,B)
        tq = torque_w + cross(arm, force_w)
        rows_t.append(jnp.sum((m2 - m1) * tq, 0))
        rows_f.append(jnp.sum((m2 - m1) * force_w, 0))
    cfrc_t = jnp.stack(rows_t, 0)                             # (nbody,3,B)
    cfrc_f = jnp.stack(rows_f, 0)
    return jnp.concatenate([cfrc_t, cfrc_f], axis=1)          # (nbody,6,B)


def integrate(
    pl: Pipeline, params, qpos: jax.Array, qvel: jax.Array, qacc: jax.Array,
    M: jax.Array,
):
    """Semi-implicit Euler with implicit joint damping (MuJoCo mj_Euler)."""
    m = pl.m
    dtype = qpos.dtype
    h = jnp.asarray(m.opt.timestep, dtype)
    B = jnp.asarray(params["dof_damping"], dtype)
    with jax.default_matmul_precision("highest"):
        Mh = M + h * jnp.diag(B)
        # unrolled factor/solve (math.chol_factor): lapack-style batched
        # custom calls are very slow vmapped on TPU
        L = chol_factor(Mh)
        qvel_new = qvel + h * chol_solve(L, M @ qacc)

    # hinges: one constant-projection matmul (scatter-free); free joints:
    # exact quaternion step
    from .kinematics import tree_levels

    lv = tree_levels(m)
    qpos_new = qpos
    if len(lv.hinge_jnt):
        P = np.zeros((m.nq, m.nv), np.float32)
        P[lv.hinge_qadr, lv.hinge_dof] = 1.0
        qpos_new = qpos_new + h * (jnp.asarray(P, dtype) @ qvel_new)
    for j in lv.free_jnt:
        qadr = int(m.jnt_qposadr[j])
        dadr = int(m.jnt_dofadr[j])
        qpos_new = qpos_new.at[qadr : qadr + 3].add(
            h * qvel_new[dadr : dadr + 3]
        )
        quat = quat_integrate(
            qpos_new[qadr + 3 : qadr + 7], qvel_new[dadr + 3 : dadr + 6], h
        )
        qpos_new = qpos_new.at[qadr + 3 : qadr + 7].set(quat)
    return qpos_new, qvel_new


def step(
    pl: Pipeline, params, qpos: jax.Array, qvel: jax.Array, ctrl: jax.Array,
    warmstart: jax.Array | None = None,
):
    """One physics substep.  Returns (qpos', qvel', StepData)."""
    data, M = forward(pl, params, qpos, qvel, ctrl, warmstart=warmstart)
    qpos_new, qvel_new = integrate(pl, params, qpos, qvel, data.qacc, M)
    return qpos_new, qvel_new, data


def step_n(
    pl: Pipeline, params, qpos, qvel, ctrl, n: int,
    warmstart: jax.Array | None = None,
):
    """n substeps with constant ctrl (reference frame_skip=10,
    go1_mujoco_env.py:49).  The Newton solver warmstarts from the previous
    substep's qacc (MuJoCo qacc_warmstart).  Returns (qpos', qvel',
    last StepData)."""
    if warmstart is None:
        warmstart = jnp.zeros_like(qvel)

    # the env layer only consumes the LAST substep's StepData (MuJoCo
    # leaves xpos/cfrc stale after mj_step the same way), so carry it
    # through the scan instead of stacking n copies — stacking the full
    # StepData at large env batches was >0.5 GB of dead HBM traffic and
    # crashed the axon runtime
    def body(carry, _):
        qp, qv, warm, _ = carry
        qp, qv, data = step(pl, params, qp, qv, ctrl, warmstart=warm)
        return (qp, qv, data.qacc, data), None

    data0 = jax.eval_shape(
        lambda qp, qv: step(pl, params, qp, qv, ctrl, warmstart=warmstart)[2],
        qpos, qvel,
    )
    data0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), data0)
    (qpos, qvel, _, last), _ = jax.lax.scan(
        body, (qpos, qvel, warmstart, data0), None, length=n
    )
    return qpos, qvel, last
