"""Constraint assembly: MuJoCo's soft-constraint model with static shapes.

Row layout (fixed at compile time):
  [dof friction rows | joint limit rows | ncand x 6 contact rows]
Inactive rows (limit not near, contact candidate beyond includemargin,
condim < 6 spare rows) are masked: they contribute zero force/penalty but
keep every shape static for vmap/jit.

All formulas below were reverse-verified against mjData.efc_* on the Go1
model (see tests/test_constraint.py):
  impedance d(x): solimp=(dmin,dmax,width,mid,power), x=|pos-margin|/width
  K = 1/(dmax^2 tc^2 dr^2), B = 2/(dmax tc), dmax clamped to [1e-4, 0.9999]
  aref_i = -B (J qvel)_i - K d (pos_i - margin_i)
  R_i = max(1e-15, (1-d)/d * diagApprox_i);  D_i = 1/R_i
  contact friction rows: R_i = R_normal / impratio * (mu_1/mu_i)^2
  diagApprox: dof rows -> dof_invweight0; contact normals ->
  body_invweight0[b1,0] + body_invweight0[b2,0]  (computed at qpos0 with
  our own CRBA, validated against MjModel.*_invweight0).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..mjcf.model import JNT_HINGE, PhysicsModel
from .collision import CollisionTable, narrowphase
from .kinematics import Kin, ancestor_dof_mask, fk
from . import smooth

_MAXIMP = 0.9999
_MINIMP = 1e-4
_MINVAL = 1e-15


# ---------------------------------------------------------------------------
# compile-time invweights (MuJoCo mj_setConst equivalents)
# ---------------------------------------------------------------------------

import weakref as _weakref

# WeakKeyDictionary on the live model, not id(m): id reuse after GC would
# serve a stale closure (same fix as the solver.py sibling caches)
_INVW_CACHE: "_weakref.WeakKeyDictionary[PhysicsModel, tuple]" = (
    _weakref.WeakKeyDictionary()
)


def invweights(m: PhysicsModel) -> tuple[np.ndarray, np.ndarray]:
    """(dof_invweight0 (nv,), body_invweight0 (nbody, 2)) at qpos0."""
    if m in _INVW_CACHE:
        return _INVW_CACHE[m]
    qpos0 = jnp.asarray(m.qpos0)
    qvel0 = jnp.zeros(m.nv)
    kin = fk(m, qpos0, qvel0)
    M = np.asarray(smooth.crba(m, m.params(), kin))
    Minv = np.linalg.inv(M)
    dof_invw = np.diag(Minv).copy()
    # free joints: MuJoCo averages the 3 translational / 3 rotational
    # diagonal entries per block (oracle-verified)
    from ..mjcf.model import JNT_FREE

    for j in range(m.njnt):
        if m.jnt_type[j] == JNT_FREE:
            adr = int(m.jnt_dofadr[j])
            dof_invw[adr : adr + 3] = dof_invw[adr : adr + 3].mean()
            dof_invw[adr + 3 : adr + 6] = dof_invw[adr + 3 : adr + 6].mean()

    body_invw = np.zeros((m.nbody, 2))
    mask = ancestor_dof_mask(m)
    cdof = np.asarray(kin.cdof)
    ref = np.asarray(kin.ref)
    xipos = np.asarray(kin.xipos)
    for b in range(1, m.nbody):
        arm = xipos[b] - ref
        jt = (cdof[:, 3:] + np.cross(cdof[:, :3], arm[None, :])) * mask[b][:, None]
        jr = cdof[:, :3] * mask[b][:, None]
        At = jt.T @ Minv @ jt
        Ar = jr.T @ Minv @ jr
        body_invw[b, 0] = np.trace(At) / 3.0
        body_invw[b, 1] = np.trace(Ar) / 3.0
    _INVW_CACHE[m] = (dof_invw, body_invw)
    return dof_invw, body_invw


# ---------------------------------------------------------------------------
# static efc layout
# ---------------------------------------------------------------------------


@dataclasses.dataclass(eq=False)
class EfcLayout:
    """Static structure of the constraint system for one model+table."""

    friction_dofs: np.ndarray      # (nf,) dof indices with frictionloss > 0
    limit_joints: np.ndarray       # (nl,) joint indices with limits
    ncon: int                      # number of contact candidates
    nefc: int                      # nf + nl + 6*ncon

    # per-candidate static contact metadata
    con_body1: np.ndarray          # (ncon,)
    con_body2: np.ndarray
    con_condim: np.ndarray         # (ncon,)
    con_friction: np.ndarray       # (ncon, 5)
    con_solref: np.ndarray         # (ncon, 2)
    con_solimp: np.ndarray         # (ncon, 5)
    con_margin: np.ndarray         # (ncon,)
    con_includemargin: np.ndarray  # (ncon,)
    con_diagapprox: np.ndarray     # (ncon,)  invweight sum for normal rows

    max_contacts: int | None = None  # top-K solver slots (None = all)
    # condim row pools (PLAN lever 1): ((condim, cand_indices, K), ...)
    # ordered by descending condim.  Each class compacts its own actives
    # into K class slots emitting only `condim` J rows per slot — vs the
    # uniform top-K path's 6 rows per slot, ~2x fewer Gram rows at equal
    # contact capacity on the Go1 full-collision table
    pools: tuple | None = None

    # deferred cylinder refinement (round 4, PLAN perf): per-candidate
    # geom ids / sizes / kind codes so the pooled path can run the
    # 10-iteration cylinder projection on the K SELECTED slots instead of
    # every candidate (collision.refine_cylinder_slots)
    con_geom1: np.ndarray | None = None   # (ncand,)
    con_geom2: np.ndarray | None = None
    con_rh: np.ndarray | None = None      # (ncand, 4) r1 h1 r2 h2
    con_cylkind: np.ndarray | None = None  # (ncand,) collision.CYLKIND_*
    defer_cyl: bool = False
    # deferred frames (round 5): plane_capsule candidates use a special
    # tangent rule, so slot-level frame_from_normal needs the flag
    con_pcap: np.ndarray | None = None    # (ncand,) 1.0 = plane_capsule


def build_layout(
    m: PhysicsModel, table: CollisionTable, max_contacts: int | None = None,
    contact_pools: dict | None = None, defer_cyl: bool = False,
) -> EfcLayout:
    from .collision import CYLKIND_CAPCYL, CYLKIND_CYLCYL

    dof_invw, body_invw = invweights(m)
    friction_dofs = np.where(m.dof_frictionloss > 0)[0].astype(np.int32)
    limit_joints = np.where(m.jnt_limited & (m.jnt_type == JNT_HINGE))[0].astype(
        np.int32
    )
    b1 = table.cand_meta("body1")
    b2 = table.cand_meta("body2")
    ncon = table.ncand
    pools = None
    if contact_pools is not None:
        cd_all = np.asarray(table.cand_meta("condim"))
        pools = []
        for cdim in sorted(set(int(c) for c in cd_all), reverse=True):
            idx = np.where(cd_all == cdim)[0].astype(np.int32)
            budget = int(contact_pools.get(cdim, len(idx)))
            pools.append((cdim, idx, min(budget, len(idx))))
        pools = tuple(pools)
    g1c = table.cand_meta("geom1").astype(np.int32)
    g2c = table.cand_meta("geom2").astype(np.int32)
    cylkind = np.concatenate([
        np.full(
            g.ncand,
            CYLKIND_CAPCYL if g.kind == "capsule_cylinder"
            else CYLKIND_CYLCYL if g.kind == "cylinder_cylinder" else 0,
            np.int32,
        )
        for g in table.groups
    ]) if table.groups else np.zeros(0, np.int32)
    rh = np.stack(
        [m.geom_size[g1c, 0], m.geom_size[g1c, 1],
         m.geom_size[g2c, 0], m.geom_size[g2c, 1]], axis=1,
    )
    pcap = np.concatenate([
        np.full(g.ncand, 1.0 if g.kind == "plane_capsule" else 0.0,
                np.float64)
        for g in table.groups
    ]) if table.groups else np.zeros(0, np.float64)
    return EfcLayout(
        con_geom1=g1c,
        con_geom2=g2c,
        con_rh=rh,
        con_cylkind=cylkind,
        con_pcap=pcap,
        # deferral only pays (and is only implemented) on the pooled path
        defer_cyl=bool(defer_cyl and pools is not None and (cylkind > 0).any()),
        friction_dofs=friction_dofs,
        limit_joints=limit_joints,
        ncon=ncon,
        nefc=len(friction_dofs) + len(limit_joints) + 6 * ncon,
        con_body1=b1,
        con_body2=b2,
        con_condim=table.cand_meta("condim"),
        con_friction=table.cand_meta("friction"),
        con_solref=table.cand_meta("solref"),
        con_solimp=table.cand_meta("solimp"),
        con_margin=table.cand_meta("margin"),
        con_includemargin=table.cand_meta("includemargin"),
        con_diagapprox=body_invw[b1, 0] + body_invw[b2, 0],
        max_contacts=max_contacts,
        pools=pools,
    )


@dataclasses.dataclass
class Efc:
    """Assembled constraint system (single env; leaves are jax arrays)."""

    J: jax.Array            # (nefc, nv)
    aref: jax.Array         # (nefc,)
    R: jax.Array            # (nefc,)
    D: jax.Array            # (nefc,)
    floss: jax.Array        # (nefc,) frictionloss per row (0 for others)
    active: jax.Array       # (nefc,) bool
    # contact block views (ncon, ...)
    con_active: jax.Array   # (ncon,)
    con_dist: jax.Array     # (ncon,)
    con_pos: jax.Array      # (ncon, 3)
    con_frame: jax.Array    # (ncon, 3, 3)
    con_mu_tilde: jax.Array  # (ncon,) = mu1 / sqrt(impratio)
    con_scale: jax.Array    # (ncon, 6) z -> zeta row scaling
    con_fscale: jax.Array   # (ncon, 6) scaled force -> force
    con_dim_mask: jax.Array  # (ncon, 6) rows enabled by condim
    con_sel: jax.Array | None  # (ncon,) candidate index of each slot
    con_Rn: jax.Array       # (ncon,) normal-row regularization
    con_overflow: jax.Array  # () i32: active candidates dropped beyond K
    # compact contact row map (static): row r of the contact block is
    # dimension row_dim[r] of contact row_con[r]; None = padded ncon*6 rows
    row_con: tuple | None
    row_dim: tuple | None
    # condim pools (static): ((K_c, condim_c), ...) in slot order, or None
    pool_dims: tuple | None
    nf: int
    nl: int


jax.tree_util.register_dataclass(
    Efc,
    data_fields=[
        "J", "aref", "R", "D", "floss", "active", "con_active", "con_dist",
        "con_pos", "con_frame", "con_mu_tilde", "con_scale", "con_fscale",
        "con_dim_mask", "con_sel", "con_Rn", "con_overflow",
    ],
    meta_fields=["row_con", "row_dim", "pool_dims", "nf", "nl"],
)


def _impedance(solimp, x):
    dmin, dmax, width, mid, power = (
        solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3],
        solimp[..., 4],
    )
    dmin = jnp.clip(dmin, _MINIMP, _MAXIMP)
    dmax = jnp.clip(dmax, _MINIMP, _MAXIMP)
    x = jnp.clip(jnp.abs(x) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
    # y = a*x^p (x<=mid), 1 - b*(1-x)^p (x>mid)
    a = 1.0 / jnp.maximum(mid, _MINVAL) ** (power - 1)
    b = 1.0 / jnp.maximum(1 - mid, _MINVAL) ** (power - 1)
    y = jnp.where(x <= mid, a * x**power, 1.0 - b * (1.0 - x) ** power)
    d = dmin + y * (dmax - dmin)
    return jnp.clip(d, _MINIMP, _MAXIMP)


def _kb(solref, solimp):
    dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
    tc, dr = solref[..., 0], solref[..., 1]
    K = 1.0 / jnp.maximum(dmax * dmax * tc * tc * dr * dr, _MINVAL)
    B = 2.0 / jnp.maximum(dmax * tc, _MINVAL)
    return K, B


_CONST_CACHE: "_weakref.WeakKeyDictionary[EfcLayout, np.ndarray]" = None  # set below


def _packed_const(layout: EfcLayout) -> np.ndarray:
    """Packed per-candidate constant table for the single-gather top-K
    paths (pooled and uniform share it — one column map to maintain):
    [margin | solref(2) | solimp(5) | friction(5) | diagapprox | body1 |
     body2 | condim | includemargin]  (ncand, 18)."""
    global _CONST_CACHE
    if _CONST_CACHE is None:
        import weakref as _wr

        _CONST_CACHE = _wr.WeakKeyDictionary()
    tbl = _CONST_CACHE.get(layout)
    if tbl is None:
        tbl = np.concatenate(
            [
                np.asarray(layout.con_margin, np.float64)[:, None],
                np.asarray(layout.con_solref, np.float64),
                np.asarray(layout.con_solimp, np.float64),
                np.asarray(layout.con_friction, np.float64),
                np.asarray(layout.con_diagapprox, np.float64)[:, None],
                np.asarray(layout.con_body1, np.float64)[:, None],
                np.asarray(layout.con_body2, np.float64)[:, None],
                np.asarray(layout.con_condim, np.float64)[:, None],
                np.asarray(layout.con_includemargin, np.float64)[:, None],
                # deferred-cylinder refinement metadata (cols 18-24):
                # geom ids, r1 h1 r2 h2, kind code — rides the same single
                # gather as everything else
                np.asarray(layout.con_geom1, np.float64)[:, None],
                np.asarray(layout.con_geom2, np.float64)[:, None],
                np.asarray(layout.con_rh, np.float64),
                np.asarray(layout.con_cylkind, np.float64)[:, None],
                # deferred-frame metadata (col 25): plane_capsule flag
                np.asarray(layout.con_pcap, np.float64)[:, None],
            ],
            axis=1,
        )
        _CONST_CACHE[layout] = tbl
    return tbl


def _row_onehot(sel, n, dtype):
    """(K, n) one-hot of row indices — exact 0/1 in every matmul
    precision, so one-hot row selection is bitwise-equal to a gather."""
    return (sel[:, None] == jnp.arange(n, dtype=sel.dtype)[None, :]).astype(
        dtype
    )


def _gather_rows(sel, data, const, dtype):
    """Top-K slot gather: (dsel, csel) = rows `sel` of the per-env
    contact data table and the static packed-const table.

    Default 'onehot': both gathers become matmuls (round-5 on-chip A/B,
    tools/asm_probe2.py: per-env take_along 11.4 ms vs one-hot einsum
    4.3 ms at 811->48 x 30 cols, B=4096; the const side is
    env-independent so under vmap it lowers to a true MXU GEMM).
    Precision HIGHEST makes the f32 operand splitting exact, and each
    one-hot row has exactly one nonzero, so the result is BITWISE equal
    to the gather primitive (pinned by tests/test_gather_onehot.py).
    QTPU_GATHER=take restores the gather-primitive path."""
    if os.environ.get("QTPU_GATHER", "onehot") == "take":
        return data[sel], const[sel]
    oh = _row_onehot(sel, data.shape[0], dtype)
    dsel = jax.lax.dot(
        oh, data, precision=jax.lax.Precision.HIGHEST
    )
    csel = jax.lax.dot(
        oh, const, precision=jax.lax.Precision.HIGHEST
    )
    return dsel, csel


def _gather_xmat_col(kin, g, col):
    """(K, 3) rows of kin.geom_xmat[:, :, col] at per-slot geom indices,
    as a one-hot HIGHEST-precision matmul (bitwise equal to the gather,
    same argument as _gather_rows)."""
    tbl = kin.geom_xmat[:, :, col]
    oh = _row_onehot(g, tbl.shape[0], tbl.dtype)
    return jax.lax.dot(oh, tbl, precision=jax.lax.Precision.HIGHEST)


def _slot_frames(kin, dsel, c, fr_mode):
    """Slot contact frames: gathered full frames (fr_mode 'full', data
    cols 4:13) or deferred construction from gathered normals (cols 4:7)
    via collision.frame_from_normal — the plane_capsule special tangent
    pulls its axis (geom2 z) and fallback (geom1 x) columns per slot."""
    if fr_mode == "full":
        return dsel[:, 4:13].reshape(-1, 3, 3)
    from .collision import frame_from_normal

    nn = dsel[:, 4:7]
    axis = _gather_xmat_col(kin, c["geom2"], 2)
    px = _gather_xmat_col(kin, c["geom1"], 0)
    return frame_from_normal(nn, c["pcap"], axis, px)


def _unpack_const(csel):
    """Column map of _packed_const after gather (condim returned raw)."""
    return dict(
        margin=csel[:, 0], solref=csel[:, 1:3], solimp=csel[:, 3:8],
        mu=csel[:, 8:13], diagapprox=csel[:, 13],
        body1=csel[:, 14].astype(jnp.int32),
        body2=csel[:, 15].astype(jnp.int32),
        condim=csel[:, 16].astype(jnp.int32),
        includemargin=csel[:, 17],
        geom1=csel[:, 18].astype(jnp.int32),
        geom2=csel[:, 19].astype(jnp.int32),
        rh=csel[:, 20:24],
        cylkind=csel[:, 24].astype(jnp.int32),
        pcap=csel[:, 25] > 0.5,
    )


def assemble(
    m: PhysicsModel,
    layout: EfcLayout,
    table: CollisionTable,
    kin: Kin,
    qpos: jax.Array,
    qvel: jax.Array,
    terrain=None,
) -> Efc:
    dtype = qvel.dtype
    impratio = float(m.opt.impratio)
    anc = jnp.asarray(ancestor_dof_mask(m), dtype=dtype)
    dof_invw, _ = invweights(m)

    Js, arefs, Rs, flosses, actives = [], [], [], [], []

    # ---- dof friction rows --------------------------------------------------
    nf = len(layout.friction_dofs)
    if nf:
        fd = layout.friction_dofs
        Jf = jnp.zeros((nf, m.nv), dtype).at[jnp.arange(nf), fd].set(1.0)
        solref = jnp.asarray(m.dof_solref[fd], dtype)
        solimp = jnp.asarray(m.dof_solimp[fd], dtype)
        d = _impedance(solimp, jnp.zeros(nf, dtype))
        K, B = _kb(solref, solimp)
        aref = -B * qvel[fd]
        R = jnp.maximum((1 - d) / d * jnp.asarray(dof_invw[fd], dtype), _MINVAL)
        Js.append(Jf)
        arefs.append(aref)
        Rs.append(R)
        flosses.append(jnp.asarray(m.dof_frictionloss[fd], dtype))
        actives.append(jnp.ones(nf, dtype=bool))

    # ---- joint limit rows (one per limited hinge; nearest side) -------------
    nl = len(layout.limit_joints)
    if nl:
        lj = layout.limit_joints
        qadr = m.jnt_qposadr[lj]
        dadr = m.jnt_dofadr[lj]
        lo = jnp.asarray(m.jnt_range[lj, 0], dtype)
        hi = jnp.asarray(m.jnt_range[lj, 1], dtype)
        q = qpos[qadr]
        dist_lo = q - lo
        dist_hi = hi - q
        lower = dist_lo < dist_hi
        dist = jnp.where(lower, dist_lo, dist_hi)
        sign = jnp.where(lower, 1.0, -1.0).astype(dtype)
        oh = np.zeros((nl, m.nv), np.float32)
        oh[np.arange(nl), dadr] = 1.0  # static one-hot, scatter-free
        Jl = jnp.asarray(oh, dtype) * sign[:, None]
        margin = jnp.asarray(m.jnt_margin[lj], dtype)
        solref = jnp.asarray(m.jnt_solref[lj], dtype)
        solimp = jnp.asarray(m.jnt_solimp[lj], dtype)
        d = _impedance(solimp, dist - margin)
        K, B = _kb(solref, solimp)
        aref = -B * (Jl @ qvel) - K * d * (dist - margin)
        R = jnp.maximum((1 - d) / d * jnp.asarray(dof_invw[dadr], dtype), _MINVAL)
        Js.append(Jl)
        arefs.append(aref)
        Rs.append(R)
        flosses.append(jnp.zeros(nl, dtype))
        actives.append(dist < margin)

    # ---- contact rows (ncon x 6, fixed) -------------------------------------
    # narrowphase over ALL candidates (cheap VPU math), then top-K selection
    # of the most-penetrating candidates: only K contacts enter the solver,
    # cutting the dominant J^T W J cost ~4-10x with static shapes intact.
    # deferred frames (round 5): on the selection paths the narrowphase
    # returns NORMALS only and full frames are built post-selection for
    # the K slots (collision.frame_from_normal — bit-identical math on
    # 17x fewer rows, and the packed data gather shrinks 13 -> 7 cols).
    # QTPU_FRAMES=full restores candidate-level frame construction.
    K0 = layout.max_contacts
    selecting = layout.pools is not None or (
        K0 is not None and K0 < layout.ncon
    )
    fr_mode = (
        "normal"
        if selecting and os.environ.get("QTPU_FRAMES", "defer") != "full"
        else "full"
    )
    dist_all, pos_all, frame_all = narrowphase(
        m, table, kin, terrain=terrain, defer_cyl=layout.defer_cyl,
        frames=fr_mode,
    )
    K = layout.max_contacts
    static_cd = None     # static per-slot condim => compact J rows
    pool_dims = None
    if layout.pools is not None:
        # ---- condim row pools: class-wise stream compaction --------------
        # each condim class compacts its actives into its own K_c slots;
        # slot condim is then STATIC, so the contact block emits only
        # condim_c rows per slot (row_con/row_dim) instead of uniform 6
        # NOTE (defer_cyl + saturation): with layout.defer_cyl, dist_all
        # holds the capsule UNDER-estimate for cylinder-kind candidates,
        # so act_all over-includes them.  False actives only waste slots
        # (refinement re-deactivates them downstream) — UNLESS a pool
        # saturates, in which case a falsely-active earlier candidate can
        # evict a genuinely active later one that refine-everything would
        # have kept.  `overflow` below (surfaced as contact_overflow) is
        # the monitoring signal; see collision.narrowphase docstring.
        incm_all = jnp.asarray(layout.con_includemargin, dtype)
        act_all = dist_all < incm_all
        data = jnp.concatenate(
            [dist_all[:, None], pos_all,
             frame_all.reshape(frame_all.shape[0], -1)], axis=1
        )
        const = jnp.asarray(_packed_const(layout), dtype)
        sel_l, valid_l, cd_l = [], [], []
        overflow = jnp.zeros((), jnp.int32)
        for cdim, idx, Kc in layout.pools:
            if Kc == 0:
                continue
            idxj = jnp.asarray(idx)
            act_c = act_all[idxj]
            cs = jnp.cumsum(act_c.astype(jnp.int32))
            ks = jnp.arange(Kc, dtype=jnp.int32)
            sel_local = jnp.sum(
                (cs[None, :] <= ks[:, None]).astype(jnp.int32), axis=1
            )
            sel_local = jnp.minimum(sel_local, len(idx) - 1)
            sel_c = idxj[sel_local]
            valid_l.append(jnp.arange(Kc) < cs[-1])
            overflow = overflow + jnp.maximum(cs[-1] - Kc, 0)
            sel_l.append(sel_c)
            cd_l.append(np.full(Kc, cdim, np.int64))
        sel = jnp.concatenate(sel_l)
        # slot gather as one-hot matmul (round 5, tools/asm_probe2.py on
        # v5e: per-env take_along 11.4 ms vs one-hot einsum 4.3 ms at
        # production shapes; const is env-independent, so its gather is
        # a true MXU matmul).  One nonzero per one-hot row and HIGHEST
        # precision (exact f32 splitting) keep it BITWISE equal to the
        # take path; QTPU_GATHER=take restores the gather primitive.
        dsel, csel = _gather_rows(sel, data, const, dtype)
        slot_valid = jnp.concatenate(valid_l)
        static_cd = np.concatenate(cd_l)
        pool_dims = tuple(
            (Kc, cdim) for cdim, _i, Kc in layout.pools if Kc
        )
        K = int(static_cd.shape[0])
        dist, pos = dsel[:, 0], dsel[:, 1:4]
        c = _unpack_const(csel)
        frame = _slot_frames(kin, dsel, c, fr_mode)
        dist = jnp.where(slot_valid, dist, 1e9)
        margin, solref, solimp = c["margin"], c["solref"], c["solimp"]
        mu, diagapprox = c["mu"], c["diagapprox"]
        body1, body2 = c["body1"], c["body2"]
        includemargin = c["includemargin"]
        # slot condim is the pool's STATIC dim (compact rows), not the
        # gathered per-candidate value
        condim = jnp.asarray(static_cd)

        if layout.defer_cyl:
            # deferred cylinder refinement (round 4): the cheap narrowphase
            # above returned the capsule-capsule approximation for
            # capsule_cylinder/cylinder_cylinder candidates; run the
            # 10-iteration projection refinement on just the SELECTED slots
            # of the classes that can contain them (Go1: the 12 condim-1
            # slots vs 247 candidates).  Static slices per class — no
            # scatter; invalid slots keep their 1e9 sentinel.
            from .collision import make_frame as _mkframe
            from .collision import refine_cylinder_slots

            ck_all = np.asarray(layout.con_cylkind)
            off = 0
            for _cdim, idx_, Kc_ in layout.pools:
                if Kc_ == 0:
                    continue
                rng_ = slice(off, off + Kc_)
                off += Kc_
                if not (ck_all[idx_] > 0).any():
                    continue
                d_sl, p_sl, f_sl = dist[rng_], pos[rng_], frame[rng_]
                ck_sl = c["cylkind"][rng_]
                rh_sl = c["rh"][rng_]
                dr, pr, nr = refine_cylinder_slots(
                    kin, c["geom1"][rng_], c["geom2"][rng_],
                    rh_sl[:, 0], rh_sl[:, 1], rh_sl[:, 2], rh_sl[:, 3],
                    ck_sl, d_sl, p_sl, f_sl[:, 0, :],
                )
                apply_ = ck_sl > 0
                f_new = jnp.where(apply_[:, None, None], _mkframe(nr), f_sl)
                dist = dist.at[rng_].set(
                    jnp.where(slot_valid[rng_], dr, 1e9)
                )
                pos = pos.at[rng_].set(pr)
                frame = frame.at[rng_].set(f_new)
    elif K is not None and K < layout.ncon:
        # stream-compact the active candidates into K solver slots with a
        # cumsum + searchsorted (scatter-free; a full top_k sort is ~4x
        # slower on TPU and dynamic scatters lower to sort-based kernels);
        # actives beyond K slots are dropped (K is sized well above the
        # realistic simultaneous-contact count)
        incm_all = jnp.asarray(layout.con_includemargin, dtype)
        act_all = dist_all < incm_all
        cs = jnp.cumsum(act_all.astype(jnp.int32))
        # k-th active candidate = first index i with cs[i] == k+1.  cs is
        # sorted, so that index equals the count of entries with cs <= k —
        # one fused compare+reduce.  (jnp.searchsorted's default 'scan'
        # method is 10 sequential batched binary-search gathers: measured
        # 23 ms/substep at 4096 envs, ~35% of the whole assemble stage —
        # tools/assemble_bench.py.)
        ks = jnp.arange(K, dtype=jnp.int32)
        sel = jnp.sum(
            (cs[None, :] <= ks[:, None]).astype(jnp.int32), axis=1
        )
        sel = jnp.minimum(sel, layout.ncon - 1)
        slot_valid = jnp.arange(K) < cs[-1]
        # actives beyond the K slots are silently discarded by the solver;
        # surface the count so env info / debug runs can detect contact
        # softening instead of it passing unnoticed (ADVICE r1)
        overflow = jnp.maximum(cs[-1] - K, 0)
        # ONE packed gather for contact data + per-candidate constants:
        # separate gathers cost ~3 ms each at 4096 envs (assemble_bench),
        # so dist/pos/frame and the 9 constant tables ride a single
        # (ncand, 13+18) gather each
        data = jnp.concatenate(
            [dist_all[:, None], pos_all,
             frame_all.reshape(frame_all.shape[0], -1)], axis=1
        )
        const = jnp.asarray(_packed_const(layout), dtype)
        dsel, csel = _gather_rows(sel, data, const, dtype)
        dist, pos = dsel[:, 0], dsel[:, 1:4]
        c = _unpack_const(csel)
        frame = _slot_frames(kin, dsel, c, fr_mode)
        # force unselected slots inactive regardless of the dummy gather
        dist = jnp.where(slot_valid, dist, 1e9)
        margin, solref, solimp = c["margin"], c["solref"], c["solimp"]
        mu, diagapprox = c["mu"], c["diagapprox"]
        body1, body2 = c["body1"], c["body2"]
        condim, includemargin = c["condim"], c["includemargin"]
    else:
        K = layout.ncon
        sel = None
        overflow = jnp.zeros((), jnp.int32)
        dist, pos, frame = dist_all, pos_all, frame_all
        gather = lambda a: jnp.asarray(a, dtype)
        igather = lambda a: jnp.asarray(a)
        margin = gather(layout.con_margin)
        solref = gather(layout.con_solref)
        solimp = gather(layout.con_solimp)
        mu = gather(layout.con_friction)                  # (ncon, 5)
        diagapprox = gather(layout.con_diagapprox)
        body1 = igather(layout.con_body1)
        body2 = igather(layout.con_body2)
        condim = igather(layout.con_condim)
        includemargin = gather(layout.con_includemargin)
    ncon = K
    con_active = dist < includemargin

    # Jacobian: rows (normal, t1, t2) translational; (normal, t1, t2) rotational
    # J_row = dir . (vel of point/angvel of body2 - body1)
    arm = pos - kin.ref                                     # (ncon, 3)
    sgn = anc[body2] - anc[body1]                           # (ncon, nv)
    if os.environ.get("QTPU_JROW", "unroll") == "einsum":
        # original formulation: 3-vectors as trailing dims.  Under vmap
        # those tiny trailing axes land on the 8x128 tile minor dims and
        # pad 2.7-42x; kept for A/B (QTPU_JROW=einsum).
        # dof point jacobian (ncon, nv, 3): v_d(p) = cdof_v + cdof_w x arm
        jt = kin.cdof[None, :, 3:] + jnp.cross(
            kin.cdof[None, :, :3], arm[:, None, :]
        )
        jr = jnp.broadcast_to(kin.cdof[None, :, :3], jt.shape)
        jt = jt * sgn[..., None]
        jr = jr * sgn[..., None]
        # (ncon, 6, nv): frame rows dotted with point/rotation jacobians
        Jc = jnp.concatenate(
            [
                jnp.einsum("cdk,cik->cid", jt, frame),
                jnp.einsum("cdk,cik->cid", jr, frame),
            ],
            axis=1,
        )
    else:
        # component-unrolled form (round 5): every intermediate is 2-D
        # (nv, ncon) — under either vmap layout the batch rides a full
        # tile axis and no 3-wide dim pads a tile (on-chip A/B in
        # tools/asm_probe2.py: 8.7 ms -> 3.0 ms at B=4096).  Same math,
        # same per-element operation order as the einsum form:
        # jt[c,d,:] = (cdof_v[d] + cdof_w[d] x arm[c]) * sgn[c,d],
        # row[c,i,d] = sum_k jt[c,d,k] * frame[c,i,k].
        w3 = kin.cdof[:, :3]                                # (nv, 3)
        v3 = kin.cdof[:, 3:]
        ax, ay, az = arm[:, 0][None], arm[:, 1][None], arm[:, 2][None]
        sT = sgn.T                                          # (nv, ncon)
        # parenthesization matches cross-then-add of the einsum form
        # (v + (w x arm)), keeping the rounding bit-identical
        jtx = (v3[:, 0:1] + (w3[:, 1:2] * az - w3[:, 2:3] * ay)) * sT
        jty = (v3[:, 1:2] + (w3[:, 2:3] * ax - w3[:, 0:1] * az)) * sT
        jtz = (v3[:, 2:3] + (w3[:, 0:1] * ay - w3[:, 1:2] * ax)) * sT
        jrx = w3[:, 0:1] * sT
        jry = w3[:, 1:2] * sT
        jrz = w3[:, 2:3] * sT
        rows = []
        for cx, cy, cz in ((jtx, jty, jtz), (jrx, jry, jrz)):
            for i in range(3):
                fx = frame[:, i, 0][None]
                fy = frame[:, i, 1][None]
                fz = frame[:, i, 2][None]
                rows.append((cx * fx + cy * fy + cz * fz).T)  # (ncon, nv)
        Jc = jnp.stack(rows, axis=1)                        # (ncon, 6, nv)

    d_imp = _impedance(solimp, dist - margin)
    Kstiff, B = _kb(solref, solimp)
    R0 = jnp.maximum((1 - d_imp) / d_imp * diagapprox, _MINVAL)
    mu1 = mu[:, 0]
    # friction row regularization: R_n / impratio * (mu1/mu_i)^2
    Rf = R0[:, None] / impratio * (mu1[:, None] / mu) ** 2
    Rcon = jnp.concatenate([R0[:, None], Rf], axis=1)       # (ncon, 6)

    vel = jnp.einsum("cid,d->ci", Jc, qvel)                 # (ncon, 6)
    pos6 = jnp.concatenate(
        [(dist - margin)[:, None], jnp.zeros((ncon, 5), dtype)], axis=1
    )
    aref_con = -B[:, None] * vel - (Kstiff * d_imp)[:, None] * pos6
    # inactive candidate slots carry sentinel distances (1e9): zero their
    # aref so no 1e12-scale garbage enters z = J a - aref (masked later,
    # but float32 squares of such sentinels overflow)
    aref_con = jnp.where(con_active[:, None], aref_con, 0.0)

    dim_mask = jnp.arange(6)[None, :] < condim[:, None]     # (ncon, 6)
    sqrt_ir = float(np.sqrt(impratio))
    mu_tilde = (mu1 / sqrt_ir).astype(dtype)
    scale = jnp.concatenate(
        [jnp.ones((ncon, 1), dtype), (mu / mu1[:, None]) * sqrt_ir], axis=1
    ).astype(dtype)
    fscale = scale

    if sel is None or static_cd is not None:
        # static per-slot condim: emit only condim_c rows per contact
        # (compact row map) — nearly halves every J-sized matmul in the
        # solver; with condim pools this also applies to the top-K path
        cd = np.asarray(
            layout.con_condim if static_cd is None else static_cd
        )
        row_con = tuple(int(c) for c in range(ncon) for _ in range(cd[c]))
        row_dim = tuple(int(i) for c in range(ncon) for i in range(cd[c]))
        rc = np.asarray(row_con)
        rd = np.asarray(row_dim)
        Js.append(Jc[rc, rd])
        arefs.append(aref_con[rc, rd])
        Rs.append(Rcon[rc, rd])
        flosses.append(jnp.zeros(len(rc), dtype))
        actives.append(con_active[rc])
    else:
        row_con = row_dim = None
        Js.append(Jc.reshape(ncon * 6, m.nv))
        arefs.append(aref_con.reshape(-1))
        Rs.append(Rcon.reshape(-1))
        flosses.append(jnp.zeros(ncon * 6, dtype))
        actives.append((con_active[:, None] & dim_mask).reshape(-1))

    R_all = jnp.concatenate(Rs)
    return Efc(
        J=jnp.concatenate(Js),
        aref=jnp.concatenate(arefs),
        R=R_all,
        D=1.0 / R_all,
        floss=jnp.concatenate(flosses),
        active=jnp.concatenate(actives),
        con_active=con_active,
        con_dist=dist,
        con_pos=pos,
        con_frame=frame,
        con_mu_tilde=mu_tilde,
        con_scale=scale,
        con_fscale=fscale,
        con_dim_mask=dim_mask,
        con_sel=sel,
        con_Rn=R0,
        con_overflow=overflow.astype(jnp.int32),
        row_con=row_con,
        row_dim=row_dim,
        pool_dims=pool_dims,
        nf=nf,
        nl=nl,
    )


# ---------------------------------------------------------------------------
# batch-LAST assemble dispatch (shared rule: physics/dispatch.py)
# ---------------------------------------------------------------------------

import weakref as _weakref

from .dispatch import batch_last, blast_enabled

_ASM_CORE: "_weakref.WeakKeyDictionary[EfcLayout, object]" = (
    _weakref.WeakKeyDictionary()
)


def assemble_auto(m, layout, table, kin, qpos, qvel, terrain=None):
    """assemble with the env batch on the TPU lane axis under vmap — the
    narrowphase geometry math, packed gathers and J-row einsums all carry
    the batch on the 128-lane minor dimension instead of leaving 3/6/9-
    wide trailing dims padded to full tiles.  QTPU_ASM_BLAST: 1 on, 0
    off; default on for TPU/GPU, off on CPU."""
    if not blast_enabled("QTPU_ASM_BLAST"):
        return assemble(m, layout, table, kin, qpos, qvel, terrain=terrain)
    core = _ASM_CORE.get(layout)
    if core is None:
        core = batch_last(
            lambda k, q, v, t: assemble(
                m, layout, table, k, q, v, terrain=t if t else None
            )
        )
        _ASM_CORE[layout] = core
    return core(kin, qpos, qvel, terrain if terrain is not None else {})
