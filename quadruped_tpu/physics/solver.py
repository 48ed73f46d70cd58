"""Primal Newton solver for MuJoCo-style soft constraints.

Minimizes over qacc:
    Phi(a) = 1/2 ||a - a_smooth||^2_M  +  sum_i s_i(J a - aref)
where s_i is the convex constraint penalty
    s_i(z) = max_{f in K} [ -f z - 1/2 f R f ]
evaluated in closed form per constraint class:
  * dof friction rows: Huber (force clamped to +-frictionloss)
  * joint limits / frictionless contacts: one-sided quadratic
  * elliptic friction cones: analytic projection in scaled coordinates
    where the cone is circular with mu_tilde = mu1/sqrt(impratio)

Each Newton step solves an 18x18 SPD system (batched Cholesky — ideal for
TPU: the batch over envs is the parallel axis, no scatter/gather, no
dynamic shapes), followed by a parallel-candidate line search.

This replaces MuJoCo's Newton solver (reference dependency C13; option
cone="elliptic" impratio="100", go1_torque.xml:4).  Accuracy is pinned by
tests/test_constraint.py against mjData.qacc/efc_force.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mjcf.model import PhysicsModel
from .constraint import Efc

# geometric line-search ladder (+ 0 appended in solve): factor-2 spacing
# from 4 down to ~1e-4, refined by parabolic interpolation around the best
# candidate.  A coarse ladder (the round-1 version had min alpha 0.02)
# stalls in stiff deep-penetration states: the Newton step overshoots, every
# candidate increases Phi, and the solver freezes short of the optimum.
# line-search ladder (matches ops/newton.py; QTPU_LS_RUNGS trades
# line-search resolution for solve speed — A/B drift table in PLAN.md)
import os as _os

_LS_ALPHAS = tuple(
    4.0 * float(_os.environ.get("QTPU_LS_RATIO", "0.5")) ** k
    for k in range(int(_os.environ.get("QTPU_LS_RUNGS", "16")))
)


_EXPAND_CACHE: dict[tuple, tuple] = {}


def _expand_rows(efc: Efc, zrows: jax.Array, ncon: int) -> jax.Array:
    """Compact contact rows -> padded (..., ncon, 6) (masked dims zero).

    Expressed as a static masked GATHER (inverse row map), not a scatter:
    this runs once per line-search candidate in the solver hot loop, and
    TPU scatters lower to slow sort-based kernels."""
    if efc.row_con is None:
        return zrows.reshape(zrows.shape[:-1] + (ncon, 6))
    key = (efc.row_con, efc.row_dim, ncon)
    if key not in _EXPAND_CACHE:
        inv = np.zeros((ncon, 6), np.int32)
        msk = np.zeros((ncon, 6), bool)
        for r, (c, d) in enumerate(zip(efc.row_con, efc.row_dim)):
            inv[c, d] = r
            msk[c, d] = True
        _EXPAND_CACHE[key] = (inv, msk)
    inv, msk = _EXPAND_CACHE[key]
    gathered = zrows[..., jnp.asarray(inv.reshape(-1))]
    gathered = gathered.reshape(zrows.shape[:-1] + (ncon, 6))
    return jnp.where(jnp.asarray(msk), gathered, 0.0)


def _compact_rows(efc: Efc, padded: jax.Array, ncon: int) -> jax.Array:
    """Padded (..., ncon, 6) -> compact contact rows."""
    if efc.row_con is None:
        return padded.reshape(padded.shape[:-2] + (ncon * 6,))
    rc = jnp.asarray(efc.row_con)
    rd = jnp.asarray(efc.row_dim)
    return padded[..., rc, rd]



def _penalty_S(efc: Efc, z: jax.Array) -> jax.Array:
    """Total penalty S(z) only — the lean line-search evaluator.

    No forces, no Hessian, no scatter writes; broadcasts over leading axes
    of z so all line-search candidates evaluate in one fused pass."""
    dtype = z.dtype
    nf, nl = efc.nf, efc.nl
    ncon = efc.con_dist.shape[0]
    S = jnp.zeros(z.shape[:-1], dtype)

    if nf:
        zf = z[..., :nf]
        D, R, fl = efc.D[:nf], efc.R[:nf], efc.floss[:nf]
        quad = jnp.abs(D * zf) <= fl
        S = S + jnp.sum(
            jnp.where(quad, 0.5 * D * zf * zf,
                      fl * jnp.abs(zf) - 0.5 * fl * fl * R),
            axis=-1,
        )
    if nl:
        sl = slice(nf, nf + nl)
        zl = z[..., sl]
        D = efc.D[sl]
        act = efc.active[sl] & (zl < 0)
        S = S + jnp.sum(jnp.where(act, 0.5 * D * zl * zl, 0.0), axis=-1)
    if ncon:
        zc = _expand_rows(efc, z[..., nf + nl :], ncon)
        Rn = efc.con_Rn
        mask = efc.con_dim_mask.astype(dtype) * efc.con_active[:, None].astype(dtype)
        u = -(zc * efc.con_scale * mask) / Rn[:, None]
        u0 = u[..., 0]
        tt = jnp.sum(u[..., 1:] * u[..., 1:], axis=-1)
        t = jnp.sqrt(tt + 1e-30)
        mu = efc.con_mu_tilde
        bottom = t <= mu * u0
        top = mu * t <= -u0
        usq = u0 * u0 + tt
        alpha = (u0 + mu * t) / (1.0 + mu * mu)
        # |u - Pu|^2: 0 in bottom; |u|^2 in top; middle: dist to cone
        mid_d2 = usq - alpha * alpha * (1.0 + mu * mu)
        d2 = jnp.where(bottom, 0.0, jnp.where(top, usq, mid_d2))
        s_con = 0.5 * Rn * (usq - d2)
        S = S + jnp.sum(s_con * efc.con_active.astype(dtype), axis=-1)
    return S


def _penalty(efc: Efc, z: jax.Array, want_hess: bool = False):
    """Per-row force f(z), total penalty S(z), diagonal weights w(z) for the
    simple rows, and (if want_hess) the cone-Hessian factorization
    (w_con (ncon,6), V3 (ncon,3,6), wV (ncon,3)) such that

        H = M + J^T diag(w) J
              + sum_c Jc^T [ S diag-part S + S (sum_v wV_v v v^T) S ] Jc / Rn

    i.e. the exact 6x6 cone Hessian decomposed into per-row diagonal
    weights plus THREE rank-1 directions per contact.  The decomposition
    lets the solver fold everything into ONE Gram contraction over an
    extended row set — per-contact 6x6 batched matmuls pad the MXU to ~2%
    utilization and dominated solve time.

    Derivation (middle-of-cone case, mu = mu_tilde, v = e0 + mu*nhat):
        dP = v v^T / (1+mu^2) + (mu*alpha/t) (I - e0 e0^T - nhat nhat^T)
    bottom: dP = I (pure diagonal);  top: dP = 0.

    Broadcasts over leading axes of z: the line search evaluates all step
    candidates in ONE call with z of shape (n_alphas, nefc)."""
    dtype = z.dtype
    nf, nl = efc.nf, efc.nl
    ncon = efc.con_dist.shape[0]
    f = jnp.zeros_like(z)
    w = jnp.zeros_like(z)
    B = None
    S = jnp.zeros(z.shape[:-1], dtype)

    # ---- dof friction rows (always active) ----------------------------------
    if nf:
        zf = z[..., :nf]
        D = efc.D[:nf]
        R = efc.R[:nf]
        fl = efc.floss[:nf]
        f_unc = -D * zf
        quad = jnp.abs(f_unc) <= fl
        ff = jnp.clip(f_unc, -fl, fl)
        sf = jnp.where(quad, 0.5 * D * zf * zf, fl * jnp.abs(zf) - 0.5 * fl * fl * R)
        f = f.at[..., :nf].set(ff)
        w = w.at[..., :nf].set(jnp.where(quad, D, 0.0))
        S = S + jnp.sum(sf, axis=-1)

    # ---- joint limit rows ----------------------------------------------------
    if nl:
        sl = slice(nf, nf + nl)
        zl = z[..., sl]
        D = efc.D[sl]
        act = efc.active[sl] & (zl < 0)
        fl_ = jnp.where(act, -D * zl, 0.0)
        f = f.at[..., sl].set(fl_)
        w = w.at[..., sl].set(jnp.where(act, D, 0.0))
        S = S + jnp.sum(jnp.where(act, 0.5 * D * zl * zl, 0.0), axis=-1)

    # ---- elliptic contact blocks ----------------------------------------------
    if ncon:
        zc = _expand_rows(efc, z[..., nf + nl :], ncon)
        Rn = efc.con_Rn
        mask = efc.con_dim_mask.astype(dtype) * efc.con_active[:, None].astype(dtype)
        zeta = zc * efc.con_scale * mask
        u = -zeta / Rn[:, None]
        u0 = u[..., 0]
        ut = u[..., 1:]
        t = jnp.sqrt(jnp.sum(ut * ut, axis=-1) + 1e-30)
        mu = efc.con_mu_tilde
        bottom = t <= mu * u0
        top = mu * t <= -u0
        middle = ~(bottom | top)

        alpha = (u0 + mu * t) / (1.0 + mu * mu)
        phi0 = jnp.where(bottom, u0, jnp.where(top, 0.0, alpha))
        tdir = ut / t[..., None]
        phit = jnp.where(
            bottom[..., None], ut,
            jnp.where(top[..., None], 0.0, (mu * alpha)[..., None] * tdir),
        )
        phi = jnp.concatenate([phi0[..., None], phit], axis=-1)
        # penalty 1/2 Rn (|u|^2 - |u - phi|^2)
        du = u - phi
        s_con = 0.5 * Rn * (
            jnp.sum(u * u, axis=-1) - jnp.sum(du * du, axis=-1)
        )
        S = S + jnp.sum(s_con * efc.con_active.astype(dtype), axis=-1)

        f_con = phi * efc.con_fscale * mask
        f = f.at[..., nf + nl :].set(_compact_rows(efc, f_con, ncon))

        if want_hess:
            # cone Hessian B = S dP S / Rn decomposed as diagonal + 3 rank-1
            # (see docstring).  Row-diagonal part per dim d:
            #   bottom: S_d^2 / Rn ;  middle: (mu alpha / t) S_d^2 / Rn
            act = efc.con_active.astype(dtype)
            mid_c = (mu * alpha / t)
            diag_c = jnp.where(bottom, 1.0, jnp.where(top, 0.0, mid_c))
            Sm = efc.con_scale * mask
            w_con = (diag_c * act / Rn)[:, None] * Sm * Sm     # (ncon, 6)

            # rank-1 directions (middle case only): +vv^T/(1+mu^2) and
            # -(mu alpha/t)(e0 e0^T + nhat nhat^T), all conjugated by S/√Rn
            nhat = jnp.concatenate(
                [jnp.zeros((ncon, 1), dtype), tdir], axis=1
            )
            e0 = jnp.zeros((ncon, 6), dtype).at[:, 0].set(1.0)
            v = e0 + mu[:, None] * nhat
            V3 = jnp.stack([v, e0, nhat], axis=1) * Sm[:, None, :]  # (ncon,3,6)
            is_mid = (middle & efc.con_active).astype(dtype)
            wV = jnp.stack(
                [
                    is_mid / ((1.0 + mu * mu) * Rn),
                    -is_mid * mid_c / Rn,
                    -is_mid * mid_c / Rn,
                ],
                axis=1,
            )                                                   # (ncon, 3)
            # fold the diagonal part into the simple-row weights directly
            w = w.at[..., nf + nl :].set(_compact_rows(efc, w_con, ncon))
            B = (V3, wV)

    return f, S, w, B


def solve(
    m: PhysicsModel,
    M: jax.Array,
    qacc_smooth: jax.Array,
    efc: Efc,
    warmstart: jax.Array | None = None,
    iterations: int | None = None,
):
    """Newton iterations; returns (qacc, qfrc_constraint, contact_force).

    Dispatch: called un-vmapped this runs the XLA single-env path below
    (the oracle-parity configuration).  Under jax.vmap — i.e. in every
    batched training/bench rollout — a custom_vmap rule reroutes the
    whole Newton loop to the Pallas lane-batched megakernel
    (ops/newton.py) when the layout/dtype allow, which is the difference
    between idle and saturated VPU lanes at large env batches."""
    iters = iterations if iterations is not None else m.opt.iterations
    a0 = qacc_smooth if warmstart is None else warmstart
    return _solver_core(m, iters)(M, qacc_smooth, a0, efc)


# Keyed on the live model object (WeakKeyDictionary), NOT id(m): an id can
# be reused by a new model after the old one is collected, which would
# silently return a core closed over the dead model's constants (ADVICE r1).
# Known limitation (here and in the _FK/_SMOOTH/_ASM/_CFRC core caches):
# the cached closure itself references the key model, so entries are only
# collectable together with the closure — in practice they live for the
# process, bounded by the number of distinct models built.
import weakref

_CORE_CACHE: "weakref.WeakKeyDictionary[PhysicsModel, dict]" = (
    weakref.WeakKeyDictionary()
)


def _solver_core(m: PhysicsModel, iters: int):
    per_model = _CORE_CACHE.setdefault(m, {})
    key = iters
    if key not in per_model:
        from jax import custom_batching

        @custom_batching.custom_vmap
        def core(M, qacc_smooth, a0, efc):
            return _solve_single(m, M, qacc_smooth, efc, a0, iters)

        @core.def_vmap
        def _rule(axis_size, in_batched, M, qacc_smooth, a0, efc):
            args = (M, qacc_smooth, a0, efc)
            flat, treedef = jax.tree.flatten(args)
            flat_b = jax.tree.leaves(in_batched)
            flat = [
                x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
                for x, b in zip(flat, flat_b)
            ]
            M_, qs_, a0_, efc_ = jax.tree.unflatten(treedef, flat)
            ncon = efc_.con_dist.shape[-1]
            import os

            # On CPU the kernel only runs under the (slow) pallas
            # interpreter — useful for pinning kernel numerics in tests
            # (QTPU_KERNEL_ON_CPU=1) but wrong for real CPU work like the
            # virtual-mesh multichip dryrun, which takes the compiled
            # vmap fallback instead.
            cpu_ok = os.environ.get("QTPU_KERNEL_ON_CPU") == "1"
            use_kernel = (
                (efc_.row_con is None or efc_.pool_dims is not None)
                and ncon > 0
                and qs_.dtype == jnp.float32
                and (jax.default_backend() != "cpu" or cpu_ok)
            )
            if use_kernel:
                from ..ops.newton import newton_solve_batched

                nv = qs_.shape[-1]
                qacc, f, qfrc = newton_solve_batched(
                    M_, qs_, a0_, efc_.J, efc_.aref, efc_.D, efc_.R,
                    efc_.floss, efc_.active, efc_.con_scale,
                    efc_.con_fscale, efc_.con_dim_mask, efc_.con_active,
                    efc_.con_Rn, efc_.con_mu_tilde,
                    nv=nv, nf=efc_.nf, nl=efc_.nl, K=ncon,
                    iterations=iters,
                    interpret=jax.default_backend() == "cpu",
                    pool_dims=efc_.pool_dims,
                )
                nfl = efc_.nf + efc_.nl
                # compact contact rows -> padded (B, ncon, 6) force view
                con_force = _expand_rows(efc_, f[:, nfl:], ncon)
                out = (qacc, qfrc, con_force)
            else:
                out = jax.vmap(
                    lambda Mx, qx, ax, ex: _solve_single(
                        m, Mx, qx, ex, ax, iters
                    )
                )(M_, qs_, a0_, efc_)
            return out, jax.tree.map(lambda _: True, out)

        per_model[key] = core
    return per_model[key]


def _solve_single(
    m: PhysicsModel,
    M: jax.Array,
    qacc_smooth: jax.Array,
    efc: Efc,
    warmstart: jax.Array,
    iterations: int,
):
    """Single-env XLA Newton solve (oracle-exact reference path)."""
    dtype = qacc_smooth.dtype
    nv = qacc_smooth.shape[0]
    iters = iterations
    prec = jax.lax.Precision(
        {"default": "default", "high": "high", "highest": "highest"}[
            m.opt.solver_precision
        ]
    )
    a0 = warmstart
    eye = jnp.eye(nv, dtype=dtype) * 1e-10

    ncon = efc.con_dist.shape[0]
    nfl = efc.nf + efc.nl
    if ncon:
        # static row -> (contact, dim) map for gathering rank-1 coefficients
        if efc.row_con is None:
            rc = np.repeat(np.arange(ncon), 6)
            rd = np.tile(np.arange(6), ncon)
        else:
            rc = np.asarray(efc.row_con)
            rd = np.asarray(efc.row_dim)
        # constant one-hot (ncon, nrows): segment-sum rows by contact
        oh_con = np.zeros((ncon, len(rc)), np.float32)
        oh_con[rc, np.arange(len(rc))] = 1.0
        oh_con_j = jnp.asarray(oh_con, dtype)
        rc_j = jnp.asarray(rc)
        rd_j = jnp.asarray(rd)

    def body(_, a):
        z = jnp.einsum("ei,i->e", efc.J, a, precision=prec) - efc.aref
        f, S, w, B = _penalty(efc, z, want_hess=True)
        grad = M @ (a - qacc_smooth) - jnp.einsum(
            "ei,e->i", efc.J, f, precision=prec
        )
        if ncon:
            # rank-1 cone rows: U[c,v,:] = sum_d V3[c,v,d] Jc[c,d,:],
            # computed as ONE (ncon, nrows) x (nrows, 3*nv) matmul over the
            # compact row axis — no per-contact tiny matmuls
            V3, wV = B
            coef = V3[rc_j, :, rd_j]                    # (nrows, 3)
            Jw = coef[:, :, None] * efc.J[nfl:][:, None, :]  # (nrows,3,nv)
            U = jnp.einsum(
                "cr,rk->ck", oh_con_j, Jw.reshape(len(rc), 3 * nv),
                precision=prec,
            ).reshape(ncon * 3, nv)
            rows = jnp.concatenate([efc.J, U], axis=0)
            wts = jnp.concatenate([w, wV.reshape(ncon * 3)])
        else:
            rows, wts = efc.J, w
        H = M + jnp.einsum(
            "ei,e,ej->ij", rows, wts, rows, precision=prec
        ) + eye
        # float32 robustness: the exact cone Hessian is PSD, but its
        # rank-1 decomposition accumulates cancellation error ~eps*|w|max
        # that can push the smallest eigenvalue slightly negative in stiff
        # contact states -> NaN Cholesky.  Detect it (the last pivot
        # depends on every prior one, so one isfinite check suffices) and
        # retry with a Levenberg shift of 1e-3 * maxdiag — far above the
        # observed eps-scale deficit, far below the dominant curvature.
        L = jnp.linalg.cholesky(H)
        bad = ~jnp.isfinite(L[-1, -1])
        shift = 1e-3 * jnp.max(jnp.diagonal(H)) * jnp.eye(nv, dtype=dtype)
        L2 = jnp.linalg.cholesky(H + shift)
        L = jnp.where(bad, L2, L)
        delta = -jax.scipy.linalg.cho_solve((L, True), grad)
        # last-ditch: if the shifted factorization still failed, take no
        # step this iteration (alpha * NaN is NaN even at alpha=0)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, 0.0)

        Jd = jnp.einsum("ei,i->e", efc.J, delta, precision=prec)
        Md = M @ delta
        qa = 0.5 * jnp.dot(delta, Md)
        qb = jnp.dot(delta, M @ (a - qacc_smooth))

        # evaluate all line-search candidates in one lean batched pass
        alphas = jnp.asarray(_LS_ALPHAS + (0.0,), dtype)
        z_cand = z[None, :] + alphas[:, None] * Jd[None, :]
        S_cand = _penalty_S(efc, z_cand)
        phis = alphas * qb + alphas * alphas * qa + S_cand
        # NaN candidates (e.g. a non-finite delta surviving both Cholesky
        # attempts) must lose the argmin: XLA's argmin-over-NaN semantics
        # differ between CPU and TPU, and on TPU a NaN winner poisons qacc.
        # The alpha=0 candidate is always finite, so the solver stalls one
        # iteration instead of exploding.
        phis = jnp.where(jnp.isnan(phis), jnp.inf, phis)
        best = jnp.argmin(phis)
        a_best = alphas[best]
        phi_best = phis[best]

        # parabolic refinement through the best candidate and its ladder
        # neighbours (factor-2 spacing): phi is piecewise-smooth in alpha,
        # so the vertex of the interpolating parabola is near the true 1D
        # minimum; one extra penalty evaluation guards monotonicity.
        nl_ = len(_LS_ALPHAS)
        il = jnp.clip(best, 1, nl_ - 1)  # exclude the appended 0 candidate
        a_lo, a_mid, a_hi = alphas[il - 1], alphas[il], alphas[il + 1]
        p_lo, p_mid, p_hi = phis[il - 1], phis[il], phis[il + 1]
        d_lo = (p_lo - p_mid) / jnp.maximum(a_lo - a_mid, 1e-30)
        d_hi = (p_mid - p_hi) / jnp.where(
            jnp.abs(a_mid - a_hi) > 0, a_mid - a_hi, 1e-30
        )
        curv = (d_lo - d_hi) / jnp.maximum(a_lo - a_hi, 1e-30)
        vertex = 0.5 * (a_lo + a_mid) - 0.5 * d_lo / jnp.where(
            curv > 1e-30, curv, 1e30
        )
        vertex = jnp.clip(vertex, 0.0, alphas[0])
        S_v = _penalty_S(efc, z + vertex * Jd)
        phi_v = vertex * qb + vertex * vertex * qa + S_v
        alpha = jnp.where(phi_v < phi_best, vertex, a_best)
        return a + alpha * delta

    # unrolled python loop: lets XLA software-pipeline across iterations
    # (fori_loop serializes on this platform)
    a = a0
    for _i in range(iters):
        a = body(_i, a)
    z = jnp.einsum("ei,i->e", efc.J, a, precision=prec) - efc.aref
    f, _, _, _ = _penalty(efc, z)
    qfrc_constraint = jnp.einsum("ei,e->i", efc.J, f, precision=prec)
    con_force = _expand_rows(efc, f[nfl:], ncon)
    return a, qfrc_constraint, con_force
