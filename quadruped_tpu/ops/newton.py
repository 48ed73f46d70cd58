"""Pallas TPU megakernel for the batched Newton constraint solve.

This is the hot op of the whole framework: 10 physics substeps x N Newton
iterations per env control step (reference equivalent: MuJoCo's Newton
solver inside mj_step, SURVEY.md C13).  The XLA/vmap formulation puts the
env batch on axis 0 and leaves the MXU/VPU idle on (nefc, 18)-shaped
per-env matrices; this kernel flips the layout so the ENV BATCH rides the
128-wide lane axis and every operation is a full-width VPU op:

  * grid over env blocks of BLK=128 (lane-exact); every per-env scalar is
    a (1, 128) vector, every row-vector a (rows, 128) tile
  * J (nefc, nv, BLK) stays resident in VMEM across ALL Newton iterations
    and line-search evaluations: zero HBM traffic inside the solve
  * the Newton loop is a lax.fori_loop (compile-once); the 18x18 Cholesky
    is an unrolled right-looking rank-1 sweep over (nv, nv, BLK) tiles
  * float32 robustness mirrors physics/solver.py: failed-pivot detection
    via the last Cholesky diagonal, a 1e-3*maxdiag Levenberg retry, a
    zeroed step if both factorizations fail, and NaN-safe argmin

The numerics are shared with the non-pallas world through `newton_core`,
a pure batch-last jnp function: the pallas kernel body just reads refs,
calls it, and writes refs, so tests (tests/test_ops.py) can pin the exact
same code against the oracle-verified single-env path without a TPU.
Two contact layouts are supported: the padded uniform layout (row_con is
None: ncon x 6 rows) and condim row pools (pool_dims set: per-condim-class
top-K slots emitting only condim rows each — ~2x fewer Gram rows at equal
contact capacity on the Go1 full-collision table).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128          # env block = lane width
# Line-search ladder: SHARED with the XLA solver (single source — both
# read QTPU_LS_RUNGS/QTPU_LS_RATIO at physics.solver import; reading the
# env twice at different import times could silently diverge the kernel
# from the reference path that tests pin it against).  Trimming the
# ladder was measured and rejected: PLAN.md drift table.
from ..physics.solver import _LS_ALPHAS as _LADDER_ALPHAS

_N_LADDER = len(_LADDER_ALPHAS)
_SHIFT = 1e-3      # Levenberg retry scale (x maxdiag) on failed Cholesky


def _s2(x):
    """Reduce (rows, B) -> (1, B) as a halving tree of static-slice adds.

    Mosaic rejects vector.multi_reduction(ADD) over sublane dims whose
    layout carries a nonzero offset (common after row slicing), so the
    reduction is expressed purely with elementwise adds."""
    n = x.shape[0]
    while n > 1:
        h = n // 2
        y = x[:h] + x[h : 2 * h]
        if n % 2:
            if h == 1:
                y = y + x[2 * h :]
            else:
                y = jnp.concatenate([y[0:1] + x[2 * h :], y[1:]], axis=0)
        x = y
        n = h
    return x


def _matvec(J, x):
    """(rows, nv, B) x (nv, B) -> (rows, B); unrolled FMA over nv."""
    nv = J.shape[1]
    acc = J[:, 0, :] * x[0:1, :]
    for i in range(1, nv):
        acc = acc + J[:, i, :] * x[i : i + 1, :]
    return acc


def _rmatvec(J, f):
    """(rows, nv, B) x (rows, B) -> (nv, B); reduce over rows."""
    nv = J.shape[1]
    return jnp.concatenate(
        [_s2(J[:, i, :] * f) for i in range(nv)], axis=0
    )


def _cholesky(H, nv):
    """Right-looking Cholesky on (nv, nv, B); returns lower L."""
    A = H
    cols = []
    rowid = jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0)
    for j in range(nv):
        pivot = jax.lax.rsqrt(A[j : j + 1, j, :])        # (1, B)
        col = A[:, j, :] * pivot
        col = jnp.where(rowid >= j, col, 0.0)
        cols.append(col)
        A = A - col[:, None, :] * col[None, :, :]
    return jnp.stack(cols, axis=1)                       # (nv, nv, B)


def _cho_solve(L, g, nv):
    """Solve L L^T x = g for (nv, B) g with unrolled substitution."""
    y = []
    for i in range(nv):
        s = g[i : i + 1, :]
        for k in range(i):
            s = s - L[i : i + 1, k, :] * y[k]
        y.append(s / L[i : i + 1, i, :])
    x = [None] * nv
    for i in reversed(range(nv)):
        s = y[i]
        for k in range(i + 1, nv):
            s = s - L[k : k + 1, i, :] * x[k]
        x[i] = s / L[i : i + 1, i, :]
    return jnp.concatenate(x, axis=0)


def _grp_of(nv):
    """Envs per MXU pack group: nv dofs each, filling <=126 of 128 lanes."""
    return max(1, 126 // nv)


def _ngroups(nv):
    grp = _grp_of(nv)
    return -(-BLK // grp)


@functools.lru_cache(maxsize=None)
def _mxu_consts(nv):
    """One-hot selection constants for the MXU-packed Gram (PLAN lever 3).

    Layout: a pack group g holds GRP consecutive envs (e = 0..GRP-1, env
    b = GRP*g + e) with packed column c = nv*e + j for dof j — GRP*nv
    (<= 126) used lanes of 128.  Three constants drive the pipeline:

      E[g]   (128, 128): lane-broadcast   Wp = w @ E[g]
                         (per-env scalar -> that env's nv columns)
      W0     (128, nv*128): Gram-block scatter  HH = Y @ W0
                         (packed column nv*e+j -> output lane 128*j + e;
                          the +GRP*g group shift is a pltpu.roll, whose
                          tile-boundary spill only ever moves zeros:
                          GRP*g + e <= 132 and lanes >= 128 are zeroed
                          in the pack)
      maskY  (GRP, 128): lane masks [nv*e, nv*e+nv) for the block-diag
                         row compression Y = sum_e G[nv*e:nv*e+nv] * m_e
    """
    grp, G = _grp_of(nv), _ngroups(nv)
    E = np.zeros((G, 128, 128), np.float32)
    for g in range(G):
        for e in range(grp):
            b = grp * g + e
            if b < BLK:
                E[g, b, nv * e : nv * e + nv] = 1.0
    W0 = np.zeros((128, nv * 128), np.float32)
    for e in range(grp):
        for j in range(nv):
            W0[nv * e + j, 128 * j + e] = 1.0
    maskY = np.zeros((grp, 128), np.float32)
    for e in range(grp):
        maskY[e, nv * e : nv * e + nv] = 1.0
    return E, W0, maskY


def _gram_precision():
    name = os.environ.get("QTPU_GRAM_PRECISION", "highest")
    valid = ("default", "high", "highest")
    if name not in valid:
        raise ValueError(
            f"QTPU_GRAM_PRECISION={name!r}: expected one of {valid}"
        )
    return jax.lax.Precision(name)


def _pack_groups(J_bf, nv):
    """XLA-side env pack: J (B, ne, nv) -> Jpack (G, ne, B//BLK * 128).

    Jpack[g, r, 128*blk + nv*e + j] = J[128*blk + GRP*g + e, r, j]; slots
    whose env index exceeds the block (GRP*G can overhang BLK by a few)
    are zeroed so their Gram contribution vanishes instead of aliasing."""
    B, ne, nvd = J_bf.shape
    grp, G = _grp_of(nv), _ngroups(nv)
    nblk = B // BLK
    X = J_bf.reshape(nblk, BLK, ne, nvd)
    env = np.arange(G)[:, None] * grp + np.arange(grp)[None, :]  # (G, grp)
    valid = jnp.asarray((env < BLK).astype(np.float32))
    idx = jnp.asarray(np.clip(env, 0, BLK - 1).reshape(-1))
    Y = jnp.take(X, idx, axis=1).reshape(nblk, G, grp, ne, nvd)
    Y = Y * valid[None, :, :, None, None]
    Y = jnp.transpose(Y, (1, 3, 0, 2, 4))            # (G, ne, nblk, grp, nv)
    Y = Y.reshape(G, ne, nblk, grp * nvd)
    pad = 128 - grp * nvd
    if pad:
        Y = jnp.pad(Y, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return Y.reshape(G, ne, nblk * 128)


def newton_core(
    M, qs, warm, J, aref, D, R, floss, active,
    scale, fscale, maskd, conact, Rn, mu,
    *, nv, nf, nl, K, iterations, pool_dims=None, mxu=None,
):
    """Batch-LAST Newton solve on plain jnp arrays.

    Shapes: M (nv,nv,B), qs/warm (nv,B), J (ne,nv,B), row vectors (ne,B),
    contact metadata (Ktot,...,B).  Returns (qacc (nv,B), f (ne,B),
    qfrc (nv,B)).  This function is the pallas kernel body — see module
    docstring.

    pool_dims: ((K_p, dim_p), ...) condim row pools in slot/row order —
    each pool contributes K_p contacts x dim_p compact J rows, and only
    pools with friction (dim_p > 1) contribute rank-1 cone rows to the
    Hessian.  None = one uniform (K, 6) pool (the r1 layout)."""
    nfl = nf + nl
    pools = pool_dims if pool_dims is not None else ((K, 6),)
    descs = []
    row_off = con_off = 0
    for Kp, dp in pools:
        descs.append((row_off, con_off, Kp, dp))
        row_off += Kp * dp
        con_off += Kp
    ladder = list(_LADDER_ALPHAS) + [0.0]

    def cone_u(z, desc):
        """Scaled dual point u and cone-zone flags for one pool."""
        ro, co, Kp, dp = desc
        zc = z[nfl + ro : nfl + ro + Kp * dp].reshape(Kp, dp, z.shape[-1])
        # NOTE: slice-then-newaxis, never `x[a:b, None, :]` — a partial
        # slice mixed with None in one [] lowers to lax.gather, which
        # Mosaic rejects (only 2D take_along_axis gathers are supported)
        Rn2 = Rn[co : co + Kp][:, None, :]
        mu2 = mu[co : co + Kp][:, None, :]
        mk = maskd[co : co + Kp, :dp] * conact[co : co + Kp][:, None, :]
        sc = scale[co : co + Kp, :dp]
        u = -(zc * sc * mk) / Rn2
        u0 = u[:, 0:1, :]
        if dp > 1:
            ut = u[:, 1:, :]
            tt = sum(
                ut[:, d_ : d_ + 1, :] * ut[:, d_ : d_ + 1, :]
                for d_ in range(dp - 1)
            )
        else:
            ut = None
            tt = jnp.zeros_like(u0)
        t = jnp.sqrt(tt + 1e-30)
        bottom = t <= mu2 * u0
        top = mu2 * t <= -u0
        return zc, Rn2, mu2, mk, sc, u0, ut, tt, t, bottom, top

    def S_of(z):
        """Total penalty S(z) -> (1, B).  Mirrors solver._penalty_S."""
        S = 0.0
        if nf:
            zf, Df, Rf, fl = z[:nf], D[:nf], R[:nf], floss[:nf]
            quad = jnp.abs(Df * zf) <= fl
            S = S + _s2(
                jnp.where(quad, 0.5 * Df * zf * zf,
                          fl * jnp.abs(zf) - 0.5 * fl * fl * Rf)
            )
        if nl:
            zl, Dl = z[nf:nfl], D[nf:nfl]
            act = (active[nf:nfl] > 0) & (zl < 0)
            S = S + _s2(jnp.where(act, 0.5 * Dl * zl * zl, 0.0))
        for desc in descs:
            _zc, Rn2, mu2, _mk, _sc, u0, _ut, tt, t, bottom, top = cone_u(
                z, desc
            )
            usq = u0 * u0 + tt
            al = (u0 + mu2 * t) / (1.0 + mu2 * mu2)
            mid_d2 = usq - al * al * (1.0 + mu2 * mu2)
            d2 = jnp.where(bottom, 0.0, jnp.where(top, usq, mid_d2))
            s_con = 0.5 * Rn2 * (usq - d2)              # (Kp, 1, B)
            S = S + _s2(s_con[:, 0, :])
        return S

    def penalty_fw(z):
        """Forces f(z), weights w(z), rank-1 cone rows + weights."""
        f_parts, w_parts = [], []
        U_rows, wU_rows = [], []
        if nf:
            zf, Df, fl = z[:nf], D[:nf], floss[:nf]
            f_unc = -Df * zf
            quad = jnp.abs(f_unc) <= fl
            f_parts.append(jnp.clip(f_unc, -fl, fl))
            w_parts.append(jnp.where(quad, Df, 0.0))
        if nl:
            zl, Dl = z[nf:nfl], D[nf:nfl]
            act = (active[nf:nfl] > 0) & (zl < 0)
            f_parts.append(jnp.where(act, -Dl * zl, 0.0))
            w_parts.append(jnp.where(act, Dl, 0.0))
        for desc in descs:
            ro, co, Kp, dp = desc
            _zc, Rn2, mu2, mk, sc, u0, ut, tt, t, bottom, top = cone_u(
                z, desc
            )
            middle = ~(bottom | top)
            al = (u0 + mu2 * t) / (1.0 + mu2 * mu2)
            phi0 = jnp.where(bottom, u0, jnp.where(top, 0.0, al))
            mid_c = mu2 * al / t                        # (Kp, 1, B)
            diag_c = jnp.where(bottom, 1.0, jnp.where(top, 0.0, mid_c))
            fsc = fscale[co : co + Kp, :dp]
            cac = conact[co : co + Kp][:, None, :]
            if dp > 1:
                tdir = ut / t
                phit = jnp.where(
                    bottom, ut, jnp.where(top, 0.0, mu2 * al * tdir)
                )
                phi = jnp.concatenate([phi0, phit], axis=1)
            else:
                phi = phi0
            f_parts.append((phi * fsc * mk).reshape(Kp * dp, -1))
            w_con = (diag_c * cac / Rn2) * sc * sc * mk
            w_parts.append(w_con.reshape(Kp * dp, -1))

            if dp > 1:
                # rank-1 cone rows: U_e0 = (S e0)^T Jc, U_n = (S nhat)^T Jc,
                # U_v = U_e0 + mu U_n ; weights per solver._penalty docstring
                Jc = J[nfl + ro : nfl + ro + Kp * dp].reshape(
                    Kp, dp, nv, J.shape[-1]
                )
                Sm = sc * mk
                U_e0 = Sm[:, 0:1, :] * Jc[:, 0, :, :]   # (Kp, nv, B)
                U_n = (Sm[:, 1, :] * tdir[:, 0, :])[:, None, :] \
                    * Jc[:, 1, :, :]
                for d_ in range(2, dp):
                    U_n = U_n + (Sm[:, d_, :] * tdir[:, d_ - 1, :])[
                        :, None, :
                    ] * Jc[:, d_, :, :]
                U_v = U_e0 + mu2 * U_n
                is_mid = jnp.where(middle, 1.0, 0.0) * cac
                wV0 = (is_mid / ((1.0 + mu2 * mu2) * Rn2))[:, 0, :]  # (Kp,B)
                wVn = (-is_mid * mid_c / Rn2)[:, 0, :]
                U_rows += [U_v, U_e0, U_n]
                wU_rows += [wV0, wVn, wVn]
        f = jnp.concatenate(f_parts, axis=0)
        w = jnp.concatenate(w_parts, axis=0)
        return f, w, U_rows, wU_rows

    eye3 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 1),
        1.0, 0.0,
    )

    def newton_iter(_, a):
        z = _matvec(J, a) - aref
        f, w, U_rows, wU_rows = penalty_fw(z)
        Mda = _matvec(M, a - qs)
        grad = Mda - _rmatvec(J, f)

        # H = M + Gram over [all J rows | 3 rank-1 cone rows per friction
        # contact].  Two sweeps (J-part, rank-1-part) with no concatenated/
        # weighted row copies: VMEM in the kernel is tight (J is ~MB/block).
        # U_rows is empty when every pool is frictionless (dim 1) — then
        # the Hessian has no rank-1 part at all.
        have_U = bool(U_rows)
        if have_U:
            Us = jnp.concatenate(U_rows, axis=0)   # (3*K_fric, nv, B)
            wU = jnp.concatenate(wU_rows, axis=0)  # (3*K_fric, B)
        if mxu is not None:
            # MXU-packed J-part Gram (PLAN lever 3): the env batch and dof
            # index share the lane axis (GRP envs x nv dofs <= 126 lanes)
            # so J^T diag(w) J runs as matmuls instead of nv(nv+1)/2
            # VPU row-product reductions.  Rank-1 cone rows stay on the
            # VPU (their packing would cost per-iteration MXU dots that
            # outweigh their ~40% share of Gram rows).
            Jpack, E, W0, maskY = mxu
            grp, G = _grp_of(nv), _ngroups(nv)
            prec = _gram_precision()
            Hc = jnp.zeros((nv, nv * 128), jnp.float32)
            dn = (((1,), (0,)), ((), ()))
            dt = (((0,), (0,)), ((), ()))
            for g in range(G):
                Jp = Jpack[g]                                  # (ne, 128)
                Wp = jax.lax.dot_general(w, E[g], dn, precision=prec)
                Gg = jax.lax.dot_general(Jp, Wp * Jp, dt, precision=prec)
                Yg = Gg[0:nv, :] * maskY[0:1, :]
                for e in range(1, grp):
                    Yg = Yg + Gg[nv * e : nv * e + nv, :] * maskY[e : e + 1, :]
                HHg = jax.lax.dot_general(Yg, W0, dn, precision=prec)
                Hc = Hc + pltpu.roll(HHg, grp * g, axis=1)
            H = jnp.stack(
                [Hc[:, 128 * j : 128 * (j + 1)] for j in range(nv)], axis=1
            )
            if have_U:
                cols = [[None] * nv for _ in range(nv)]
                for i in range(nv):
                    Ui_w = Us[:, i, :] * wU
                    for j2 in range(i, nv):
                        hij = _s2(Ui_w * Us[:, j2, :])
                        cols[i][j2] = hij
                        cols[j2][i] = hij
                H = H + jnp.stack(
                    [jnp.concatenate(cols[i], axis=0) for i in range(nv)],
                    axis=0,
                )
        else:
            cols = [[None] * nv for _ in range(nv)]
            for i in range(nv):
                Ji_w = J[:, i, :] * w
                Ui_w = Us[:, i, :] * wU if have_U else None
                for j2 in range(i, nv):
                    hij = _s2(Ji_w * J[:, j2, :])
                    if have_U:
                        hij = hij + _s2(Ui_w * Us[:, j2, :])
                    cols[i][j2] = hij
                    cols[j2][i] = hij
            H = jnp.stack(
                [jnp.concatenate(cols[i], axis=0) for i in range(nv)], axis=0
            )
        H = H + M + 1e-10 * eye3                        # (nv, nv, B)
        diag = jnp.concatenate(
            [H[i, i : i + 1, :] for i in range(nv)], axis=0
        )

        L1 = _cholesky(H, nv)
        bad = ~jnp.isfinite(L1[nv - 1, nv - 1 : nv, :])  # (1, B)
        md = diag[0:1]
        for i_ in range(1, nv):
            md = jnp.maximum(md, diag[i_ : i_ + 1])
        shift = _SHIFT * md
        L2 = _cholesky(H + shift[None] * eye3, nv)
        L = jnp.where(bad[None], L2, L1)
        delta = -_cho_solve(L, grad, nv)
        ok = _s2(jnp.where(jnp.isfinite(delta), 0.0, 1.0)) == 0.0
        delta = jnp.where(ok, delta, 0.0)

        Jd = _matvec(J, delta)
        Md = _matvec(M, delta)
        qa = 0.5 * _s2(delta * Md)                      # (1, B)
        qb = _s2(delta * Mda)

        phis = []
        for al_k in ladder:
            Sk = S_of(z + al_k * Jd)
            pk = al_k * qb + (al_k * al_k) * qa + Sk
            phis.append(jnp.where(jnp.isnan(pk), jnp.inf, pk))

        # NaN-safe argmin over the ladder (unrolled, small)
        best_phi = phis[0]
        best_idx = jnp.zeros_like(best_phi, dtype=jnp.int32)
        for k in range(1, len(ladder)):
            take = phis[k] < best_phi
            best_phi = jnp.where(take, phis[k], best_phi)
            best_idx = jnp.where(take, k, best_idx)

        ladder_j = [jnp.float32(v) for v in ladder]

        def alpha_of(idx):
            out = jnp.zeros_like(best_phi)
            for k, v in enumerate(ladder_j):
                out = jnp.where(idx == k, v, out)
            return out

        def phi_of(idx):
            out = jnp.zeros_like(best_phi)
            for k in range(len(ladder)):
                out = jnp.where(idx == k, phis[k], out)
            return out

        a_best = alpha_of(best_idx)

        # parabolic refinement around the best ladder candidate
        il = jnp.clip(best_idx, 1, _N_LADDER - 1)
        p_lo, p_mid, p_hi = phi_of(il - 1), phi_of(il), phi_of(il + 1)
        a_lo, a_mid, a_hi = alpha_of(il - 1), alpha_of(il), alpha_of(il + 1)
        d_lo = (p_lo - p_mid) / jnp.maximum(a_lo - a_mid, 1e-30)
        d_hi = (p_mid - p_hi) / jnp.where(
            jnp.abs(a_mid - a_hi) > 0, a_mid - a_hi, 1e-30
        )
        curv = (d_lo - d_hi) / jnp.maximum(a_lo - a_hi, 1e-30)
        vertex = 0.5 * (a_lo + a_mid) - 0.5 * d_lo / jnp.where(
            curv > 1e-30, curv, 1e30
        )
        vertex = jnp.clip(vertex, 0.0, 4.0)
        S_v = S_of(z + vertex * Jd)
        phi_v = vertex * qb + vertex * vertex * qa + S_v
        alpha = jnp.where(phi_v < best_phi, vertex, a_best)
        return a + alpha * delta

    a = jax.lax.fori_loop(0, iterations, newton_iter, warm)
    z = _matvec(J, a) - aref
    f, _w, _U, _wU = penalty_fw(z)
    return a, f, _rmatvec(J, f)


def _make_kernel(nv, nf, nl, K, iterations, pool_dims=None, gram_mode="vpu"):
    def kernel(*refs):
        if gram_mode == "mxu":
            (M_ref, qs_ref, warm_ref, J_ref, aref_ref, D_ref, R_ref,
             floss_ref, active_ref, scale_ref, fscale_ref, maskd_ref,
             conact_ref, Rn_ref, mu_ref, Jpack_ref, E_ref, W0_ref,
             maskY_ref, qacc_ref, f_ref, qfrc_ref) = refs
            mxu = (Jpack_ref[:], E_ref[:], W0_ref[:], maskY_ref[:])
        else:
            (M_ref, qs_ref, warm_ref, J_ref, aref_ref, D_ref, R_ref,
             floss_ref, active_ref, scale_ref, fscale_ref, maskd_ref,
             conact_ref, Rn_ref, mu_ref, qacc_ref, f_ref, qfrc_ref) = refs
            mxu = None
        qacc, f, qfrc = newton_core(
            M_ref[:], qs_ref[:], warm_ref[:], J_ref[:], aref_ref[:],
            D_ref[:], R_ref[:], floss_ref[:], active_ref[:], scale_ref[:],
            fscale_ref[:], maskd_ref[:], conact_ref[:], Rn_ref[:],
            mu_ref[:], nv=nv, nf=nf, nl=nl, K=K, iterations=iterations,
            pool_dims=pool_dims, mxu=mxu,
        )
        qacc_ref[:] = qacc
        f_ref[:] = f
        qfrc_ref[:] = qfrc

    return kernel


def newton_solve_batched(*args, gram_mode=None, **kw):
    """Batched Newton solve.  All array args are batch-FIRST (B, ...) and
    float32; returns (qacc (B,nv), f (B,ne), qfrc (B,nv)).

    With pool_dims (((K_p, dim_p), ...)), J carries the compact pooled
    contact rows (sum K_p*dim_p) and contact metadata is (sum K_p, ...).

    gram_mode: 'vpu' (row-product reductions) or 'mxu' (packed-lane
    matmul Gram, PLAN lever 3); None reads QTPU_GRAM (default 'vpu').

    B is padded to a multiple of BLK=128 internally (edge padding so the
    padded lanes factor cleanly and cannot produce Inf/NaN spills)."""
    if gram_mode is None:
        gram_mode = os.environ.get("QTPU_GRAM", "vpu")
    return _newton_solve_jit(*args, gram_mode=gram_mode, **kw)


def _standalone_jit(fun, **jit_kw):
    """jax.jit that applies TPU_COMPILER_OPTIONS (scoped-vmem budget)
    ONLY for top-level calls — the kernel's VMEM working set at BLK=128
    exceeds the default 16 MB scoped stack, so a STANDALONE compile of
    this op (kernel benches, A/B tools) needs the same budget
    utils.tpu_jit gives the fused production programs.  When the call is
    NESTED inside an outer trace (the production solver path — tracer
    args), compiler options are omitted: JAX rejects them on nested jits,
    and the enclosing tpu_jit program already carries the budget."""
    cache = {}

    @functools.wraps(fun)
    def wrapper(*args, **kw):
        nested = any(
            isinstance(x, jax.core.Tracer)
            for x in jax.tree.leaves((args, kw))
        )
        key = (
            "plain" if nested or jax.default_backend() == "cpu" else "opts"
        )
        if key not in cache:
            from ..utils import TPU_COMPILER_OPTIONS

            opts = dict(TPU_COMPILER_OPTIONS) if key == "opts" else None
            cache[key] = jax.jit(fun, compiler_options=opts, **jit_kw)
        return cache[key](*args, **kw)

    return wrapper


@functools.partial(
    _standalone_jit,
    static_argnames=(
        "nv", "nf", "nl", "K", "iterations", "interpret", "pool_dims",
        "gram_mode",
    ),
)
def _newton_solve_jit(
    M, qacc_smooth, warmstart, J, aref, D, R, floss, active,
    con_scale, con_fscale, con_dim_mask, con_active, con_Rn, con_mu,
    *, nv, nf, nl, K, iterations, interpret=False, pool_dims=None,
    gram_mode="vpu",
):
    if pool_dims is not None:
        ne = nf + nl + sum(Kp * dp for Kp, dp in pool_dims)
        K = sum(Kp for Kp, _dp in pool_dims)
    else:
        ne = nf + nl + 6 * K
    B = qacc_smooth.shape[0]
    Bp = -(-B // BLK) * BLK

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if Bp != B:
            pad = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, pad, mode="edge")
        return jnp.moveaxis(x, 0, -1)  # batch-last

    args = [
        prep(M), prep(qacc_smooth), prep(warmstart), prep(J), prep(aref),
        prep(D), prep(R), prep(floss), prep(active.astype(jnp.float32)),
        prep(con_scale), prep(con_fscale),
        prep(con_dim_mask.astype(jnp.float32)),
        prep(con_active.astype(jnp.float32)), prep(con_Rn), prep(con_mu),
    ]

    kernel = _make_kernel(
        nv, nf, nl, K, iterations, pool_dims=pool_dims, gram_mode=gram_mode
    )
    grid = (Bp // BLK,)

    def spec(*lead):
        nlead = len(lead)
        return pl.BlockSpec(
            lead + (BLK,),
            (lambda i, _n=nlead: (0,) * _n + (i,)),
            memory_space=pltpu.VMEM,
        )

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, (lambda i, _n=nd: (0,) * _n), memory_space=pltpu.VMEM
        )

    in_specs = [
        spec(nv, nv), spec(nv), spec(nv), spec(ne, nv), spec(ne),
        spec(ne), spec(ne), spec(ne), spec(ne), spec(K, 6), spec(K, 6),
        spec(K, 6), spec(K), spec(K), spec(K),
    ]
    if gram_mode == "mxu":
        grp, G = _grp_of(nv), _ngroups(nv)
        Jpack = _pack_groups(jnp.moveaxis(args[3], -1, 0), nv)
        E, W0, maskY = (jnp.asarray(c) for c in _mxu_consts(nv))
        args += [Jpack, E, W0, maskY]
        in_specs += [
            spec(G, ne),                       # Jpack: blocked on lanes
            const_spec((G, 128, 128)),         # E
            const_spec((128, nv * 128)),       # W0
            const_spec((grp, 128)),            # maskY
        ]

    out_shape = [
        jax.ShapeDtypeStruct((nv, Bp), jnp.float32),   # qacc
        jax.ShapeDtypeStruct((ne, Bp), jnp.float32),   # f
        jax.ShapeDtypeStruct((nv, Bp), jnp.float32),   # qfrc
    ]
    qacc, f, qfrc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec(nv), spec(ne), spec(nv)],
        out_shape=out_shape,
        interpret=interpret,
    )(*args)

    post = lambda x: jnp.moveaxis(x, -1, 0)[:B]
    return post(qacc), post(f), post(qfrc)
