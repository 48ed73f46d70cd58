"""Pallas TPU megakernel for the batched Newton constraint solve.

This is the hot op of the whole framework: 10 physics substeps x N Newton
iterations per env control step (reference equivalent: MuJoCo's Newton
solver inside mj_step, SURVEY.md C13).  The XLA/vmap formulation puts the
env batch on axis 0 and leaves the MXU/VPU idle on (nefc, 18)-shaped
per-env matrices; this kernel flips the layout so the ENV BATCH rides the
128-wide lane axis and every operation is a full-width VPU op.

Layout rules (all chosen so Mosaic never relayouts mid-loop):

  * grid over env blocks of BLK=128 (lane-exact); every per-env scalar is
    a (1, 128) vector, every row-vector a (rows, 128) tile
  * rows are segmented 8-aligned: [friction pad 16 | limits pad 16 |
    contact rows DIM-MAJOR (6 blocks of K, K padded to a multiple of 4)],
    so every segment slice starts on a sublane-tile boundary
  * contact math runs on (6, K, B) dim-major arrays: normal/tangent
    splits are leading-axis slices (free), never tiled-dim slices
  * row reductions go tile-wise: (rows, B) -> (rows/8, 8, B) (the exact
    tile decomposition, a free reshape) -> leading-axis sum -> one clean
    zero-offset (8, B) reduction.  Mosaic rejects offset-layout
    multi_reductions and a halving tree of odd slices relayouts per level.
  * J / M lane slices for the matvecs are hoisted out of the Newton
    fori_loop explicitly (computed once, reused every iteration)
  * float32 robustness mirrors physics/solver.py: failed-pivot detection
    via the last Cholesky diagonal, a 1e-3*maxdiag Levenberg retry, a
    zeroed step if both factorizations fail, and NaN-safe argmin

The numerics live in `newton_core`, a pure batch-last jnp function shared
by the kernel body and the CPU tests (pallas interpret mode,
QTPU_KERNEL_ON_CPU=1), so tests/test_ops.py pins the exact same code
against the oracle-verified single-env path without a TPU.  Only the
padded contact layout (row_con is None: ncon x 6 rows) is supported — the
env always compiles that layout when max_contacts (top-K) is set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128          # env block = lane width
_N_LADDER = 16     # 4.0 * 0.5^k, k=0..15 (matches solver._LS_ALPHAS)
_SHIFT = 1e-3      # Levenberg retry scale (x maxdiag) on failed Cholesky
_NF2 = 16          # friction row segment (8-aligned pad)
_NL2 = 16          # limit row segment
_BASE = _NF2 + _NL2


def _s2(x):
    """Reduce (rows, B) -> (1, B) tile-wise (see module docstring)."""
    n = x.shape[0]
    if n % 8:
        x = jnp.concatenate(
            [x, jnp.zeros((8 - n % 8,) + x.shape[1:], x.dtype)], axis=0
        )
        n = x.shape[0]
    if n > 8:
        x = jnp.sum(x.reshape(n // 8, 8, x.shape[-1]), axis=0)
    return jnp.sum(x, axis=0, keepdims=True)


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


def newton_core(
    M, qs, warm, J, aref, D, R, floss, active,
    scale6, fscale6, maskd6, conact, Rn, mu,
    *, nv, K, iterations,
):
    """Batch-LAST Newton solve on plain jnp arrays, kernel row layout.

    Shapes: M (nv,nv,B), qs/warm (nv,B), J (ne2,nv,B) with the segmented
    8-aligned row layout (ne2 = 32 + 6K), row vectors (ne2,B), contact
    metadata dim-major (6,K,B) / (K,B).  Returns (qacc (nv,B), f (ne2,B),
    qfrc (nv,B))."""
    ne2 = _BASE + 6 * K
    B = qs.shape[-1]
    conact1 = conact[None]                              # (1, K, B)
    Rn1 = Rn[None]
    mu1 = mu[None]
    maskc6 = maskd6 * conact1                           # (6, K, B)
    Smc = scale6 * maskc6
    Jc6 = J[_BASE:].reshape(6, K, nv, B)
    ladder = [4.0 * 0.5**k for k in range(_N_LADDER)] + [0.0]

    # hoist the lane slices of the loop-invariant matrices
    Jsl = [J[:, i, :] for i in range(nv)]               # nv x (ne2, B)
    Msl = [M[:, i, :] for i in range(nv)]               # nv x (nv, B)

    def matvec(slices, x):
        acc = slices[0] * x[0:1, :]
        for i in range(1, len(slices)):
            acc = acc + slices[i] * x[i : i + 1, :]
        return acc

    def rmatvec(slices, f):
        return jnp.concatenate([_s2(s * f) for s in slices], axis=0)

    def cone(z):
        """Shared cone geometry for a row vector z (ne2, B)."""
        zc = z[_BASE:].reshape(6, K, B)
        u = -(zc * Smc) / Rn1
        u0 = u[0:1]                                     # (1, K, B)
        ut = u[1:6]                                     # (5, K, B)
        tt = u[1:2] * u[1:2]
        for d_ in range(2, 6):
            tt = tt + u[d_ : d_ + 1] * u[d_ : d_ + 1]
        t = jnp.sqrt(tt + 1e-30)
        bottom = t <= mu1 * u0
        top = mu1 * t <= -u0
        al = (u0 + mu1 * t) / (1.0 + mu1 * mu1)
        return u0, ut, tt, t, bottom, top, al

    def S_of(z):
        """Total penalty S(z) -> (1, B).  Mirrors solver._penalty_S."""
        zf = z[:_NF2]
        quad = jnp.abs(D[:_NF2] * zf) <= floss[:_NF2]
        S = _s2(
            jnp.where(
                quad, 0.5 * D[:_NF2] * zf * zf,
                floss[:_NF2] * jnp.abs(zf)
                - 0.5 * floss[:_NF2] * floss[:_NF2] * R[:_NF2],
            )
        )
        zl = z[_NF2:_BASE]
        actl = (active[_NF2:_BASE] > 0) & (zl < 0)
        S = S + _s2(jnp.where(actl, 0.5 * D[_NF2:_BASE] * zl * zl, 0.0))
        u0, ut, tt, t, bottom, top, al = cone(z)
        usq = u0 * u0 + tt
        mid_d2 = usq - al * al * (1.0 + mu1 * mu1)
        d2 = jnp.where(bottom, 0.0, jnp.where(top, usq, mid_d2))
        s_con = (0.5 * Rn1 * (usq - d2))[0]             # (K, B)
        return S + _s2(s_con)

    def penalty_fw(z):
        """Forces f(z), weights w(z), rank-1 cone rows + weights."""
        zf = z[:_NF2]
        f_unc = -D[:_NF2] * zf
        quad = jnp.abs(f_unc) <= floss[:_NF2]
        ff = jnp.clip(f_unc, -floss[:_NF2], floss[:_NF2])
        wf = jnp.where(quad, D[:_NF2], 0.0)
        zl = z[_NF2:_BASE]
        actl = (active[_NF2:_BASE] > 0) & (zl < 0)
        fl_ = jnp.where(actl, -D[_NF2:_BASE] * zl, 0.0)
        wl = jnp.where(actl, D[_NF2:_BASE], 0.0)

        u0, ut, tt, t, bottom, top, al = cone(z)
        middle = ~(bottom | top)
        phi0 = jnp.where(bottom, u0, jnp.where(top, 0.0, al))
        tdir = ut / t
        phit = jnp.where(bottom, ut, jnp.where(top, 0.0, mu1 * al * tdir))
        phi = jnp.concatenate([phi0, phit], axis=0)     # (6, K, B)
        f_con = (phi * fscale6 * maskc6).reshape(6 * K, B)

        mid_c = mu1 * al / t                            # (1, K, B)
        diag_c = jnp.where(bottom, 1.0, jnp.where(top, 0.0, mid_c))
        w_con = ((diag_c * conact1 / Rn1) * scale6 * Smc).reshape(6 * K, B)

        # rank-1 cone rows (per contact): U_e0 = (S e0)^T Jc,
        # U_n = (S nhat)^T Jc, U_v = U_e0 + mu U_n
        U_e0 = Smc[0][:, None, :] * Jc6[0]              # (K, nv, B)
        U_n = (Smc[1] * tdir[0])[:, None, :] * Jc6[1]
        for d_ in range(2, 6):
            U_n = U_n + (Smc[d_] * tdir[d_ - 1])[:, None, :] * Jc6[d_]
        U_v = U_e0 + mu1[0][:, None, :] * U_n
        is_mid = jnp.where(middle[0], 1.0, 0.0) * conact  # (K, B)
        wV0 = is_mid / ((1.0 + mu * mu) * Rn)
        wVn = -is_mid * (mid_c[0] / Rn)
        f = jnp.concatenate([ff, fl_, f_con], axis=0)
        w = jnp.concatenate([wf, wl, w_con], axis=0)
        return f, w, (U_v, U_e0, U_n), (wV0, wVn)

    eye3 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 1),
        1.0, 0.0,
    )
    ladder_j = [jnp.float32(v) for v in ladder]

    def newton_iter(_, a):
        z = matvec(Jsl, a) - aref
        f, w, (U_v, U_e0, U_n), (wV0, wVn) = penalty_fw(z)
        Mda = matvec(Msl, a - qs)
        grad = Mda - rmatvec(Jsl, f)

        # H = M + Gram over [all J rows | 3 rank-1 cone rows per contact]
        Us = jnp.concatenate([U_v, U_e0, U_n], axis=0)   # (3K, nv, B)
        wU = jnp.concatenate([wV0, wVn, wVn], axis=0)    # (3K, B)
        Usl = [Us[:, i, :] for i in range(nv)]
        cols = [[None] * nv for _ in range(nv)]
        for i in range(nv):
            Ji_w = Jsl[i] * w
            Ui_w = Usl[i] * wU
            for j2 in range(i, nv):
                hij = _s2(Ji_w * Jsl[j2]) + _s2(Ui_w * Usl[j2])
                cols[i][j2] = hij
                cols[j2][i] = hij
        H = jnp.stack(
            [jnp.concatenate(cols[i], axis=0) for i in range(nv)], axis=0
        ) + M + 1e-10 * eye3                            # (nv, nv, B)
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

        Jd = matvec(Jsl, delta)
        Md = matvec(Msl, delta)
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
    z = matvec(Jsl, a) - aref
    f, _w, _U, _wV = penalty_fw(z)
    return a, f, rmatvec(Jsl, f)


def _make_kernel(nv, K, iterations):
    def kernel(
        M_ref, qs_ref, warm_ref, J_ref, aref_ref, D_ref, R_ref, floss_ref,
        active_ref, scale_ref, fscale_ref, maskd_ref, conact_ref, Rn_ref,
        mu_ref, qacc_ref, f_ref, qfrc_ref,
    ):
        qacc, f, qfrc = newton_core(
            M_ref[:], qs_ref[:], warm_ref[:], J_ref[:], aref_ref[:],
            D_ref[:], R_ref[:], floss_ref[:], active_ref[:], scale_ref[:],
            fscale_ref[:], maskd_ref[:], conact_ref[:], Rn_ref[:],
            mu_ref[:], nv=nv, K=K, iterations=iterations,
        )
        qacc_ref[:] = qacc
        f_ref[:] = f
        qfrc_ref[:] = qfrc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nv", "nf", "nl", "K", "iterations", "interpret")
)
def newton_solve_batched(
    M, qacc_smooth, warmstart, J, aref, D, R, floss, active,
    con_scale, con_fscale, con_dim_mask, con_active, con_Rn, con_mu,
    *, nv, nf, nl, K, iterations, interpret=False,
):
    """Batched Newton solve.  All array args are batch-FIRST (B, ...) in
    the assembler's row order ([friction nf | limits nl | contacts
    contact-major Kx6]) and float32; returns (qacc (B,nv), f (B, ne),
    qfrc (B,nv)) in the same row order.

    Internally rows are permuted to the kernel's segmented 8-aligned
    dim-major layout and B is padded to a multiple of BLK=128 (edge
    padding, so padded lanes factor cleanly)."""
    assert nf <= _NF2 and nl <= _NL2, (nf, nl)
    ne = nf + nl + 6 * K
    B = qacc_smooth.shape[0]
    Bp = -(-B // BLK) * BLK
    Kp = -(-K // 4) * 4                     # 6*Kp multiple of 8 -> aligned
    ne2 = _BASE + 6 * Kp

    # static row permutation: kernel row r2 <- assembler row perm[r2]
    perm = np.zeros(ne2, np.int32)
    valid = np.zeros(ne2, np.float32)
    perm[:nf] = np.arange(nf)
    valid[:nf] = 1.0
    perm[_NF2 : _NF2 + nl] = nf + np.arange(nl)
    valid[_NF2 : _NF2 + nl] = 1.0
    for d in range(6):
        rows = _BASE + d * Kp + np.arange(K)
        perm[rows] = nf + nl + np.arange(K) * 6 + d     # contact-major -> dim-major
        valid[rows] = 1.0
    inv = np.zeros(ne, np.int32)
    inv[perm[valid > 0]] = np.where(valid > 0)[0]
    perm_j = jnp.asarray(perm)
    valid_j = jnp.asarray(valid)
    inv_j = jnp.asarray(inv)

    def prep(x, fill=0.0, kpad=None):
        x = jnp.asarray(x, jnp.float32)
        if kpad is not None and Kp != K:
            pad = [(0, 0)] * x.ndim
            pad[kpad] = (0, Kp - K)
            x = jnp.pad(x, pad, constant_values=fill)
        if Bp != B:
            x = jnp.pad(
                x, [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1), mode="edge"
            )
        return jnp.moveaxis(x, 0, -1)  # batch-last

    def prep_rows(x):
        """(B, ne) -> (ne2, Bp) in kernel row order (pads zeroed)."""
        x = jnp.asarray(x, jnp.float32)
        x = jnp.take(x, perm_j, axis=1) * valid_j[None, :]
        return prep(x)

    Jp = jnp.take(jnp.asarray(J, jnp.float32), perm_j, axis=1) \
        * valid_j[None, :, None]

    args = [
        prep(M), prep(qacc_smooth), prep(warmstart), prep(Jp),
        prep_rows(aref), prep_rows(D), prep_rows(R), prep_rows(floss),
        prep_rows(active.astype(jnp.float32)),
        # contact metadata -> dim-major (6, K, B)
        jnp.moveaxis(prep(con_scale, kpad=1), 1, 0),
        jnp.moveaxis(prep(con_fscale, kpad=1), 1, 0),
        jnp.moveaxis(prep(con_dim_mask.astype(jnp.float32), kpad=1), 1, 0),
        prep(con_active.astype(jnp.float32), kpad=1),
        prep(con_Rn, fill=1.0, kpad=1),
        prep(con_mu, fill=0.1, kpad=1),
    ]

    kernel = _make_kernel(nv, Kp, iterations)
    grid = (Bp // BLK,)

    def spec(*lead):
        nlead = len(lead)
        return pl.BlockSpec(
            lead + (BLK,),
            (lambda i, _n=nlead: (0,) * _n + (i,)),
            memory_space=pltpu.VMEM,
        )

    out_shape = [
        jax.ShapeDtypeStruct((nv, Bp), jnp.float32),   # qacc
        jax.ShapeDtypeStruct((ne2, Bp), jnp.float32),  # f (kernel rows)
        jax.ShapeDtypeStruct((nv, Bp), jnp.float32),   # qfrc
    ]
    qacc, f, qfrc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec(nv, nv), spec(nv), spec(nv), spec(ne2, nv), spec(ne2),
            spec(ne2), spec(ne2), spec(ne2), spec(ne2), spec(6, Kp),
            spec(6, Kp), spec(6, Kp), spec(Kp), spec(Kp), spec(Kp),
        ],
        out_specs=[spec(nv), spec(ne2), spec(nv)],
        out_shape=out_shape,
        interpret=interpret,
    )(*args)

    post = lambda x: jnp.moveaxis(x, -1, 0)[:B]
    f = jnp.take(post(f), inv_j, axis=1)               # back to assembler rows
    return post(qacc), f, post(qfrc)
