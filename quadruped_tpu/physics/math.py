"""Quaternion and spatial-vector algebra for the TPU physics pipeline.

All functions are pure, dtype-polymorphic (float32 on TPU, float64 in CPU
parity tests) and written to be `vmap`/`jit` friendly: no data-dependent
Python control flow, static shapes only.

Conventions (verified against MuJoCo 3.10 numerically):
  * quaternions are (w, x, y, z), unit norm
  * a free joint's linear velocity is expressed in the WORLD frame,
    its angular velocity in the BODY frame; the quaternion is integrated
    as q' = q (x) exp(0.5 * omega_body * dt)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product u (x) v for (w,x,y,z) quaternions."""
    w1, x1, y1, z1 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    w2, x2, y2, z2 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (body->world if q is body orientation)."""
    w = q[..., :1]
    u = q[..., 1:]
    # v' = v + 2*w*(u x v) + 2*(u x (u x v))
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """3x3 rotation matrix from quaternion (body->world)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_integrate(q: jax.Array, omega_body: jax.Array, dt) -> jax.Array:
    """Integrate quaternion by body-frame angular velocity, MuJoCo-style.

    q' = normalize(q (x) exp(0.5 * omega * dt)) computed with an exact
    axis-angle exponential (matches mju_quatIntegrate).
    """
    angle = jnp.linalg.norm(omega_body, axis=-1) * dt
    # safe normalize of axis
    n = jnp.linalg.norm(omega_body, axis=-1, keepdims=True)
    axis = omega_body / jnp.maximum(n, 1e-12)
    dq = axis_angle_to_quat(axis, angle)
    return quat_normalize(quat_mul(q, dq))


def quat_from_z_to(v: jax.Array) -> jax.Array:
    """Quaternion rotating +z onto unit vector v (used for fromto geoms)."""
    z = jnp.asarray([0.0, 0.0, 1.0], dtype=v.dtype)
    c = jnp.sum(z * v, axis=-1)
    ax = jnp.cross(z, v)
    s = jnp.linalg.norm(ax, axis=-1)
    axis = ax / jnp.maximum(s, 1e-12)
    # fallback for v ~ -z: rotate pi about x
    axis = jnp.where(s[..., None] < 1e-12, jnp.asarray([1.0, 0.0, 0.0], v.dtype), axis)
    angle = jnp.arctan2(s, c)
    return axis_angle_to_quat(axis, angle)


def skew(v: jax.Array) -> jax.Array:
    """3x3 cross-product (skew-symmetric) matrix."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


# ----------------------------------------------------------------------------
# Spatial (6D) vector algebra, Featherstone convention: motion = [omega; v],
# force = [torque; force], expressed in a common frame.
# ----------------------------------------------------------------------------


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial motion cross product  v x m  (both motion vectors)."""
    w, vl = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vl, mw)], axis=-1
    )


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product  v x* f  (motion x force)."""
    w, vl = v[..., :3], v[..., 3:]
    ft, ff = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, ft) + jnp.cross(vl, ff), jnp.cross(w, ff)], axis=-1
    )


def euler_from_quat(q: jax.Array):
    """Roll/pitch/yaw from quaternion; mirrors reference
    go1_mujoco_env.py:1017-1037 (euler_from_quaternion)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    t0 = 2.0 * (w * x + y * z)
    t1 = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(t0, t1)
    t2 = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(t2)
    t3 = 2.0 * (w * z + x * y)
    t4 = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(t3, t4)
    return roll, pitch, yaw


def chol_factor(A: jax.Array) -> jax.Array:
    """Lower-Cholesky of a small static-size SPD matrix, unrolled.

    jnp.linalg.cholesky lowers to a loop-based custom call that is very
    slow when vmapped on TPU (measured ~15 ms/substep at 4096 envs inside
    integrate, tools/profile_phases.py); this right-looking rank-1 sweep
    is ~n fused VPU ops instead.  Same algorithm as ops/newton._cholesky,
    expressed batch-anywhere (works on (..., n, n))."""
    n = A.shape[-1]
    rows = jnp.arange(n)
    cols = []
    for j in range(n):
        pivot = jax.lax.rsqrt(A[..., j, j])
        col = A[..., :, j] * pivot[..., None]
        col = jnp.where(rows >= j, col, 0.0)
        cols.append(col)
        A = A - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def chol_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L L^T x = b with unrolled forward/back substitution
    (companion of chol_factor; see its TPU rationale)."""
    n = L.shape[-1]
    y = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[k]
        y.append(s / L[..., i, i])
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)
