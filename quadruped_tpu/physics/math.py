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
