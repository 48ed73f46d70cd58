"""Static-shape collision detection.

The candidate contact set is fixed at compile time: every geom pair that can
collide (contype/conaffinity mask, same-body and parent-child exclusion —
MuJoCo's filtering rules) contributes a fixed number of candidate contacts
per narrowphase type (sphere-plane 1, capsule-plane 2, cylinder-plane 4,
box-plane 8, convex-convex 1).  At runtime every candidate produces a
(dist, pos, normal) triple and an `active = dist < includemargin` mask —
no dynamic shapes, so the whole thing vmaps over thousands of envs and
feeds a fixed-size constraint system.

Pair parameter combination follows MuJoCo: higher-priority geom wins all
params; on equal priority condim = max, friction = elementwise max,
solref/solimp = solmix-weighted mean, margin/gap = sum (oracle-verified).

Replaces MuJoCo's broadphase + narrowphase (reference dependency C13:
soft foot contacts solimp="0.015 1 0.031" condim=6, go1_torque.xml:63-67).

Known deviation: cylinders act as capsules against non-plane geoms
(self-collision pairs in biped mode only; all plane contacts — everything
the rewards read on flat terrain — use exact MuJoCo narrowphase).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..mjcf.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_PLANE,
    GEOM_SPHERE,
    PhysicsModel,
)

_MJMINVAL = 1e-15


@dataclasses.dataclass(eq=False)
class ContactGroup:
    """Candidates of one narrowphase type (static metadata, numpy)."""

    kind: str                 # "plane_sphere", "plane_capsule", ...
    geom1: np.ndarray         # (npair,) int — geom1 is the plane for plane_*
    geom2: np.ndarray
    body1: np.ndarray
    body2: np.ndarray
    cand_per_pair: int

    # combined contact params, one row per pair
    condim: np.ndarray        # (npair,) int
    friction: np.ndarray      # (npair, 5)
    solref: np.ndarray        # (npair, 2)
    solimp: np.ndarray        # (npair, 5)
    margin: np.ndarray        # (npair,)
    includemargin: np.ndarray  # (npair,)

    @property
    def ncand(self) -> int:
        return len(self.geom1) * self.cand_per_pair


@dataclasses.dataclass(eq=False)
class CollisionTable:
    groups: list[ContactGroup]

    @property
    def ncand(self) -> int:
        return sum(g.ncand for g in self.groups)

    def cand_meta(self, field) -> np.ndarray:
        """Per-candidate static metadata, concatenated across groups."""
        out = []
        for g in self.groups:
            v = getattr(g, field)
            out.append(np.repeat(v, g.cand_per_pair, axis=0))
        return np.concatenate(out, axis=0)


def _combine_pair(m: PhysicsModel, g1: int, g2: int) -> dict:
    """MuJoCo contact parameter combination for a geom pair."""
    p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
    if p1 != p2:
        w = g1 if p1 > p2 else g2
        condim = int(m.geom_condim[w])
        friction3 = m.geom_friction[w]
        solref = m.geom_solref[w]
        solimp = m.geom_solimp[w]
    else:
        condim = int(max(m.geom_condim[g1], m.geom_condim[g2]))
        friction3 = np.maximum(m.geom_friction[g1], m.geom_friction[g2])
        mix = m.geom_solmix[g1] / max(
            m.geom_solmix[g1] + m.geom_solmix[g2], _MJMINVAL
        )
        solref = mix * m.geom_solref[g1] + (1 - mix) * m.geom_solref[g2]
        solimp = mix * m.geom_solimp[g1] + (1 - mix) * m.geom_solimp[g2]
    margin = float(m.geom_margin[g1] + m.geom_margin[g2])
    gap = float(m.geom_gap[g1] + m.geom_gap[g2])
    friction5 = np.array(
        [friction3[0], friction3[0], friction3[1], friction3[2], friction3[2]]
    )
    return dict(
        condim=condim,
        friction=friction5,
        solref=solref,
        solimp=solimp,
        margin=margin,
        includemargin=margin - gap,
    )


def _collide_mask(m: PhysicsModel, g1: int, g2: int) -> bool:
    b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
    if b1 == b2:
        return False
    # parent-child exclusion (unless parent is world)
    if m.body_parentid[b2] == b1 and b1 != 0:
        return False
    if m.body_parentid[b1] == b2 and b2 != 0:
        return False
    t1 = int(m.geom_contype[g1]) & int(m.geom_conaffinity[g2])
    t2 = int(m.geom_contype[g2]) & int(m.geom_conaffinity[g1])
    return bool(t1 or t2)


_CAND_PER_KIND = {
    "plane_sphere": 1,
    "plane_capsule": 2,
    "plane_cylinder": 4,
    "plane_box": 8,
    "sphere_sphere": 1,
    "sphere_capsule": 1,
    "sphere_cylinder": 1,
    "capsule_capsule": 1,
    "capsule_cylinder": 1,
    "cylinder_cylinder": 1,
    "sphere_box": 1,
    "capsule_box": 2,
}


def build_table(m: PhysicsModel, mode: str = "plane") -> CollisionTable:
    """Build the static candidate table.

    mode="plane": only geom-vs-plane pairs (flat-terrain quadruped training;
    matches every contact the reference rewards observe on flat ground).
    mode="full": adds robot self-collision pairs (biped mode needs these for
    the self_collision / unwanted_contact costs, go1_mujoco_env.py:269-312).
    """
    planes = [i for i in range(m.ngeom) if m.geom_type[i] == GEOM_PLANE]
    others = [i for i in range(m.ngeom) if m.geom_type[i] != GEOM_PLANE]

    def kind_of(t1, t2):
        names = {
            GEOM_SPHERE: "sphere",
            GEOM_CAPSULE: "capsule",
            GEOM_CYLINDER: "cylinder",
            GEOM_BOX: "box",
        }
        return names[t1], names[t2]

    buckets: dict[str, list] = {}

    def add(kind, g1, g2):
        buckets.setdefault(kind, []).append((g1, g2))

    for p in planes:
        for g in others:
            if not _collide_mask(m, p, g):
                continue
            tname = kind_of(m.geom_type[g], m.geom_type[g])[0]
            add(f"plane_{tname}", p, g)

    if mode == "full":
        order = {
            GEOM_SPHERE: 0, GEOM_CAPSULE: 1, GEOM_CYLINDER: 2, GEOM_BOX: 3,
        }
        for i, ga in enumerate(others):
            for gb in others[i + 1 :]:
                if not _collide_mask(m, ga, gb):
                    continue
                p1, p2 = ga, gb
                t1, t2 = int(m.geom_type[p1]), int(m.geom_type[p2])
                if order[t1] > order[t2]:
                    p1, p2, t1, t2 = p2, p1, t2, t1
                if t1 == GEOM_SPHERE and t2 == GEOM_CYLINDER:
                    kind = "sphere_cylinder"  # exact narrowphase
                elif t1 == GEOM_CAPSULE and t2 == GEOM_CYLINDER:
                    kind = "capsule_cylinder"  # separation-exact hybrid
                elif t1 == GEOM_CYLINDER and t2 == GEOM_CYLINDER:
                    kind = "cylinder_cylinder"
                else:
                    # remaining cylinder pairs approximated as capsules
                    # (MuJoCo uses MPR there; documented deviation)
                    u1 = GEOM_CAPSULE if t1 == GEOM_CYLINDER else t1
                    u2 = GEOM_CAPSULE if t2 == GEOM_CYLINDER else t2
                    if order[u1] > order[u2]:
                        p1, p2, u1, u2 = p2, p1, u2, u1
                    n1, n2 = kind_of(u1, u2)
                    kind = f"{n1}_{n2}"
                if kind == "box_box":
                    continue  # no box-box pairs on the Go1
                add(kind, p1, p2)

    groups = []
    for kind, pairs in sorted(buckets.items()):
        meta = [_combine_pair(m, g1, g2) for g1, g2 in pairs]
        groups.append(
            ContactGroup(
                kind=kind,
                geom1=np.array([p[0] for p in pairs], dtype=np.int32),
                geom2=np.array([p[1] for p in pairs], dtype=np.int32),
                body1=m.geom_bodyid[[p[0] for p in pairs]].copy(),
                body2=m.geom_bodyid[[p[1] for p in pairs]].copy(),
                cand_per_pair=_CAND_PER_KIND[kind],
                condim=np.array([d["condim"] for d in meta], dtype=np.int32),
                friction=np.stack([d["friction"] for d in meta]),
                solref=np.stack([d["solref"] for d in meta]),
                solimp=np.stack([d["solimp"] for d in meta]),
                margin=np.array([d["margin"] for d in meta]),
                includemargin=np.array([d["includemargin"] for d in meta]),
            )
        )
    return CollisionTable(groups=groups)


# ---------------------------------------------------------------------------
# Narrowphase: every routine returns (dist, pos, normal) for a fixed number
# of candidates per pair; normal points from geom1 into geom2 (MuJoCo
# convention); pos is the midpoint between surfaces.
# ---------------------------------------------------------------------------


def _plane_frame(xmat):
    return xmat[..., :, 2]  # plane normal = +z column


def _plane_sphere(n, ppos, center, r):
    dist = jnp.sum(n * (center - ppos), axis=-1) - r
    pos = center - n * (r + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], jnp.broadcast_to(n[..., None, :], pos[..., None, :].shape)


def _plane_capsule(n, ppos, xpos, xmat, r, half):
    axis = xmat[..., :, 2]
    ends = jnp.stack(
        [xpos + half[..., None] * axis, xpos - half[..., None] * axis], axis=-2
    )
    dist = jnp.sum(n[..., None, :] * (ends - ppos[..., None, :]), axis=-1) - r[..., None]
    pos = ends - n[..., None, :] * (r[..., None] + 0.5 * dist)[..., None]
    normal = jnp.broadcast_to(n[..., None, :], pos.shape)
    return dist, pos, normal


def _plane_cylinder(n, ppos, xpos, xmat, r, half):
    """MuJoCo-exact plane-cylinder: 4 candidates — the deepest rim point of
    the near end disc, the matching rim point of the far disc, and the two
    near-disc rim points rotated +-120 deg about the axis.  Each candidate
    is gated downstream on its own dist < includemargin, reproducing
    MuJoCo's per-point margin checks (empirically verified against
    mj_collision over tilt/parallel/side-lying/deep-penetration states)."""
    axis = xmat[..., :, 2]
    prj = jnp.sum(n * axis, axis=-1, keepdims=True)
    # axis points toward the plane (flip if its normal projection positive).
    # Snap near-zero projections to exactly zero first: a side-lying
    # cylinder whose axis is exactly in the plane (common in the
    # fallen-start reset, where the fall rotation is about the hip axes)
    # makes the near/far disc choice a rounding coin-flip; MuJoCo's own
    # prjaxis is an exact +-0.0 there and it does NOT flip.
    prj = jnp.where(jnp.abs(prj) < 1e-6, 0.0, prj)
    flip = prj > 0
    axis = jnp.where(flip, -axis, axis)
    prj = jnp.where(flip, -prj, prj)
    # vec: in-disc direction of steepest descent toward the plane, radius r
    d = axis * prj - n
    dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
    parallel = dn < 1e-10
    d = jnp.where(parallel, xmat[..., :, 0], d / jnp.maximum(dn, 1e-12))
    vec = r[..., None] * d
    # rim points rotated +-120 deg about the (unit, flipped) axis:
    # R(+-120) vec = -vec/2 +- (sqrt(3)/2) axis x vec   (axis . vec = 0)
    axv = jnp.cross(axis, vec)
    s3 = jnp.sqrt(jnp.asarray(3.0, vec.dtype)) * 0.5
    vec_p = -0.5 * vec + s3 * axv
    vec_m = -0.5 * vec - s3 * axv
    ax_h = half[..., None] * axis
    pts = jnp.stack(
        [
            xpos + ax_h + vec,      # near-disc deepest rim point
            xpos - ax_h + vec,      # far-disc rim point (side-lying)
            xpos + ax_h + vec_p,    # near-disc rim, +120 deg
            xpos + ax_h + vec_m,    # near-disc rim, -120 deg
        ],
        axis=-2,
    )
    dist = jnp.sum(n[..., None, :] * (pts - ppos[..., None, :]), axis=-1)
    pos = pts - n[..., None, :] * (0.5 * dist)[..., None]
    normal = jnp.broadcast_to(n[..., None, :], pos.shape)
    return dist, pos, normal


def _plane_box(n, ppos, xpos, xmat, size):
    """MuJoCo-exact plane-box: 8 corner candidates in MuJoCo's enumeration
    order (x sign fastest, starting all-negative), but a corner is a contact
    only if it lies on the lower half of the box along the plane normal
    (ldist <= 0) and at most 4 corners are emitted — replicated here by
    poisoning the distance of excluded corners (empirically verified against
    mj_collision incl. deep-penetration states where MuJoCo caps at 4)."""
    corners = jnp.asarray(
        [
            [(-1, 1)[(i >> 0) & 1], (-1, 1)[(i >> 1) & 1], (-1, 1)[(i >> 2) & 1]]
            for i in range(8)
        ],
        dtype=xpos.dtype,
    )  # (8, 3), MuJoCo corner order
    rel = jnp.einsum("...ij,...cj->...ci", xmat, corners * size[..., None, :])
    pts = xpos[..., None, :] + rel
    ldist = jnp.sum(n[..., None, :] * rel, axis=-1)
    dist = jnp.sum(n[..., None, :] * (pts - ppos[..., None, :]), axis=-1)
    lower = ldist <= 0
    # first 4 lower-half corners in enumeration order (ties at ldist==0)
    rank = jnp.cumsum(lower.astype(jnp.int32), axis=-1) - 1
    keep = lower & (rank < 4)
    dist = jnp.where(keep, dist, jnp.asarray(1e10, dist.dtype))
    pos = pts - n[..., None, :] * (0.5 * dist)[..., None]
    pos = jnp.where(keep[..., None], pos, pts)
    normal = jnp.broadcast_to(n[..., None, :], pos.shape)
    return dist, pos, normal


def _sphere_sphere(p1, r1, p2, r2):
    d = p2 - p1
    dn = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dn, 1e-12)[..., None]
    dist = dn - (r1 + r2)
    pos = p1 + n * (r1 + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], n[..., None, :]


def _closest_on_segment(a_pos, a_axis, a_half, p):
    t = jnp.sum((p - a_pos) * a_axis, axis=-1)
    t = jnp.clip(t, -a_half, a_half)
    return a_pos + t[..., None] * a_axis


def _sphere_capsule(pc, r1, cpos, cmat, r2, half):
    axis = cmat[..., :, 2]
    q = _closest_on_segment(cpos, axis, half, pc)
    return _sphere_sphere(pc, r1, q, r2)


def _segment_segment(p1, a1, h1, p2, a2, h2):
    """Closest points between two segments (standard clamped solve)."""
    r = p1 - p2
    A = jnp.sum(a1 * a1, axis=-1)
    B = jnp.sum(a1 * a2, axis=-1)
    C = jnp.sum(a2 * a2, axis=-1)
    D = jnp.sum(a1 * r, axis=-1)
    E = jnp.sum(a2 * r, axis=-1)
    den = A * C - B * B
    s = jnp.where(den > 1e-12, (B * E - C * D) / jnp.maximum(den, 1e-12), 0.0)
    s = jnp.clip(s, -h1, h1)
    t = jnp.clip((B * s + E) / jnp.maximum(C, 1e-12), -h2, h2)
    s = jnp.clip((B * t - D) / jnp.maximum(A, 1e-12), -h1, h1)
    return p1 + s[..., None] * a1, p2 + t[..., None] * a2


def _capsule_capsule(p1, m1, r1, h1, p2, m2, r2, h2):
    q1, q2 = _segment_segment(p1, m1[..., :, 2], h1, p2, m2[..., :, 2], h2)
    return _sphere_sphere(q1, r1, q2, r2)


def _capsule_capsule_soa(p1, m1, r1, h1, p2, m2, r2, h2):
    """Component-unrolled capsule-capsule (round 5): identical math to
    _segment_segment + _sphere_sphere, with every intermediate a 2-D
    (ncand,)-per-env array instead of (ncand, 3) — under either vmap
    layout no 3-wide axis lands on a tile dimension (the J-row unroll
    treatment, tools/asm_probe2.py: 2.7x less padded traffic).  This is
    the dominant narrowphase family (247 capsule/cylinder self-pairs on
    the Go1 full table ride it under defer_cyl).  ULP-level FMA rounding
    differences vs the vector form are possible (same bar as the J-row
    unroll; tools/drift_ab.py envelope).  QTPU_NARROW=legacy restores
    the vector form."""
    p1x, p1y, p1z = p1[..., 0], p1[..., 1], p1[..., 2]
    p2x, p2y, p2z = p2[..., 0], p2[..., 1], p2[..., 2]
    a1x, a1y, a1z = m1[..., 0, 2], m1[..., 1, 2], m1[..., 2, 2]
    a2x, a2y, a2z = m2[..., 0, 2], m2[..., 1, 2], m2[..., 2, 2]
    rx, ry, rz = p1x - p2x, p1y - p2y, p1z - p2z
    A = a1x * a1x + a1y * a1y + a1z * a1z
    Bc = a1x * a2x + a1y * a2y + a1z * a2z
    C = a2x * a2x + a2y * a2y + a2z * a2z
    D = a1x * rx + a1y * ry + a1z * rz
    E = a2x * rx + a2y * ry + a2z * rz
    den = A * C - Bc * Bc
    s = jnp.where(
        den > 1e-12, (Bc * E - C * D) / jnp.maximum(den, 1e-12), 0.0
    )
    s = jnp.clip(s, -h1, h1)
    t = jnp.clip((Bc * s + E) / jnp.maximum(C, 1e-12), -h2, h2)
    s = jnp.clip((Bc * t - D) / jnp.maximum(A, 1e-12), -h1, h1)
    q1x, q1y, q1z = p1x + s * a1x, p1y + s * a1y, p1z + s * a1z
    q2x, q2y, q2z = p2x + t * a2x, p2y + t * a2y, p2z + t * a2z
    dx, dy, dz = q2x - q1x, q2y - q1y, q2z - q1z
    dn = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    mn = jnp.maximum(dn, 1e-12)
    nx, ny, nz = dx / mn, dy / mn, dz / mn
    dist = dn - (r1 + r2)
    adv = r1 + 0.5 * dist
    px, py, pz = q1x + nx * adv, q1y + ny * adv, q1z + nz * adv
    pos = jnp.stack([px, py, pz], axis=-1)
    nn = jnp.stack([nx, ny, nz], axis=-1)
    return dist[..., None], pos[..., None, :], nn[..., None, :]


def _proj_solid_cylinder(x, cpos, cmat, r, h):
    """Euclidean projection of point x onto a solid cylinder (identity for
    interior points)."""
    axis = cmat[..., :, 2]
    rel = x - cpos
    z = jnp.sum(rel * axis, axis=-1)
    rad = rel - z[..., None] * axis
    rho = jnp.linalg.norm(rad, axis=-1)
    zc = jnp.clip(z, -h, h)
    raddir = rad / jnp.maximum(rho, 1e-12)[..., None]
    rhoc = jnp.minimum(rho, r)
    return cpos + zc[..., None] * axis + rhoc[..., None] * raddir


def _proj_solid_capsule(x, cpos, cmat, r, h):
    s = _closest_on_segment(cpos, cmat[..., :, 2], h, x)
    d = x - s
    dn = jnp.linalg.norm(d, axis=-1)
    outside = dn > r
    surf = s + d * (r / jnp.maximum(dn, 1e-12))[..., None]
    return jnp.where(outside[..., None], surf, x)


def _cylinder_hybrid(p1, m1, r1, h1, p2, m2, r2, h2, proj1, proj2):
    """Cylinder-involved pair: capsule-capsule base contact for penetration
    (MuJoCo uses MPR there — documented approximation), refined by
    alternating projections between the true solids so that SEPARATION is
    exact: the phantom hemisphere of the capsule approximation cannot
    produce false contacts."""
    d0, pos0, n0 = _capsule_capsule(p1, m1, r1, h1, p2, m2, r2, h2)
    q = p1  # start at geom1 center
    for _ in range(10):
        q2 = proj2(q)
        q = proj1(q2)
    gap_vec = q2 - q
    gap = jnp.linalg.norm(gap_vec, axis=-1)
    separated = gap > 1e-7
    n = jnp.where(
        separated[..., None],
        gap_vec / jnp.maximum(gap, 1e-12)[..., None],
        n0[..., 0, :],
    )
    pos = jnp.where(separated[..., None], 0.5 * (q + q2), pos0[..., 0, :])
    dist = jnp.where(separated, gap, d0[..., 0])
    return dist[..., None], pos[..., None, :], n[..., None, :]


def _capsule_cylinder(p1, m1, r1, h1, p2, m2, r2, h2):
    return _cylinder_hybrid(
        p1, m1, r1, h1, p2, m2, r2, h2,
        proj1=lambda x: _proj_solid_capsule(x, p1, m1, r1, h1),
        proj2=lambda x: _proj_solid_cylinder(x, p2, m2, r2, h2),
    )


def _cylinder_cylinder(p1, m1, r1, h1, p2, m2, r2, h2):
    return _cylinder_hybrid(
        p1, m1, r1, h1, p2, m2, r2, h2,
        proj1=lambda x: _proj_solid_cylinder(x, p1, m1, r1, h1),
        proj2=lambda x: _proj_solid_cylinder(x, p2, m2, r2, h2),
    )


def _closest_on_box(bpos, bmat, size, p):
    local = jnp.einsum("...ji,...j->...i", bmat, p - bpos)
    clamped = jnp.clip(local, -size, size)
    return bpos + jnp.einsum("...ij,...j->...i", bmat, clamped)


def _sphere_cylinder(pc, rs, cpos, cmat, rc, half):
    """MuJoCo-exact sphere vs solid cylinder (closest point on the solid;
    minimal-penetration face when the sphere center is inside; empirically
    verified against mj_collision on side/cap/rim/interior states)."""
    axis = cmat[..., :, 2]
    rel = pc - cpos
    z = jnp.sum(rel * axis, axis=-1)
    radial = rel - z[..., None] * axis
    rho = jnp.linalg.norm(radial, axis=-1)
    # degenerate on-axis fallback matches MuJoCo's choice (-x of the
    # cylinder frame, so the inside normal comes out +x)
    rad_dir = jnp.where(
        (rho > 1e-12)[..., None],
        radial / jnp.maximum(rho, 1e-12)[..., None],
        -cmat[..., :, 0],
    )
    inside = (jnp.abs(z) < half) & (rho < rc)

    # outside: closest point on the solid cylinder
    zc = jnp.clip(z, -half, half)
    q = cpos + zc[..., None] * axis + jnp.minimum(rho, rc)[..., None] * rad_dir
    dvec = q - pc
    dn = jnp.linalg.norm(dvec, axis=-1)
    dist_out = dn - rs
    n_out = dvec / jnp.maximum(dn, 1e-12)[..., None]

    # inside: exit through the least-penetrated face
    d_side = rho - rc
    d_cap = jnp.abs(z) - half
    side_closer = d_side >= d_cap
    sign_z = jnp.where(z >= 0, 1.0, -1.0)
    n_in = jnp.where(
        side_closer[..., None], -rad_dir, -sign_z[..., None] * axis
    )
    dist_in = jnp.maximum(d_side, d_cap) - rs

    dist = jnp.where(inside, dist_in, dist_out)
    n = jnp.where(inside[..., None], n_in, n_out)
    pos = pc + n * (rs + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], n[..., None, :]


def _sphere_box(pc, r, bpos, bmat, size):
    q = _closest_on_box(bpos, bmat, size, pc)
    d = q - pc
    dn = jnp.linalg.norm(d, axis=-1)
    # if center inside box, dn ~ 0: push out along largest-penetration axis
    n = d / jnp.maximum(dn, 1e-12)[..., None]
    dist = dn - r
    pos = pc + n * (r + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], n[..., None, :]


def _capsule_box(cpos, cmat, r, half, bpos, bmat, size):
    axis = cmat[..., :, 2]
    out_d, out_p, out_n = [], [], []
    for sgn in (1.0, -1.0):
        end = cpos + sgn * half[..., None] * axis
        # iterate closest-point between segment and box twice
        q = _closest_on_box(bpos, bmat, size, end)
        s = _closest_on_segment(cpos, axis, half, q)
        q = _closest_on_box(bpos, bmat, size, s)
        d = q - s
        dn = jnp.linalg.norm(d, axis=-1)
        n = d / jnp.maximum(dn, 1e-12)[..., None]
        dist = dn - r
        pos = s + n * (r + 0.5 * dist)[..., None]
        out_d.append(dist)
        out_p.append(pos)
        out_n.append(n)
    return (
        jnp.stack(out_d, axis=-1),
        jnp.stack(out_p, axis=-2),
        jnp.stack(out_n, axis=-2),
    )


def narrowphase(m: PhysicsModel, table: CollisionTable, kin, terrain=None,
                defer_cyl: bool = False, frames: str = "full"):
    """Run all groups; returns per-candidate (dist, pos, frame) with
    dist/pos/frame shapes (ncand,), (ncand,3), (ncand,3,3).

    frame rows are (normal, tangent1, tangent2) — mju_makeFrame-compatible.

    With `terrain` (physics/terrain.py pytree), every plane-group pair
    collides against the LOCAL TANGENT PLANE of the heightfield under the
    moving geom's center instead of the flat world plane; zero-amplitude
    terrain reproduces the plane results exactly.

    defer_cyl: skip the 10-iteration alternating-projection refinement of
    capsule_cylinder/cylinder_cylinder pairs and return the raw capsule-
    capsule approximation — the DOMINANT narrowphase cost at 4096 envs
    (round-4 probe: capsule_cylinder alone ~7 ms of the ~14 ms true
    narrowphase cost per substep, over 247 pairs).  The caller
    (constraint.assemble, pooled path) then refines only the top-K
    SELECTED slots via `refine_cylinder_slots` (12 condim-1 slots vs 247
    candidates on the Go1 table).  Sound because capsule(r,h) encloses
    cylinder(r,h): the approximation UNDERESTIMATES distance, so activity
    tests by it never miss a true contact, and the refined distance still
    decides final contact activity.

    CAVEAT (pool saturation, ADVICE r4 medium): the soundness above is
    per-candidate.  In constraint.assemble's pooled path, compaction
    keeps only the FIRST K_c active candidates per condim class in index
    order; a falsely-active cylinder candidate (capsule says active,
    refined cylinder says not) still occupies a slot, so when a pool
    SATURATES (overflow counter > 0) it can evict a genuinely active
    later contact that the refine-everything path would have kept.
    While pools have headroom the two paths are bitwise-identical
    (tests/test_defer_cyl.py); under saturation they may diverge.  The
    per-step `contact_overflow` info channel is the monitoring signal —
    nonzero overflow in a defer_cyl run means both dropped contacts AND
    possible defer/non-defer divergence; size pools up or set
    QTPU_DEFER_CYL=0 for crowded scenes.  (The false-active set cannot
    be shrunk without refining: the capsule distance is a LOWER bound on
    the cylinder distance, and excluding candidates would need an upper
    bound tighter than d_capsule + r, which only refinement provides.)"""
    gx, gm = kin.geom_xpos, kin.geom_xmat
    size = jnp.asarray(m.geom_size, gx.dtype)
    # capsule-capsule family dispatch: component-unrolled by default
    # (QTPU_NARROW=legacy restores the 3-vector form) — trace-time choice
    _ccap = (
        _capsule_capsule
        if os.environ.get("QTPU_NARROW", "soa") == "legacy"
        else _capsule_capsule_soa
    )

    def plane_of(i1, i2):
        if terrain is None:
            return _plane_frame(gm[i1]), gx[i1]
        from .terrain import local_plane

        ppos, n = local_plane(terrain, gx[i2])
        return n, ppos

    dists, poss, frames_l = [], [], []
    for g in table.groups:
        i1, i2 = g.geom1, g.geom2
        if g.kind == "plane_sphere":
            n, pp = plane_of(i1, i2)
            d, p, nn = _plane_sphere(n, pp, gx[i2], size[i2, 0])
        elif g.kind == "plane_capsule":
            n, pp = plane_of(i1, i2)
            d, p, nn = _plane_capsule(n, pp, gx[i2], gm[i2], size[i2, 0], size[i2, 1])
        elif g.kind == "plane_cylinder":
            n, pp = plane_of(i1, i2)
            d, p, nn = _plane_cylinder(n, pp, gx[i2], gm[i2], size[i2, 0], size[i2, 1])
        elif g.kind == "plane_box":
            n, pp = plane_of(i1, i2)
            d, p, nn = _plane_box(n, pp, gx[i2], gm[i2], size[i2])
        elif g.kind == "sphere_sphere":
            d, p, nn = _sphere_sphere(gx[i1], size[i1, 0], gx[i2], size[i2, 0])
        elif g.kind == "sphere_capsule":
            d, p, nn = _sphere_capsule(gx[i1], size[i1, 0], gx[i2], gm[i2], size[i2, 0], size[i2, 1])
        elif g.kind == "sphere_cylinder":
            d, p, nn = _sphere_cylinder(gx[i1], size[i1, 0], gx[i2], gm[i2], size[i2, 0], size[i2, 1])
        elif g.kind == "capsule_capsule":
            d, p, nn = _ccap(
                gx[i1], gm[i1], size[i1, 0], size[i1, 1],
                gx[i2], gm[i2], size[i2, 0], size[i2, 1],
            )
        elif g.kind in ("capsule_cylinder", "cylinder_cylinder"):
            if defer_cyl:
                # cheap pass: the capsule-capsule base approximation only
                # (the hybrid's own d0 path); refinement happens post-
                # selection in constraint.assemble
                d, p, nn = _ccap(
                    gx[i1], gm[i1], size[i1, 0], size[i1, 1],
                    gx[i2], gm[i2], size[i2, 0], size[i2, 1],
                )
            else:
                fn = (
                    _capsule_cylinder if g.kind == "capsule_cylinder"
                    else _cylinder_cylinder
                )
                d, p, nn = fn(
                    gx[i1], gm[i1], size[i1, 0], size[i1, 1],
                    gx[i2], gm[i2], size[i2, 0], size[i2, 1],
                )
        elif g.kind == "sphere_box":
            d, p, nn = _sphere_box(gx[i1], size[i1, 0], gx[i2], gm[i2], size[i2])
        elif g.kind == "capsule_box":
            d, p, nn = _capsule_box(
                gx[i1], gm[i1], size[i1, 0], size[i1, 1],
                gx[i2], gm[i2], size[i2],
            )
        else:
            raise NotImplementedError(g.kind)
        d = d.reshape(-1)
        p = p.reshape(-1, 3)
        nn = nn.reshape(-1, 3)
        if frames == "normal":
            # deferred frames (round 5): the caller builds full frames
            # only for its selected top-K slots via frame_from_normal —
            # same math on the same normal bits, so bitwise-equal while
            # skipping the tangent construction for ~17x more candidates
            frames_l.append(nn)
            dists.append(d)
            poss.append(p)
            continue
        if g.kind == "plane_capsule":
            # oracle behavior: t1 = capsule axis projected onto the plane
            # (normalized), t2 = n x t1; falls back to plane axes when the
            # axis is parallel to the normal
            axis = jnp.repeat(gm[i2][..., :, 2], g.cand_per_pair, axis=0)
            proj = axis - jnp.sum(axis * nn, axis=-1, keepdims=True) * nn
            pn = jnp.linalg.norm(proj, axis=-1, keepdims=True)
            px_fb = jnp.repeat(gm[i1][..., :, 0], g.cand_per_pair, axis=0)
            t1 = jnp.where(pn > 1e-8, proj / jnp.maximum(pn, 1e-12), px_fb)
            t2 = jnp.cross(nn, t1)
            fr = jnp.stack([nn, t1, t2], axis=-2)
        else:
            fr = make_frame(nn)
        dists.append(d)
        poss.append(p)
        frames_l.append(fr)

    dist = jnp.concatenate(dists)
    pos = jnp.concatenate(poss, axis=0)
    frame = jnp.concatenate(frames_l, axis=0)
    return dist, pos, frame


def frame_from_normal(nn, pcap, axis, px):
    """Full (K, 3, 3) contact frames from slot normals — the deferred
    counterpart of the narrowphase frame block, applied after top-K
    selection (48 slots instead of 811 candidates).

    pcap marks plane_capsule slots, whose oracle frame uses the capsule
    axis projected into the plane (axis = geom2 xmat z-column, px =
    geom1 xmat x-column fallback) — the exact expressions of the group
    loop, so the result is bit-identical to gathering precomputed
    frames."""
    base = make_frame(nn)
    proj = axis - jnp.sum(axis * nn, axis=-1, keepdims=True) * nn
    pn = jnp.linalg.norm(proj, axis=-1, keepdims=True)
    t1 = jnp.where(pn > 1e-8, proj / jnp.maximum(pn, 1e-12), px)
    t2 = jnp.cross(nn, t1)
    special = jnp.stack([nn, t1, t2], axis=-2)
    return jnp.where(pcap[:, None, None], special, base)


# deferred-refinement kind codes (constraint.EfcLayout.con_cylkind)
CYLKIND_NONE, CYLKIND_CAPCYL, CYLKIND_CYLCYL = 0, 1, 2


def refine_cylinder_slots(kin, g1, g2, r1, h1, r2, h2, kindflag,
                          dist0, pos0, n0, iters: int = 10):
    """Slot-level deferred cylinder refinement — the SAME math as
    `_cylinder_hybrid` (capsule-capsule base + 10 alternating projections
    between the true solids, separation-exact), applied AFTER top-K
    selection so it runs on K slots instead of every candidate.

    g1/g2 are per-slot geom indices ((K,), dynamic per env); r/h the
    gathered static sizes; kindflag 0/1/2 = none/capsule_cylinder/
    cylinder_cylinder (geom2 is always the cylinder for kind 1, matching
    build_table's ordering); dist0/pos0/n0 the slot's capsule-approximation
    results from the deferred narrowphase.  Non-cylinder slots pass
    through untouched."""
    p1 = kin.geom_xpos[g1]
    R1 = kin.geom_xmat[g1]
    p2 = kin.geom_xpos[g2]
    R2 = kin.geom_xmat[g2]
    is_capcyl = (kindflag == CYLKIND_CAPCYL)[..., None]
    q = p1
    q2 = p2
    for _ in range(iters):
        q2 = _proj_solid_cylinder(q, p2, R2, r2, h2)
        q = jnp.where(
            is_capcyl,
            _proj_solid_capsule(q2, p1, R1, r1, h1),
            _proj_solid_cylinder(q2, p1, R1, r1, h1),
        )
    gap_vec = q2 - q
    gap = jnp.linalg.norm(gap_vec, axis=-1)
    separated = gap > 1e-7
    n_ref = jnp.where(
        separated[..., None],
        gap_vec / jnp.maximum(gap, 1e-12)[..., None], n0,
    )
    pos_ref = jnp.where(separated[..., None], 0.5 * (q + q2), pos0)
    dist_ref = jnp.where(separated, gap, dist0)
    apply = kindflag > 0
    return (
        jnp.where(apply, dist_ref, dist0),
        jnp.where(apply[..., None], pos_ref, pos0),
        jnp.where(apply[..., None], n_ref, n0),
    )


def make_frame(n: jax.Array) -> jax.Array:
    """Right-handed frame with rows (n, t1, t2) matching mju_makeFrame
    (verified on oracle contacts): helper axis a = y-hat if |n_y| < 0.5
    else z-hat; t2 = normalize(n x a); t1 = t2 x n."""
    y = jnp.zeros_like(n).at[..., 1].set(1.0)
    z = jnp.zeros_like(n).at[..., 2].set(1.0)
    a = jnp.where((jnp.abs(n[..., 1]) < 0.5)[..., None], y, z)
    t2 = jnp.cross(n, a)
    t2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-12)
    t1 = jnp.cross(t2, n)
    return jnp.stack([n, t1, t2], axis=-2)
