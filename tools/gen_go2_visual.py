"""Generate the bundled Go2 visual model (VERDICT r4 missing #4).

Go2 is this framework's beyond-reference robot (BASELINE config 4): the
asset is authored from published dimensions (tools/gen_go2_assets.py), so
— unlike Go1 — there are no source STLs anywhere to decimate.  This tool
synthesizes smooth visual meshes directly from the collision envelope:

  * box geoms   -> superellipsoids (rounded boxes)
  * capsules    -> cylinder shell + hemispherical caps
  * cylinders   -> cylinder shell + flat caps
  * spheres     -> UV spheres

one merged mesh per BODY (each geom's mesh pre-transformed by the geom's
pos/quat into the body frame), written to
quadruped_tpu/assets/go2_visual.npz with a body -> (mesh, quat) placement
map — the same bundle format viz/render.py consumes for Go1, so Go2/rough
videos render with smooth shaded meshes instead of flat collision
primitives (reference video bar: train.py:53-61 'tracking' camera).

Usage:  python tools/gen_go2_visual.py
"""

from __future__ import annotations

import io
import json
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = os.path.join(ROOT, "quadruped_tpu", "assets", "go2_torque.json")
OUT = os.path.join(ROOT, "quadruped_tpu", "assets", "go2_visual.npz")

# mjtGeom codes used by the spec JSON
SPHERE, CAPSULE, CYLINDER, BOX = 2, 3, 5, 6


def quat_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def superellipsoid(a, b, c, power=3.5, n_u=20, n_v=14):
    u = np.linspace(-np.pi, np.pi, n_u, endpoint=False)
    v = np.linspace(-np.pi / 2, np.pi / 2, n_v)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    e = 2.0 / power
    sp = lambda x, p: np.sign(x) * np.abs(x) ** p
    x = a * sp(np.cos(vv), e) * sp(np.cos(uu), e)
    y = b * sp(np.cos(vv), e) * sp(np.sin(uu), e)
    z = c * sp(np.sin(vv), e)
    verts = np.stack([x, y, z], -1).reshape(-1, 3)
    faces = []
    for i in range(n_u):
        for j in range(n_v - 1):
            i2 = (i + 1) % n_u
            q = [i * n_v + j, i2 * n_v + j, i2 * n_v + j + 1, i * n_v + j + 1]
            faces += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
    return verts, np.asarray(faces, np.int64)


def rod(r, half, caps="round", n_u=16, n_cap=5):
    """Capsule (round caps) or cylinder (flat caps) along local z."""
    th = np.linspace(0, 2 * np.pi, n_u, endpoint=False)
    rings = []
    if caps == "round":
        phis = np.linspace(-np.pi / 2, 0, n_cap)
        for p in phis[:-1]:
            rings.append((r * np.cos(p), -half + r * np.sin(p)))
        rings.append((r, -half))
        rings.append((r, half))
        for p in phis[:-1][::-1]:
            rings.append((r * np.cos(p), half - r * np.sin(p)))
        bot, top = (0, -half - r), (0, half + r)
    else:
        rings = [(0.0, -half), (r, -half), (r, half), (0.0, half)]
        bot, top = (0, -half), (0, half)
    verts = [np.array([0, 0, bot[1]])]
    for rr, z in rings:
        for t in th:
            verts.append(np.array([rr * np.cos(t), rr * np.sin(t), z]))
    verts.append(np.array([0, 0, top[1]]))
    verts = np.asarray(verts)
    faces = []
    nb = len(verts) - 1
    for k in range(n_u):  # bottom fan
        faces.append([0, 1 + (k + 1) % n_u, 1 + k])
    for ring in range(len(rings) - 1):
        base = 1 + ring * n_u
        for k in range(n_u):
            a, b = base + k, base + (k + 1) % n_u
            faces += [[a, b, b + n_u], [a, b + n_u, a + n_u]]
    base = 1 + (len(rings) - 1) * n_u
    for k in range(n_u):  # top fan
        faces.append([nb, base + k, base + (k + 1) % n_u])
    return verts, np.asarray(faces, np.int64)


def uv_sphere(r, n_u=14, n_v=10):
    v, f = rod(r, 0.0, caps="round", n_u=n_u, n_cap=max(3, n_v // 2))
    return v, f


def geom_mesh(g):
    t, size = g["type"], g["size"]
    if t == BOX:
        return superellipsoid(size[0] * 1.02, size[1] * 1.02, size[2] * 1.02)
    if t == CAPSULE:
        return rod(size[0] * 1.02, size[1], caps="round")
    if t == CYLINDER:
        return rod(size[0] * 1.02, size[1], caps="flat")
    if t == SPHERE:
        return uv_sphere(size[0] * 1.05)
    return None


def body_aabb(geoms):
    """Union AABB (body frame) of a body's primitive geoms."""
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for g in geoms:
        t, size = g["type"], np.asarray(g["size"])
        R = quat_mat(g.get("quat", [1, 0, 0, 0]))
        p = np.asarray(g.get("pos", [0, 0, 0]))
        if t == BOX:
            half = np.abs(R) @ size
        elif t in (CAPSULE, CYLINDER):
            axis = R[:, 2] * size[1]
            half = np.abs(axis) + size[0]
        else:  # sphere
            half = np.full(3, size[0])
        lo = np.minimum(lo, p - half)
        hi = np.maximum(hi, p + half)
    return lo, hi


def main():
    spec = json.load(open(SPEC))
    names = [b["name"] for b in spec["bodies"]]
    per_body: dict[str, list] = {}
    raw_geoms: dict[str, list] = {}
    for g in spec["geoms"]:
        bi = g["body"]
        if bi == 0:  # world (floor)
            continue
        raw_geoms.setdefault(names[bi], []).append(g)
        vf = geom_mesh(g)
        if vf is None:
            continue
        v, f = vf
        R = quat_mat(g.get("quat", [1, 0, 0, 0]))
        v = v @ R.T + np.asarray(g.get("pos", [0, 0, 0]))
        per_body.setdefault(names[bi], []).append((v, f))

    # trunk: one enclosing superellipsoid over all its geoms (box + side
    # cylinders + face plate) instead of per-geom shells — the per-geom
    # form leaves the face plate floating 0.13 m ahead of the box; the
    # union hull reads as the Go2's forward-protruding head silhouette
    if "trunk" in raw_geoms:
        lo, hi = body_aabb(raw_geoms["trunk"])
        c, half = (lo + hi) / 2, (hi - lo) / 2
        v, f = superellipsoid(*half, power=3.0, n_u=28, n_v=18)
        per_body["trunk"] = [(v + c, f)]

    out, placements = {}, {}
    total = 0
    for body, parts in per_body.items():
        verts, faces, off = [], [], 0
        for v, f in parts:
            verts.append(v)
            faces.append(f + off)
            off += len(v)
        v = np.concatenate(verts).astype(np.float32)
        f = np.concatenate(faces).astype(np.int32)
        mesh = f"{body}_vis"
        out[f"{mesh}_v"], out[f"{mesh}_f"] = v, f
        placements[body] = (mesh, (1, 0, 0, 0))
        total += len(f)
        print(f"{body:10s}: {len(parts)} geoms -> {len(f):4d} tris")

    out["placements"] = np.frombuffer(
        json.dumps(placements).encode(), dtype=np.uint8
    )
    buf = io.BytesIO()
    np.savez_compressed(buf, **out)
    with open(OUT, "wb") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {OUT}: {os.path.getsize(OUT)/1024:.0f} KiB, {total} tris")


if __name__ == "__main__":
    main()
