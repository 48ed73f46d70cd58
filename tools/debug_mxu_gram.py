"""Isolate the MXU-packed Gram math (ops/newton.py) in pure jnp.

Computes H = J^T diag(w) J per env two ways on random data:
  vpu:  einsum reference
  mxu:  the packed-lane pipeline with jnp.roll standing in for pltpu.roll
and prints the worst per-env per-entry error.  Run on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

import sys

sys.path.insert(0, ".")
from quadruped_tpu.ops.newton import _grp_of, _ngroups, _mxu_consts, _pack_groups

nv = 18
ne = 40
B = 128

rng = np.random.default_rng(0)
J = rng.normal(size=(B, ne, nv)).astype(np.float32)
w = rng.uniform(0.0, 2.0, size=(ne, B)).astype(np.float32)

# reference
H_ref = np.einsum("bri,rb,brj->bij", J, w, J)

# packed
grp, G = _grp_of(nv), _ngroups(nv)
E, W0, maskY = _mxu_consts(nv)
Jpack = np.asarray(_pack_groups(jnp.asarray(J), nv))  # (G, ne, 128)

Hc = np.zeros((nv, nv * 128), np.float32)
for g in range(G):
    Jp = Jpack[g]                       # (ne, 128)
    Wp = w @ E[g]                       # (ne, 128)
    Gg = Jp.T @ (Wp * Jp)               # (128, 128)
    Yg = np.zeros((nv, 128), np.float32)
    for e in range(grp):
        Yg += Gg[nv * e : nv * e + nv, :] * maskY[e : e + 1, :]
    HHg = Yg @ W0                       # (nv, nv*128)
    Hc += np.roll(HHg, grp * g, axis=1)

H_mxu = np.stack([Hc[:, 128 * j : 128 * (j + 1)] for j in range(nv)], axis=1)
H_mxu = np.transpose(H_mxu, (2, 0, 1))  # (B, nv, nv)

err = np.abs(H_mxu - H_ref)
rel = err / (1.0 + np.abs(H_ref))
print("max abs err:", err.max(), "max rel:", rel.max())
bad = np.argwhere(rel > 1e-3)
print("bad entries:", len(bad))
if len(bad):
    envs = sorted(set(bad[:, 0].tolist()))
    print("bad envs:", envs[:40])
    b, i, j = bad[0]
    print("first bad:", b, i, j, H_mxu[b, i, j], H_ref[b, i, j])
