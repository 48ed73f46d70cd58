"""Compare vpu vs mxu kernel solves per env/dof (interpret mode, CPU)."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np
import jax.numpy as jnp

from quadruped_tpu.env.config import Go1Config
from quadruped_tpu.env.go1 import Go1Env
from test_ops import _batch_inputs, ITERS
from quadruped_tpu.ops.newton import newton_solve_batched

for pools in (None, (8, 28, 12)):
    env = Go1Env(Go1Config(ctrl_type="torque", contact_pools=pools))
    m, M, qs, efc = _batch_inputs(env)
    warm = jnp.zeros_like(qs)
    ncon = efc.con_dist.shape[-1]
    call = lambda mode: newton_solve_batched(
        M, qs, warm, efc.J, efc.aref, efc.D, efc.R, efc.floss, efc.active,
        efc.con_scale, efc.con_fscale, efc.con_dim_mask, efc.con_active,
        efc.con_Rn, efc.con_mu_tilde,
        nv=qs.shape[-1], nf=efc.nf, nl=efc.nl, K=ncon, iterations=ITERS,
        interpret=True, pool_dims=efc.pool_dims, gram_mode=mode,
    )
    qacc_v, f_v, qfrc_v = call("vpu")
    qacc_m, f_m, qfrc_m = call("mxu")
    a, b = np.asarray(qacc_v), np.asarray(qacc_m)
    scale = 1.0 + np.abs(a).max()
    d = np.abs(a - b) / scale
    print(f"pools={pools}")
    for i in range(a.shape[0]):
        print(f"  env {i}: max normalized qacc diff {d[i].max():.2e}  "
              f"bad@5e-3: {int((d[i] > 5e-3).sum())}/18")
