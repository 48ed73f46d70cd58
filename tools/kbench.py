import sys; sys.path.insert(0, "/root/repo")
import os, time, json
import jax, jax.numpy as jnp
import numpy as np
from quadruped_tpu.utils import cache as _cache
_cache.enable()
from quadruped_tpu.ops.newton import newton_solve_batched

B = int(os.environ.get("KB_B", 4096))
nv, nf, nl, K, iters = 18, 12, 12, 16, int(os.environ.get("KB_IT", 15))
ne = nf + nl + 6 * K
rng = np.random.default_rng(0)
r = lambda *s: jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
Mh = rng.normal(0, 1, (B, nv, nv)).astype(np.float32)
M = jnp.asarray(Mh @ Mh.transpose(0, 2, 1) + 3 * np.eye(nv, dtype=np.float32))
args = dict(
    M=M, qacc_smooth=r(B, nv), warmstart=r(B, nv), J=r(B, ne, nv) * 0.3,
    aref=r(B, ne), D=jnp.abs(r(B, ne)) * 100, R=jnp.abs(r(B, ne)) * 0.01,
    floss=jnp.abs(r(B, ne)), active=jnp.ones((B, ne), jnp.float32),
    con_scale=jnp.abs(r(B, K, 6)) + 1, con_fscale=jnp.abs(r(B, K, 6)) + 1,
    con_dim_mask=jnp.ones((B, K, 6), jnp.float32),
    con_active=jnp.ones((B, K), jnp.float32),
    con_Rn=jnp.abs(r(B, K)) * 0.1 + 0.01, con_mu=jnp.abs(r(B, K)) * 0.2,
)
t0 = time.time()
out = newton_solve_batched(**args, nv=nv, nf=nf, nl=nl, K=K, iterations=iters)
qa = out[0]
float(jax.device_get(qa[0, 0]))
print(f"compile+1run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
N = 30
for _ in range(N):
    out = newton_solve_batched(**args, nv=nv, nf=nf, nl=nl, K=K, iterations=iters)
float(jax.device_get(out[0][0, 0]))
dt = (time.time() - t0) / N
print(json.dumps({"B": B, "iters": iters, "ms_per_solve": round(dt*1e3, 3),
                  "env_solves_per_sec": round(B/dt, 1)}), flush=True)
