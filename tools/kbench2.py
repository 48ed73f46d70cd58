import sys; sys.path.insert(0, "/root/repo")
import os, time, json
import jax, jax.numpy as jnp
import numpy as np
from quadruped_tpu.utils import cache as _cache
_cache.enable()
from quadruped_tpu.ops import newton as NK

B = int(os.environ.get("KB_B", 128))
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
copt = os.environ.get("KB_VMEM")
fn = NK.newton_solve_batched
static = dict(nv=nv, nf=nf, nl=nl, K=K, iterations=iters)
t0 = time.time()
if copt:
    lowered = jax.jit(
        lambda **kw: fn(**kw, **static)
    ).lower(**args)
    compiled = lowered.compile(
        {"xla_tpu_scoped_vmem_limit_kib": int(copt)}
    )
    out = compiled(**args)
else:
    out = fn(**args, **static)
float(jax.device_get(out[0][0, 0]))
print(f"compile+1run {time.time()-t0:.1f}s", flush=True)
run = (lambda: compiled(**args)) if copt else (lambda: fn(**args, **static))
t0 = time.time(); N = 30
for _ in range(N):
    out = run()
float(jax.device_get(out[0][0, 0]))
dt = (time.time() - t0) / N
print(json.dumps({"B": B, "iters": iters, "ms": round(dt*1e3, 3),
                  "env_solves_per_sec": round(B/dt, 1)}), flush=True)
