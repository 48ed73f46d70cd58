import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print("result:", float((x @ x).sum()), flush=True)
