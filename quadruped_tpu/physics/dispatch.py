"""Batch-LAST custom_vmap dispatch helper.

Several pipeline stages (fk, smooth dynamics, constraint assembly) are
written as single-env functions that the env layer lifts with jax.vmap.
The default lifting puts the env batch on axis 0, leaving tiny trailing
feature dims (3/4/6/9-wide) on the TPU lane axis — mostly padding.  The
rule built here re-executes the SAME single-env code under a trailing-
axis vmap (in_axes=-1), so the env batch rides the 128-wide lane axis
instead (the treatment that measured 2.1x on cfrc_ext, PLAN.md).

Default: ON for TPU/GPU backends, OFF on CPU (QTPU_{FK,SMOOTH,ASM}_BLAST
overrides: 1 forces on, 0 forces off).  Measured on-chip (v5e, 4096 envs,
8 Newton iterations — bench A/B matrix in PLAN.md): fk+smooth+asm
batch-last is +3.7% end-to-end without pools and +4.1% with condim row
pools (6,233 -> 6,491 steps/s).  On CPU there are no vector lanes to win
and the trailing-axis vmap inflated XLA compile times badly (a
PPO-program compile went 8 min -> 20+ min), so CPU keeps batch-first.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import custom_batching


def blast_enabled(env_var: str) -> bool:
    v = os.environ.get(env_var)
    if v is not None:
        return v == "1"
    return jax.default_backend() != "cpu"


def batch_last(fn):
    """custom_vmap wrapper: unbatched calls run `fn` unchanged (the
    oracle-exact path); under vmap the batch rule broadcasts unbatched
    leaves, moves the batch to the trailing axis, and re-runs `fn` under
    vmap(in_axes=-1, out_axes=-1)."""

    @custom_batching.custom_vmap
    def core(*args):
        return fn(*args)

    @core.def_vmap
    def _rule(axis_size, in_batched, *args):
        flat, treedef = jax.tree.flatten(args)
        flat_b = jax.tree.leaves(in_batched)
        flat = [
            x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            for x, b in zip(flat, flat_b)
        ]
        args = jax.tree.unflatten(treedef, flat)
        args = jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), args)
        out = jax.vmap(fn, in_axes=-1, out_axes=-1)(*args)
        out_batched = jax.tree.map(lambda _: True, out)
        return (
            jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), out),
            out_batched,
        )

    return core
