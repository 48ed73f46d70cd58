"""Batch-LAST custom_vmap dispatch helper.

Several pipeline stages (fk, smooth dynamics, constraint assembly) are
written as single-env functions that the env layer lifts with jax.vmap.
The default lifting puts the env batch on axis 0, leaving tiny trailing
feature dims (3/4/6/9-wide) on the TPU lane axis — mostly padding.  The
rule built here re-executes the SAME single-env code under a trailing-
axis vmap (in_axes=-1), so the env batch rides the 128-wide lane axis
instead (the treatment that measured 2.1x on cfrc_ext, PLAN.md).

Default: OFF until measured on-chip (QTPU_{FK,SMOOTH,ASM}_BLAST=1 to
enable).  Two reasons: on CPU there are no vector lanes to win and the
trailing-axis vmap inflated XLA compile times badly (a PPO-program
compile went 8 min -> 20+ min); and the TPU compile/perf of these
programs has not been measured yet this round (axon tunnel outage) — the
round driver runs bench unattended, so the default path must be the
known-good one.  tools/TPU_WORKQUEUE.md §1 A/Bs them and flips the
default with numbers.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import custom_batching


def blast_enabled(env_var: str) -> bool:
    return os.environ.get(env_var) == "1"


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
