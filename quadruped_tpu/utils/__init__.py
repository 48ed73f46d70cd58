"""Shared utilities: persistent compile cache, TPU-tuned jit wrapper."""

from __future__ import annotations

import functools

import jax

# The Pallas Newton megakernel (ops/newton.py) keeps its whole working set
# (J block, Gram temps, line-search scoreboard) in VMEM; the default XLA
# scoped-vmem stack budget rejects it ("Ran out of memory in memory space
# vmem ... on stack").  TPU v5e has 128 MB of VMEM per core — raise the
# scoped budget for every program that may embed the kernel.  Unknown
# options are ignored by non-TPU backends.
TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": 131072}


def tpu_jit(fun=None, **kwargs):
    """jax.jit with the framework's TPU compiler options pre-applied."""
    if fun is None:
        return functools.partial(tpu_jit, **kwargs)
    opts = dict(TPU_COMPILER_OPTIONS)
    opts.update(kwargs.pop("compiler_options", None) or {})
    return jax.jit(fun, compiler_options=opts, **kwargs)
