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
    """jax.jit with the framework's TPU compiler options pre-applied.

    The CPU backend rejects unknown compile options with INVALID_ARGUMENT,
    so the backend choice is made lazily at first call (also avoiding
    backend initialization at import time, which would defeat
    jax.config.update-based platform selection in tests/dryruns)."""
    if fun is None:
        return functools.partial(tpu_jit, **kwargs)
    extra = kwargs.pop("compiler_options", None) or {}
    cache = {}

    @functools.wraps(fun)
    def wrapper(*args, **kw):
        if "jit" not in cache:
            opts = None
            if jax.default_backend() != "cpu":
                opts = dict(TPU_COMPILER_OPTIONS)
                opts.update(extra)
            cache["jit"] = jax.jit(fun, compiler_options=opts, **kwargs)
        return cache["jit"](*args, **kw)

    return wrapper
