"""Persistent XLA compilation cache setup.

Axon/TPU compiles of the fused physics+train programs take minutes; the
persistent cache makes every subsequent process start instantly.  Called
by bench.py, the CLI and the driver entry points.
"""

import os

import jax


def enable(path: str | None = None):
    path = path or os.environ.get(
        "QTPU_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
