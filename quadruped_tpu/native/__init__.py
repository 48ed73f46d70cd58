"""Native runtime components (C++ via ctypes).

`TrajectoryLog`: asynchronous binary spool for qpos trajectories and
episode scalars — the host-side runtime piece of the video/analysis
pipeline (see trajlog.cpp for rationale and format).  Builds on first use
with g++ (no pybind11 in this image; plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libtrajlog.so"
_HASH = _DIR / "libtrajlog.so.srchash"
_LIB = None


def _build() -> Path:
    """Build from source, gated on a content hash of trajlog.cpp.

    The .so is never committed (a binary blob is unreviewable and mtimes
    after a fresh clone are checkout-order-dependent); the hash sidecar
    makes rebuilds exact: same source bytes -> reuse, anything else ->
    recompile."""
    src = _DIR / "trajlog.cpp"
    digest = hashlib.sha256(src.read_bytes()).hexdigest()
    if _SO.exists() and _HASH.exists() and _HASH.read_text() == digest:
        return _SO
    subprocess.run(
        [
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
            str(src), "-o", str(_SO),
        ],
        check=True,
        capture_output=True,
    )
    _HASH.write_text(digest)
    return _SO


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build()))
        lib.tl_open.restype = ctypes.c_void_p
        lib.tl_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
        lib.tl_append.restype = ctypes.c_int
        lib.tl_append.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.tl_flush.restype = ctypes.c_int
        lib.tl_flush.argtypes = [ctypes.c_void_p]
        lib.tl_close.restype = None
        lib.tl_close.argtypes = [ctypes.c_void_p]
        lib.tl_count.restype = ctypes.c_int64
        lib.tl_count.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32)
        ]
        lib.tl_read.restype = ctypes.c_int64
        lib.tl_read.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    return _LIB


class TrajectoryLog:
    """Async writer: append never blocks on disk (worker thread flushes)."""

    def __init__(self, path, nq: int):
        self._lib = _lib()
        self._h = self._lib.tl_open(str(path).encode(), nq)
        if not self._h:
            raise OSError(f"cannot open trajectory log {path}")
        self.nq = nq
        self.path = str(path)

    def append(self, step: int, reward: float, qpos: np.ndarray):
        q = np.ascontiguousarray(qpos, dtype=np.float32)
        assert q.shape == (self.nq,)
        rc = self._lib.tl_append(
            self._h, int(step), float(reward),
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise OSError("tl_append failed")

    def append_batch(self, start_step: int, rewards, qpos_log):
        for i, (r, q) in enumerate(zip(np.asarray(rewards), np.asarray(qpos_log))):
            self.append(start_step + i, float(r), q)

    def flush(self):
        self._lib.tl_flush(self._h)

    def close(self):
        if self._h:
            self._lib.tl_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_log(path):
    """Returns (steps (N,), rewards (N,), qpos (N, nq))."""
    lib = _lib()
    nq = ctypes.c_uint32(0)
    n = lib.tl_count(str(path).encode(), ctypes.byref(nq))
    if n < 0:
        raise OSError(f"cannot read trajectory log {path}")
    steps = np.zeros(n, np.uint64)
    rewards = np.zeros(n, np.float32)
    qpos = np.zeros((n, nq.value), np.float32)
    got = lib.tl_read(
        str(path).encode(), 0, n,
        steps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        rewards.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        qpos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return steps[:got], rewards[:got], qpos[:got]
