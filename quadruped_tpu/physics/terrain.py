"""Procedural rough-terrain heightfield (BASELINE.json config 4).

TPU-first design: instead of a sampled height GRID (per-point dynamic
gathers, awkward to randomize per episode), the terrain is a smooth
parametric field

    h(x, y) = sum_k amp_k * cos(freq_k . (x, y) + phase_k)

with per-episode random amplitudes/frequencies/phases carried in the env's
params pytree (so every autoreset walks on fresh ground, and domain
randomization over terrain is just another parameter distribution).  The
surface normal is analytic — no finite differences, no grid resolution
tradeoffs, and every operation is dense VPU math under vmap.

Collision model: each plane-group candidate samples the field at its
query point's (x, y) and collides against the LOCAL TANGENT PLANE
(position (x, y, h), normal from the gradient) — the standard
low-curvature approximation for legged-robot terrain (foot-scale geoms
vs decimeter-scale features).  With zero amplitudes this reduces EXACTLY
to the flat plane pipeline (pinned by tests/test_terrain.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TERRAIN_KEYS = ("terrain_amp", "terrain_freq", "terrain_phase")


def sample_terrain_params(
    rng: jax.Array, n_waves: int = 8, amplitude: float = 0.04,
    wavelength: float = 1.0, dtype=jnp.float32,
):
    """Per-episode terrain draw.

    amplitude: total peak height scale (m); each wave gets ~amplitude /
    n_waves so the summed field stays in +-amplitude.
    wavelength: center feature size (m); waves span [0.5, 2] x wavelength.
    """
    k_amp, k_ang, k_wl, k_ph = jax.random.split(rng, 4)
    amp = (
        jax.random.uniform(k_amp, (n_waves,), dtype, 0.5, 1.0)
        * (2.0 * amplitude / n_waves)
    )
    ang = jax.random.uniform(k_ang, (n_waves,), dtype, 0.0, 2.0 * jnp.pi)
    wl = wavelength * jax.random.uniform(k_wl, (n_waves,), dtype, 0.5, 2.0)
    freq = (2.0 * jnp.pi / wl)[:, None] * jnp.stack(
        [jnp.cos(ang), jnp.sin(ang)], axis=-1
    )
    phase = jax.random.uniform(k_ph, (n_waves,), dtype, 0.0, 2.0 * jnp.pi)
    return {"terrain_amp": amp, "terrain_freq": freq, "terrain_phase": phase}


def flat_terrain_params(n_waves: int = 8, dtype=jnp.float32):
    """Zero-amplitude terrain == exact flat plane (same pytree shape, so
    flat and rough envs share compiled programs)."""
    return {
        "terrain_amp": jnp.zeros((n_waves,), dtype),
        "terrain_freq": jnp.ones((n_waves, 2), dtype),
        "terrain_phase": jnp.zeros((n_waves,), dtype),
    }


def height_normal(terrain, xy):
    """Field height and unit surface normal at xy (..., 2).

    Returns (h (...,), n (..., 3))."""
    amp = terrain["terrain_amp"]
    freq = terrain["terrain_freq"]
    phase = terrain["terrain_phase"]
    arg = jnp.einsum("...i,ki->...k", xy, freq) + phase
    h = jnp.sum(amp * jnp.cos(arg), axis=-1)
    # dh/dxy = sum_k -amp_k sin(arg_k) freq_k
    g = jnp.einsum("...k,ki->...i", -amp * jnp.sin(arg), freq)
    n = jnp.concatenate(
        [-g, jnp.ones(g.shape[:-1] + (1,), g.dtype)], axis=-1
    )
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return h, n


def local_plane(terrain, point):
    """Tangent plane under a world point (..., 3): (ppos (...,3), n (...,3))."""
    xy = point[..., :2]
    h, n = height_normal(terrain, xy)
    ppos = jnp.concatenate([xy, h[..., None]], axis=-1)
    return ppos, n
