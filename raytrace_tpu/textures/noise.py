"""3D Perlin gradient noise, vectorized for TPU.

Re-design of the reference ``Graphics.Ray.Noise`` (Noise.hs:15-92): same
algorithm — period-256 lattice, three XOR-combined permutation tables, 256
precomputed unit-vector gradients, smoothstep-weighted trilinear blend of the
eight corner gradient dot products — but evaluated for a whole ``[..., 3]``
batch of points at once with gathers from small constant tables (which XLA
keeps resident on-chip).

The permutation tables are the reference's fixed tables
(:mod:`._perlin_tables`, Noise.hs:52-92).  The gradient table in the
reference is 256 rejection-sampled unit vectors from Haskell's
``mkStdGen 666`` (Noise.hs:86-92); that bitstream is not reproducible
outside GHC, so we use 256 unit vectors from a fixed numpy seed — same
distribution, same noise statistics, different concrete pattern (pixel
parity with the reference is statistical, not bitwise; see SURVEY.md §7
"hard parts" (b)).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.vecmath import DTYPE, vdot0
from ._perlin_tables import PERMX, PERMY, PERMZ


def _make_gradients() -> np.ndarray:
    rng = np.random.default_rng(666)
    g = rng.normal(size=(256, 3))
    return (g / np.linalg.norm(g, axis=-1, keepdims=True)).astype(np.float32)


_PERMX = jnp.asarray(PERMX, dtype=jnp.int32)
_PERMY = jnp.asarray(PERMY, dtype=jnp.int32)
_PERMZ = jnp.asarray(PERMZ, dtype=jnp.int32)
_GRADIENTS = jnp.asarray(_make_gradients())


def _smoothstep(x):
    return x * x * (3.0 - 2.0 * x)


def perlin_noise(p):
    """Perlin noise for points ``p`` of shape [..., 3] -> noise of shape [...].

    Values lie in [-sqrt(3)/2, +sqrt(3)/2] (Noise.hs:17-19).
    """
    p = jnp.asarray(p, DTYPE)
    ip = jnp.floor(p)
    f = p - ip  # fractional part in [0, 1)
    ip = ip.astype(jnp.int32)

    total = jnp.zeros(p.shape[:-1], DTYPE)
    sx, sy, sz = _smoothstep(f[..., 0]), _smoothstep(f[..., 1]), _smoothstep(f[..., 2])
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                hx = _PERMX[(ip[..., 0] + i) & 255]
                hy = _PERMY[(ip[..., 1] + j) & 255]
                hz = _PERMZ[(ip[..., 2] + k) & 255]
                grad = _GRADIENTS[hx ^ hy ^ hz]
                rel = f - jnp.asarray([i, j, k], DTYPE)
                coef = (
                    (sx if i else (1.0 - sx))
                    * (sy if j else (1.0 - sy))
                    * (sz if k else (1.0 - sz))
                )
                total = total + coef * vdot0(grad, rel)
    return total


def fractal_noise(depth: int, p):
    """Sum of ``depth`` octaves: weight halves, frequency doubles per octave
    (Noise.hs:41-46). ``depth`` is static."""
    p = jnp.asarray(p, DTYPE)
    total = jnp.zeros(p.shape[:-1], DTYPE)
    coef = 1.0
    for _ in range(depth):
        total = total + coef * perlin_noise(p)
        coef *= 0.5
        p = p * 2.0
    return total


def turbulence(depth: int, p):
    """Absolute value of fractal noise (Noise.hs:48-50)."""
    return jnp.abs(fractal_noise(depth, p))
