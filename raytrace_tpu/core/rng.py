"""Counter-based RNG for the TPU path tracer.

The reference threads a ``StdGen`` through every sampling site and
pre-splits one generator per pixel (``Ray.hs:234-236``); here we use JAX's
counter-based threefry keys derived deterministically from
``(pixel_index, sample_index, bounce_depth, draw_site)``.  This makes every
random draw a pure function of logical coordinates, so renders are
bit-identical regardless of how the ray buffer is sharded across devices —
the TPU-native answer to the reference's determinism-via-split-seeds.

The reference's rejection samplers (Core.hs:54-68) are replaced by
*branchless, exactly equidistributed* transforms (no data-dependent loops,
which XLA cannot vectorize):
  * uniform unit vector  <- normalized isotropic Gaussian
  * uniform in unit disk <- sqrt(u) * (cos, sin)(2 pi v)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .vecmath import DTYPE, normalize


def base_key(seed: int):
    return jax.random.key(seed)


def ray_keys(key, pixel_ids, sample_ids):
    """One key per ray from absolute (pixel, sample) coordinates.

    Shard-count invariant: depends only on logical ids, not layout.
    """
    k = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pixel_ids)
    return jax.vmap(jax.random.fold_in)(k, sample_ids)


def fold_depth(keys, depth):
    """Derive the per-bounce key from a per-ray key (vectorized fold_in)."""
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, depth)


def site(keys, i: int):
    """Derive the key for draw-site ``i`` within a bounce."""
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, i)


def uniform(keys, shape=(), dtype=DTYPE):
    """U[0,1) per key; ``shape`` are extra trailing dims."""
    return jax.vmap(lambda k: jax.random.uniform(k, shape, dtype))(keys)


def unit_vector(keys, dtype=DTYPE):
    """Uniformly distributed points on the unit sphere (replaces the
    rejection loop at Core.hs:54-61 with a branchless Gaussian transform;
    the distribution is identical)."""
    g = jax.vmap(lambda k: jax.random.normal(k, (3,), dtype))(keys)
    return normalize(g)


def in_unit_disk(keys, dtype=DTYPE):
    """Uniformly distributed points in the closed unit disk (replaces the
    rejection loop at Core.hs:63-68; identical distribution)."""
    u = jax.vmap(lambda k: jax.random.uniform(k, (2,), dtype))(keys)
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
