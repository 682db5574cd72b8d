"""Top-level render driver: the TPU equivalent of ``raytrace`` (Ray.hs:121).

Replaces the reference's per-pixel spark fan-out (``A.makeArray A.Par``,
Ray.hs:238) with a *tiled wavefront scheduler*: the (pixel x sample) space
is cut into fixed-size ray batches, each batch is traced by one jitted
wavefront launch, and results accumulate into a progressive
(sum, sample-count) buffer — which doubles as the checkpoint/resume story
(SURVEY.md §5).  Batches are deterministic in (pixel, sample) coordinates,
so the image is independent of batch size, device count, and launch order.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.vecmath import DTYPE
from ..scene.types import Scene
from .camera import CameraSettings, camera_frame, generate_rays
from .integrator import trace


def _trace_batch(scene: Scene, settings: CameraSettings, seed_key,
                 pixel_ids, sample_ids):
    """Jittable: trace one (pixel, sample) batch -> radiance [R, 3]."""
    keys = rng.ray_keys(seed_key, pixel_ids, sample_ids)
    frame = camera_frame(settings)
    o, d, time = generate_rays(settings, frame, pixel_ids, keys)
    return trace(scene, settings, o, d, time, rng.site(keys, 7))


_trace_batch_jit = jax.jit(_trace_batch, static_argnames=())


def render(scene: Scene, settings: CameraSettings, seed: int = 0,
           *, rays_per_batch: int = 1 << 17, spp: int | None = None,
           progress: bool = False):
    """Render an image [H, W, 3] of linear RGB.

    ``rays_per_batch`` bounds device memory; the image itself is invariant
    to it.  ``spp`` overrides ``settings.samples_per_pixel``.
    """
    h = settings.image_height
    w = settings.image_width
    n_pix = h * w
    spp = spp if spp is not None else settings.samples_per_pixel
    key = rng.base_key(seed)

    # Choose a pixel-tile size and samples-per-launch so each launch is
    # ~rays_per_batch rays with every launch shape identical (one compile).
    pix_tile = min(n_pix, rays_per_batch)
    s_per = max(1, rays_per_batch // pix_tile)
    s_per = min(s_per, spp)

    acc = jnp.zeros((n_pix, 3), DTYPE)
    n_tiles = -(-n_pix // pix_tile)
    n_sbatches = -(-spp // s_per)

    base_pix = np.arange(pix_tile)
    for ti in range(n_tiles):
        start = ti * pix_tile
        ids = start + base_pix
        valid = jnp.asarray(ids < n_pix)
        ids_c = jnp.asarray(np.minimum(ids, n_pix - 1), jnp.int32)
        for sb in range(n_sbatches):
            s0 = sb * s_per
            n_s = min(s_per, spp - s0)
            sample_ids = jnp.repeat(jnp.arange(s0, s0 + s_per), pix_tile)
            tiled_pix = jnp.tile(ids_c, s_per)
            out = _trace_batch_jit(scene, settings, key, tiled_pix,
                                   sample_ids)
            out = out.reshape(s_per, pix_tile, 3)
            if n_s < s_per:  # drop overshoot samples in the last batch
                out = out[:n_s]
            contrib = jnp.where(valid[:, None], out.sum(0), 0.0)
            acc = acc.at[ids_c].add(contrib)
            if progress:
                done = ti * n_sbatches + sb + 1
                print(f"\r  batch {done}/{n_tiles * n_sbatches}",
                      end="", flush=True)
    if progress:
        print()

    return np.asarray(acc / spp).reshape(h, w, 3)
