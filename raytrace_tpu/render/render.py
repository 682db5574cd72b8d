"""Top-level render driver: the TPU equivalent of ``raytrace`` (Ray.hs:121).

Replaces the reference's per-pixel spark fan-out (``A.makeArray A.Par``,
Ray.hs:238) with the *persistent wavefront* (render/integrator.py): one
jitted launch processes chunks of the (pixel x sample) work queue with a
fixed lane pool, regenerating dead lanes so occupancy stays ~100%.  Work
items are deterministic in (pixel, sample) coordinates, so the image is
independent of lane count, chunking, and device layout.

Progressive rendering / checkpoint-resume: :func:`render_accumulate`
returns the raw (sum, samples-done) pair that can be checkpointed and
continued (SURVEY.md §5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.vecmath import DTYPE
from ..scene.types import Scene
from .camera import CameraSettings
from .integrator import trace_wavefront, trace_wavefront_stationary

# Below this many pixels, the pixel-stationary scheduler can't fill the
# vector lanes; use the work-queue scheduler instead.
_STATIONARY_MIN_PIXELS = 16384


def render_accumulate(scene: Scene, settings: CameraSettings, seed: int = 0,
                      *, spp: int | None = None, n_lanes: int = 1 << 17,
                      spp_chunk: int | None = None, acc=None, spp_done: int = 0,
                      progress: bool = False):
    """Accumulate radiance sums for ``spp`` samples/pixel.

    Returns ``(acc, spp_total)`` where ``acc[n_pix, 3]`` is the radiance
    *sum*; ``acc / spp_total`` is the image.  Pass a previous ``(acc,
    spp_done)`` to resume.  ``spp_chunk`` bounds work per device launch.
    """
    h = settings.image_height
    w = settings.image_width
    n_pix = h * w
    spp = spp if spp is not None else settings.samples_per_pixel
    key = rng.base_key(seed)

    stationary = n_pix >= _STATIONARY_MIN_PIXELS
    if spp_chunk is None:
        if stationary:
            # tail imbalance amortizes over samples; bigger launches win
            spp_chunk = min(spp, 64)
        else:
            # Each launch ends with a low-occupancy drain tail (long
            # survivor paths); queue >= ~32 lane-fills amortizes it.
            spp_chunk = max(1, min(spp, -(-32 * n_lanes // max(n_pix, 1))))

    if acc is None:
        acc = jnp.zeros((n_pix, 3), DTYPE)

    done = 0
    while done < spp:
        n_s = min(spp_chunk, spp - done)
        # samples [spp_done+done, ...+n_s) — absolute sample coordinates
        s0 = jnp.asarray(spp_done + done, jnp.int32)
        if stationary:
            # rotate_k=1: measured on Cornell, the lane tail is per-sample
            # path-length noise (rare deep paths), which pixel rotation
            # cannot average away — Russian roulette (rr_depth) can.
            acc = _stationary_jit(scene, settings, key, acc, s0,
                                  n_pix=n_pix, spp=n_s, rotate_k=1)
        else:
            acc = _queue_jit(scene, settings, key, acc, s0, n_pix=n_pix,
                             spp=n_s, n_lanes=min(n_lanes, n_pix * n_s))
        done += n_s
        if progress:
            print(f"\r  spp {done}/{spp}", end="", flush=True)
    if progress:
        print()
    return acc, spp_done + spp


def _queue_fn(scene, settings, key, acc, s0, n_pix, spp, n_lanes):
    return trace_wavefront(scene, settings, key, n_pix, spp, n_lanes, acc,
                           sample_offset=s0)


def _stationary_fn(scene, settings, key, acc, s0, n_pix, spp, rotate_k=1):
    return trace_wavefront_stationary(scene, settings, key, n_pix, spp, acc,
                                      sample_offset=s0, rotate_k=rotate_k)


_queue_jit = jax.jit(_queue_fn, static_argnames=("n_pix", "spp", "n_lanes"))
_stationary_jit = jax.jit(_stationary_fn,
                          static_argnames=("n_pix", "spp", "rotate_k"))


def render(scene: Scene, settings: CameraSettings, seed: int = 0,
           *, spp: int | None = None, n_lanes: int = 1 << 17,
           spp_chunk: int | None = None, progress: bool = False):
    """Render an image [H, W, 3] of linear RGB."""
    spp = spp if spp is not None else settings.samples_per_pixel
    acc, total = render_accumulate(
        scene, settings, seed, spp=spp, n_lanes=n_lanes,
        spp_chunk=spp_chunk, progress=progress)
    h = settings.image_height
    w = settings.image_width
    return np.asarray(acc / total).reshape(h, w, 3)
