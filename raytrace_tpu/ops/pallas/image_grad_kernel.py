"""Pallas TPU kernel: scatter-free image-texture atlas gradient.

The backward of the atlas gather ``images[img_id, j, i]`` is a scatter-
add of ~10^5 per-lane cotangents into an [I, H, W, 3] array — measured
4.25x the whole constant-texture train step at 2^17 lanes (XLA TPU
scatter re-sorts per-call-varying indices; CLAUDE.md perf rules).

This kernel replaces the scatter with the ROW x COLUMN one-hot
factorization (docs/ROADMAP.md §8):

    g_img[h, w, c] = sum_r OJ[r, h] * OI[r, w] * g_texel[r, c]

computed per 512-lane row as two one-hot builds ([H, 512] and [W, 512]
iota compares, O((H+W) * lanes) VPU work) and one MXU ``dot_general``
per channel contracting the lane axis ([H, 512] x [W, 512]^T ->
[H, W], O(H*W*lanes) MXU flops — ~3e9 flops for a 64x64 atlas at 2^17
lanes, microseconds on the MXU).  The accumulator [I, 3, H, W] lives in
the revisited output block across the sequential grid.

Wins only for small atlases (the flops scale with H*W): gated at
``I * H * W <= MAX_ATLAS_TEXELS``; bigger atlases keep the XLA scatter
(textures/textures.py:_image_gather).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_kernel import LANES

WIDE = 512            # lanes per row iteration (one-hot width)
MAX_ATLAS_TEXELS = 1 << 16   # I*H*W cap: flops/VMEM scale with it
MAX_DIM = 256


def _kernel(jrow, irow, mrow, gr, gg, gb, out, *, n_img: int, h: int,
            w: int, rg: int, wide: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out[...] = jnp.zeros_like(out[...])

    # integer iota + convert: Mosaic's tpu.iota only produces int
    # vectors (f32 iota fails verification on the real chip)
    ioth = jax.lax.broadcasted_iota(jnp.int32, (h, wide), 0)\
        .astype(jnp.float32)
    iotw = jax.lax.broadcasted_iota(jnp.int32, (w, wide), 0)\
        .astype(jnp.float32)

    def row_body(r, _):
        sl = (pl.ds(r, 1), slice(None))
        jv = jrow[sl]                       # [1, wide]
        iv = irow[sl]
        mv = mrow[sl]
        # zero-cotangent skip: lanes that didn't hit this texture carry
        # an exactly-zero cotangent (the multiply is masked by `live` in
        # the caller), and pixel-stationary tiles are coherent, so whole
        # 512-lane rows frequently have nothing to contribute
        nz = (gr[sl] != 0.0) | (gg[sl] != 0.0) | (gb[sl] != 0.0)

        def work():
          oj = jnp.where(ioth == jv, 1.0, 0.0)    # [h, wide]
          oi = jnp.where(iotw == iv, 1.0, 0.0)    # [w, wide]
          for m in range(n_img):
            mask = (mv == jnp.float32(m)) & nz

            def add(m=m, mask=mask):
                mf = jnp.where(mask, 1.0, 0.0)
                # ONE (channel x split-term)-stacked NATIVE-bf16 dot per
                # (row, image).  The f32 cotangent is decomposed into
                # three bf16 terms (hi + mid + lo covers the full 24-bit
                # mantissa), the one-hot is bf16-exact, and the MXU
                # accumulates in f32 — exact to f32 rounding like a
                # 3-pass Precision.HIGH dot (which Mosaic can't lower)
                # at a third of HIGHEST's passes.
                ojb = oj.astype(jnp.bfloat16)
                parts = []
                for gref in (gr, gg, gb):
                    gv = gref[sl] * mf            # [1, wide] f32
                    g1 = gv.astype(jnp.bfloat16)
                    r1 = gv - g1.astype(jnp.float32)
                    g2 = r1.astype(jnp.bfloat16)
                    g3 = (r1 - g2.astype(jnp.float32)) \
                        .astype(jnp.bfloat16)
                    parts += [ojb * g1, ojb * g2, ojb * g3]
                ojg = jnp.concatenate(parts, axis=0)      # [9h, wide]
                acc = jax.lax.dot_general(
                    ojg, oi.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [9h, w]
                for c in range(3):
                    out[m, c] = out[m, c] + (
                        acc[3 * c * h:(3 * c + 1) * h]
                        + acc[(3 * c + 1) * h:(3 * c + 2) * h]
                        + acc[(3 * c + 2) * h:(3 * c + 3) * h])

            pl.when(jnp.any(mask))(add)

        pl.when(jnp.any(nz))(work)
        return 0

    jax.lax.fori_loop(0, rg, row_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_img", "h", "w", "interpret"))
def image_grad_pallas(img_id, j, i, g_texel, *, n_img: int, h: int,
                      w: int, interpret: bool = False):
    """Atlas cotangent [I, H, W, 3] from per-lane gather indices and the
    texel cotangent.  ``img_id``/``j``/``i`` are 1-D int lanes (R a
    multiple of 128), ``g_texel`` [R, 3]."""
    r = j.shape[0]
    wide = WIDE
    while r % wide and wide > LANES:
        wide //= 2
    g = r // wide
    resh = lambda x: x.astype(jnp.float32).reshape(g, wide)
    rg = min(max(32 * LANES // wide * 8, 8), g)
    grid = (pl.cdiv(g, rg),)
    lane_spec = pl.BlockSpec((rg, wide), lambda k: (k, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n_img, 3, h, w), lambda k: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, n_img=n_img, h=h, w=w, rg=rg,
                               wide=wide)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[lane_spec] * 6,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_img, 3, h, w), jnp.float32),
        interpret=interpret,
    )(resh(j), resh(i), resh(img_id),
      resh(g_texel[:, 0]), resh(g_texel[:, 1]), resh(g_texel[:, 2]))
    return jnp.transpose(out, (0, 2, 3, 1))      # [I, H, W, 3]


def image_grad_eligible(images, lanes: int) -> bool:
    """Static gate: small atlas, 128-aligned flat lanes, TPU backend."""
    import os
    if os.environ.get("RT_NO_IMG_GRAD_KERNEL"):
        return False
    i_, h_, w_, _ = images.shape
    return (jax.default_backend() in ("tpu", "axon")
            and lanes % LANES == 0 and lanes >= LANES
            and i_ * h_ * w_ <= MAX_ATLAS_TEXELS
            and h_ <= MAX_DIM and w_ <= MAX_DIM)
