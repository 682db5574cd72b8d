"""Pallas TPU kernel: procedural marble texture with per-block skip.

The marble texture (Texture.hs:72-79) is 7-octave Perlin turbulence —
~56 hash-gradient corner evaluations per lane.  Evaluated branchlessly
over every lane in XLA it costs ~1.7 ms per 90k-lane demo2 iteration,
even though only the lanes that hit the (single) marble sphere need it.

This kernel keeps the lane tile in VMEM and loops over the scene's
marble textures (a *static* tuple of table rows, TextureTable.marble_rows)
with their scalar parameters prefetched to SMEM.  Each [BLOCK_G, 128]
block evaluates a texture's turbulence under ``lax.cond(jnp.any(mask))``
— blocks with no lane sampling that texture skip the whole 7-octave
computation (~0.4 us per skipped cond vs ~75 us of math; the same
block-consensus trick as the clustered intersect loop).  The noise math
is the shared SoA arithmetic-hash path (textures/noise.py:
turbulence_soa) so kernel and XLA results are bit-identical.

No per-lane parameter gathers: parameters are per-*texture* scalars
read from SMEM inside the static loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...textures.noise import turbulence_soa
from .intersect_kernel import BLOCK_G, LANES

# mtbl column layout (f32): row id, freq, dir xyz, shift xyz
_COLS = 8


def _kernel(mtbl_ref, tid, px, py, pz, out, *, n_marble: int):
    tv = tid[...]
    pxv, pyv, pzv = px[...], py[...], pz[...]
    acc = jnp.zeros_like(pxv)
    for m in range(n_marble):          # static: one cond per marble texture
        row = mtbl_ref[m, 0]
        freq = mtbl_ref[m, 1]
        dx_, dy_, dz_ = mtbl_ref[m, 2], mtbl_ref[m, 3], mtbl_ref[m, 4]
        sx_, sy_, sz_ = mtbl_ref[m, 5], mtbl_ref[m, 6], mtbl_ref[m, 7]
        mask = tv == row

        def compute(a):
            q = 0.25 * freq
            nz = 10.0 * turbulence_soa(7, q * pxv + sx_, q * pyv + sy_,
                                       q * pzv + sz_)
            sin_arg = freq * (dx_ * pxv + dy_ * pyv + dz_ * pzv)
            stripe = 0.5 + 0.5 * jnp.sin(sin_arg + nz)   # Texture.hs:72-79
            return jnp.where(mask, stripe, a)

        acc = jax.lax.cond(jnp.any(mask), compute, lambda a: a, acc)
    out[...] = acc


@functools.partial(jax.jit, static_argnames=("n_marble", "interpret"))
def _marble_call(mtbl, tid, px, py, pz, *, n_marble: int,
                 interpret: bool = False):
    g = px.shape[0]
    bg = min(BLOCK_G, g)
    spec = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(g, bg),),
        in_specs=[spec] * 4,
        out_specs=spec,
    )
    return pl.pallas_call(
        functools.partial(_kernel, n_marble=n_marble),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, LANES), jnp.float32),
        interpret=interpret,
    )(mtbl, tid, px, py, pz)


def marble_eligible(table, points) -> bool:
    """Kernel applies: flat [R, 3] points with R a multiple of 128 and at
    least one marble texture in the (statically known) table."""
    return (len(getattr(table, "marble_rows", ())) > 0
            and points.ndim == 2 and points.shape[0] % LANES == 0
            and points.shape[0] >= LANES)


def marble_stripe_pallas(table, tex_ids, points, interpret: bool = False):
    """Marble stripe value [R] for every lane whose ``tex_ids`` is a
    marble row (0 elsewhere).  ``table.marble_rows`` must be non-empty."""
    rows = table.marble_rows
    mtbl = jnp.stack([
        jnp.concatenate([
            jnp.asarray([float(r)], jnp.float32),
            table.f0[r][None].astype(jnp.float32),
            table.v0[r].astype(jnp.float32),
            table.v1[r].astype(jnp.float32),
        ]) for r in rows
    ])                                                # [M, 8]
    # the kernel reads columns 0-7 by hard-coded index; keep the builder
    # and kernel layouts from drifting apart silently
    assert mtbl.shape[1] == _COLS, (mtbl.shape, _COLS)
    r0 = points.shape[0]
    g = r0 // LANES
    resh = lambda x: x.reshape(g, LANES)
    out = _marble_call(
        mtbl, resh(tex_ids.astype(jnp.float32)),
        resh(points[:, 0].astype(jnp.float32)),
        resh(points[:, 1].astype(jnp.float32)),
        resh(points[:, 2].astype(jnp.float32)),
        n_marble=len(rows), interpret=interpret)
    return out.reshape(r0)
