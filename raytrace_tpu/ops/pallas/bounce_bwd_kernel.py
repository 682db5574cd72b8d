"""Pallas TPU backward megakernel for the full-bounce wavefront.

The forward bounce is one Pallas kernel (bounce_kernel.py); its custom
VJP used to replay the bounce in XLA, where every intermediate of the
replay *and its transpose* is an [R]-sized HBM round trip — measured
2.6x the forward kernel per wavefront iteration (tools/
prof_replay_trace.py: the backward is pure HBM-bound elementwise
traffic).  This kernel runs the whole replay + transpose in VMEM:

* the replay math is diff/lane_replay.py:lane_math — the same function
  the XLA oracle path uses, written in Mosaic-lowerable SoA form;
* the transpose is machine-derived INSIDE the kernel: the body calls
  ``jax.vjp(lane_math, ...)`` at trace time, so Mosaic compiles the
  forward and its exact transpose as one fused kernel.  No hand-written
  chain rule anywhere.

HBM traffic collapses to the kernel's inputs and gradient outputs.
Winner/material/texture rows are gathered outside with one-hot matmuls
(MXU) and the per-lane row gradients are reduced back outside the same
way (``oh.T @ g`` — scatter-free); see diff/mega_bounce.py for the
gather/reduce glue and the background-term VJP that stays in XLA
(arbitrary jittable backgrounds, like the forward path).

Lane-level layout: rows of stacked [C, G, 128] arrays (C components per
lane) so the kernel takes 4 operands instead of ~60.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...diff.lane_replay import N_DET, lane_math

LANES = 128
BLOCK_G = 16


def _kernel(ttbl, diff_ref, det_ref, ct_ref, gdiff_ref, miss_ref, *,
            n_targets: int, has_motion: bool, has_box: bool,
            t_min: float, n_diff: int):
    diff_v = tuple(diff_ref[k] for k in range(n_diff))
    det_v = tuple(det_ref[k] for k in range(N_DET))
    ct_v = tuple(ct_ref[k] for k in range(12))

    if n_targets > 0:
        qs = [(ttbl[t, 0], ttbl[t, 1], ttbl[t, 2]) for t in range(n_targets)]
        us = [(ttbl[t, 3], ttbl[t, 4], ttbl[t, 5]) for t in range(n_targets)]
        vs = [(ttbl[t, 6], ttbl[t, 7], ttbl[t, 8]) for t in range(n_targets)]
        probs = [ttbl[t, 12] for t in range(n_targets)]
        tgt = (qs, us, vs, probs)
    else:
        tgt = ([], [], [], [])

    def f(*diff):
        return lane_math(diff, det_v, tgt, has_motion=has_motion,
                         has_box=has_box, t_min=t_min,
                         n_targets=n_targets, exact_trig=False)

    outs, vjp = jax.vjp(f, *diff_v)
    miss_ref[...] = outs[12]
    zero = jnp.zeros_like(outs[12])
    grads = vjp(ct_v + (zero,))
    for k in range(n_diff):
        gdiff_ref[k] = grads[k]


@functools.partial(
    jax.jit,
    static_argnames=("n_targets", "has_motion", "has_box", "t_min",
                     "interpret"))
def bounce_bwd_megakernel(ttbl, diff, det, cts, *, n_targets: int,
                          has_motion: bool, has_box: bool, t_min: float,
                          interpret: bool = False):
    """``diff`` [n_diff, G, 128], ``det`` [N_DET, G, 128], ``cts``
    [12, G, 128]; ``ttbl`` the pack_targets table.  Returns
    ``(gdiff [n_diff, G, 128], miss_f [G, 128])``."""
    n_diff, g, _ = diff.shape
    bg = min(BLOCK_G, g)
    grid = (pl.cdiv(g, bg),)

    def stacked(c):
        return pl.BlockSpec((c, bg, LANES), lambda i, *_: (0, i, 0),
                            memory_space=pltpu.VMEM)

    flat = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, n_targets=n_targets, has_motion=has_motion,
        has_box=has_box, t_min=t_min, n_diff=n_diff)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[stacked(n_diff), stacked(N_DET), stacked(12)],
        out_specs=[stacked(n_diff), flat],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_diff, g, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((g, LANES), jnp.float32)],
        interpret=interpret,
    )(ttbl, diff, det, cts)
