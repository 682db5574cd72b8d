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
way (``oh.T @ g`` — scatter-free); see diff/lane_replay.py:
replay_bwd_pallas for the gather/reduce glue and the background-term VJP
that stays in XLA (arbitrary jittable backgrounds, like the forward
path).

Every per-lane quantity is its own [G, 128] operand — a [R] -> [G, 128]
reshape is free, whereas stacking rows into one [C, G, 128] array
materializes a real HBM copy per launch (~0.2 ms/iteration of pure
glue when this kernel used stacked operands).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...diff.lane_replay import N_DET, lane_math

LANES = 128
BLOCK_G = 32
N_CT = 12


def _kernel(ttbl, *refs, n_targets: int, has_motion: bool, has_box: bool,
            t_min: float, n_diff: int):
    diff_v = tuple(refs[k][...] for k in range(n_diff))
    det_v = tuple(refs[n_diff + k][...] for k in range(N_DET))
    ct_v = tuple(refs[n_diff + N_DET + k][...] for k in range(N_CT))
    out_refs = refs[n_diff + N_DET + N_CT:]

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
    out_refs[n_diff][...] = outs[12]                    # miss_f
    zero = jnp.zeros_like(outs[12])
    grads = vjp(ct_v + (zero,))
    for k in range(n_diff):
        out_refs[k][...] = grads[k]


@functools.partial(
    jax.jit,
    static_argnames=("n_targets", "has_motion", "has_box", "t_min",
                     "interpret"))
def bounce_bwd_megakernel(ttbl, diff, det, cts, *, n_targets: int,
                          has_motion: bool, has_box: bool, t_min: float,
                          interpret: bool = False):
    """``diff`` / ``det`` / ``cts``: tuples of [G, 128] f32 arrays (the
    differentiable lane inputs, the detached context, the 12 output
    cotangents); ``ttbl`` the pack_targets table.  Returns
    ``(gdiff tuple, miss_f)``."""
    n_diff = len(diff)
    assert len(det) == N_DET and len(cts) == N_CT
    g = diff[0].shape[0]
    bg = min(BLOCK_G, g)
    grid = (pl.cdiv(g, bg),)
    flat = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    n_in = n_diff + N_DET + N_CT
    kernel = functools.partial(
        _kernel, n_targets=n_targets, has_motion=has_motion,
        has_box=has_box, t_min=t_min, n_diff=n_diff)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[flat] * n_in,
        out_specs=[flat] * (n_diff + 1),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((g, LANES), jnp.float32)]
        * (n_diff + 1),
        interpret=interpret,
    )(ttbl, *diff, *det, *cts)
    return tuple(outs[:n_diff]), outs[n_diff]
