"""Self-gathering Pallas backward megakernel: replay + transpose for
scenes past the 64-row one-hot caps (mesh-scale differentiability).

The small-scene backward (bounce_bwd_kernel.py) receives winner rows
gathered OUTSIDE by one [R, N] one-hot matmul and reduces row gradients
back the same way — both explode linearly in N past ~64 rows
(diff/lane_replay.py MAX_REPLAY_*).  This kernel moves the gather and
the reduction INSIDE, with the same layout trick as the all-pairs
intersect kernels (allpairs_kernel.py:354-417): primitives ride the
SUBLANE axis, the 128 lanes of one row ride the LANE axis, and each
(row, 512-prim chunk) pair does one MXU ``dot_general``:

* gather: ``rows = tbl[chunk].T-contract (prim_iota == bi)`` — the
  [512, 128] one-hot lives only in VMEM/registers;
* reduce: ``g_tbl[chunk] += (prim_iota == bi) . g_rows`` — the exact
  transpose of the gather, scatter-free, accumulated across grid
  programs (TPU grid programs run sequentially, so read-modify-write
  on a full-array output ref is race-free).

Material / texture tables stay <= 64 rows and gather through per-row
[nm, 128] one-hots (no chunking needed).  The replay math and its
machine-derived transpose are the same ``jax.vjp(lane_math)`` as the
small-scene kernel — no hand-written chain rule.

Dense by construction: the diff wavefront's lanes are pixel-stationary
(not ray-binned), so winners spread across the whole table and
cond-skips per (row, chunk) would pay ~0.4 us each without skipping
anything; at bunny scale (4,968 tris) the dense gather+reduce adds
~N*R*cols/MXU ~ 1-2 ms per 2^18-lane iteration, far under the
generic XLA replay it replaces (reference parity: Geometry.hs:169-176 +
Ray.hs:174-224 — triangle-mesh paths must be differentiable, not just
Cornell quads).
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
CHUNK_P = 512          # prim rows per gather/reduce dot
N_LANE_DIFF = 10       # o (3), d (3), time, thr (3)
N_U = 8


def _kernel(ttbl, tbl_ref, mtbl_ref, xtbl_ref, *refs,
            n_targets: int, has_motion: bool, has_box: bool,
            t_min: float, n_row: int, n_tblc: int, chunks, nm_pad: int,
            nt_pad: int, bg: int):
    (bi_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
     tr_ref, tg_ref, tb_ref) = refs[:11]
    u_refs = refs[11:11 + N_U]
    alive_ref, hashit_ref = refs[11 + N_U:13 + N_U]
    ct_refs = refs[13 + N_U:13 + N_U + N_CT]
    out = refs[13 + N_U + N_CT:13 + N_U + N_CT + N_LANE_DIFF + 4]
    glane_out = out[:N_LANE_DIFF]
    miss_out = out[N_LANE_DIFF]
    gtbl_out = out[N_LANE_DIFF + 1]
    gmat_out = out[N_LANE_DIFF + 2]
    gtex_out = out[N_LANE_DIFF + 3]
    scr = refs[13 + N_U + N_CT + N_LANE_DIFF + 4:]     # VMEM scratch
    sc_rows = scr[:n_tblc]              # gathered tbl columns
    sc_mx = scr[n_tblc:n_tblc + 12]     # kind_m/tex_f/param + 9 tex cols
    sc_g = scr[n_tblc + 12:]            # row grads: n_row + param + c0 + c1

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtbl_out[...] = jnp.zeros_like(gtbl_out)
        gmat_out[...] = jnp.zeros_like(gmat_out)
        gtex_out[...] = jnp.zeros_like(gtex_out)

    hi = jax.lax.Precision.HIGHEST

    def onehot_tbl(bi_row, p0c, ln):
        piota = (jnp.float32(p0c) + jax.lax.broadcasted_iota(
            jnp.int32, (ln, 1), 0).astype(jnp.float32))
        return (piota == bi_row).astype(jnp.float32)       # [ln, 128]

    def small_onehot(val_row, npad):
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (npad, 1), 0).astype(jnp.float32)
        return (iota == val_row).astype(jnp.float32)       # [npad, 128]

    # ---- phase 1: per-row MXU one-hot gather into scratch ----
    for g in range(bg):
        gsl = (pl.ds(g, 1), slice(None))
        bi_row = bi_ref[gsl]                               # [1, 128]
        gt = jnp.zeros((n_tblc, LANES), jnp.float32)
        for p0c, ln in chunks:
            oh = onehot_tbl(bi_row, p0c, ln)
            gt = gt + jax.lax.dot_general(
                tbl_ref[pl.ds(p0c, ln), :], oh,
                (((0,), (0,)), ((), ())), precision=hi,
                preferred_element_type=jnp.float32)        # [n_tblc, 128]
        for j in range(n_tblc):
            sc_rows[j][gsl] = gt[j:j + 1, :]
        mat_f = gt[n_tblc - 1:n_tblc, :]                # [1, 128]
        oh_m = small_onehot(mat_f, nm_pad)
        mrows = jax.lax.dot_general(
            mtbl_ref[...], oh_m, (((0,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)  # [3, 128]
        tex_f = mrows[1:2, :]
        oh_t = small_onehot(tex_f, nt_pad)
        xrows = jax.lax.dot_general(
            xtbl_ref[...], oh_t, (((0,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)  # [9, 128]
        for j in range(3):
            sc_mx[j][gsl] = mrows[j:j + 1, :]
        for j in range(9):
            sc_mx[3 + j][gsl] = xrows[j:j + 1, :]

    # ---- phase 2: block-wide replay + machine-derived transpose ----
    if n_targets > 0:
        qs = [(ttbl[t, 0], ttbl[t, 1], ttbl[t, 2]) for t in range(n_targets)]
        us = [(ttbl[t, 3], ttbl[t, 4], ttbl[t, 5]) for t in range(n_targets)]
        vs = [(ttbl[t, 6], ttbl[t, 7], ttbl[t, 8]) for t in range(n_targets)]
        probs = [ttbl[t, 12] for t in range(n_targets)]
        tgt = (qs, us, vs, probs)
    else:
        tgt = ([], [], [], [])

    rows_v = tuple(sc_rows[j][...] for j in range(n_row))
    uvr_v = tuple(sc_rows[n_row + j][...] for j in range(6))
    kind_p = sc_rows[n_row + 6][...]
    kind_m = sc_mx[0][...]
    param_v = sc_mx[2][...]
    texkind = sc_mx[3][...]
    f0l = sc_mx[4][...]
    f1l = sc_mx[5][...]
    c0_v = tuple(sc_mx[6 + j][...] for j in range(3))
    c1_v = tuple(sc_mx[9 + j][...] for j in range(3))
    lane_v = (ox_ref[...], oy_ref[...], oz_ref[...], dx_ref[...],
              dy_ref[...], dz_ref[...], tm_ref[...])
    thr_v = (tr_ref[...], tg_ref[...], tb_ref[...])
    det_v = ((kind_p, kind_m, texkind, f0l, f1l) + uvr_v
             + tuple(r[...] for r in u_refs)
             + (alive_ref[...], hashit_ref[...]))
    ct_v = tuple(r[...] for r in ct_refs)

    def f(*diff):
        return lane_math(diff, det_v, tgt, has_motion=has_motion,
                         has_box=has_box, t_min=t_min,
                         n_targets=n_targets, exact_trig=False)

    diff_v = rows_v + c0_v + c1_v + (param_v,) + lane_v + thr_v
    outs, vjp = jax.vjp(f, *diff_v)
    miss_out[...] = outs[12]
    zero = jnp.zeros_like(outs[12])
    grads = vjp(ct_v + (zero,))
    g_rows = grads[:n_row]
    g_c0 = grads[n_row:n_row + 3]
    g_c1 = grads[n_row + 3:n_row + 6]
    g_param = grads[n_row + 6]
    for k in range(N_LANE_DIFF):
        glane_out[k][...] = grads[n_row + 7 + k]
    for j in range(n_row):
        sc_g[j][...] = g_rows[j]
    sc_g[n_row][...] = g_param
    for j in range(3):
        sc_g[n_row + 1 + j][...] = g_c0[j]
        sc_g[n_row + 4 + j][...] = g_c1[j]

    # ---- phase 3: per-row one-hot-transpose reduce (scatter-free) ----
    for g in range(bg):
        gsl = (pl.ds(g, 1), slice(None))
        bi_row = bi_ref[gsl]
        gstack = jnp.concatenate(
            [sc_g[j][gsl] for j in range(n_row)], axis=0)  # [n_row, 128]
        for p0c, ln in chunks:
            oh = onehot_tbl(bi_row, p0c, ln)
            acc = jax.lax.dot_general(
                oh, gstack, (((1,), (1,)), ((), ())), precision=hi,
                preferred_element_type=jnp.float32)        # [ln, n_row]
            psl = (pl.ds(p0c, ln), slice(None))
            gtbl_out[psl] = gtbl_out[psl] + acc
        mat_f = sc_rows[n_tblc - 1][gsl]
        oh_m = small_onehot(mat_f, nm_pad)
        gmat_out[...] = gmat_out[...] + oh_m * sc_g[n_row][gsl]
        tex_f = sc_mx[1][gsl]
        oh_t = small_onehot(tex_f, nt_pad)
        for j in range(6):
            tsl = (pl.ds(j * nt_pad, nt_pad), slice(None))
            gtex_out[tsl] = gtex_out[tsl] + oh_t * sc_g[n_row + 1 + j][gsl]


@functools.partial(
    jax.jit,
    static_argnames=("n_targets", "has_motion", "has_box", "t_min",
                     "interpret"))
def bounce_bwd_gather_megakernel(ttbl, tbl, mtbl, xtbl, bi, lane, u_cols,
                                 flags, cts, *, n_targets: int,
                                 has_motion: bool, has_box: bool,
                                 t_min: float, interpret: bool = False):
    """``tbl`` [Np, n_row+8] f32 (p0/e1/e2[/mv0/mv1], uvs(6), kind, mat;
    rows padded to a multiple of CHUNK_P with kind=-1, mat=0);
    ``mtbl`` [nm_pad, 3] (mat kind, tex id, param); ``xtbl`` [nt_pad, 9]
    (tex kind, f0, f1, c0, c1); ``bi`` [G, 128] winner index as f32
    (clamped >= 0); ``lane`` the 10 (o, d, time, thr) columns;
    ``u_cols`` the 8 uniforms; ``flags`` (alive_f, hashit_f); ``cts``
    the 12 cotangents — per-lane args all [G, 128] f32.

    Returns ``(g_lane(10), miss_f, g_tbl [Np, n_row],
    g_mat [nm_pad, 128], g_tex [6*nt_pad, 128])`` — table grads are
    accumulated over all lanes; the mat/tex grads still need a lane-axis
    sum outside (kept 2-D here: a [nm, 1] output would tile terribly).
    """
    n_tblc = tbl.shape[1]
    n_row = n_tblc - 8
    np_pad = tbl.shape[0]
    nm_pad = mtbl.shape[0]
    nt_pad = xtbl.shape[0]
    assert np_pad % CHUNK_P == 0 or np_pad < CHUNK_P
    chunks = tuple((p0, min(CHUNK_P, np_pad - p0))
                   for p0 in range(0, np_pad, CHUNK_P))
    g = bi.shape[0]
    bg = min(BLOCK_G, g)
    grid = (pl.cdiv(g, bg),)
    flat = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    full = lambda r, c: pl.BlockSpec((r, c), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM)
    lane_in = (bi,) + tuple(lane) + tuple(u_cols) + tuple(flags) \
        + tuple(cts)
    n_lane_in = len(lane_in)
    kernel = functools.partial(
        _kernel, n_targets=n_targets, has_motion=has_motion,
        has_box=has_box, t_min=t_min, n_row=n_row, n_tblc=n_tblc,
        chunks=chunks, nm_pad=nm_pad, nt_pad=nt_pad, bg=bg)
    n_scratch = n_tblc + 12 + (n_row + 7)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[full(np_pad, n_tblc), full(nm_pad, 3), full(nt_pad, 9)]
        + [flat] * n_lane_in,
        out_specs=[flat] * (N_LANE_DIFF + 1)
        + [full(np_pad, n_row), full(nm_pad, LANES),
           full(6 * nt_pad, LANES)],
        scratch_shapes=[pltpu.VMEM((bg, LANES), jnp.float32)] * n_scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((g, LANES), jnp.float32)]
        * (N_LANE_DIFF + 1)
        + [jax.ShapeDtypeStruct((np_pad, n_row), jnp.float32),
           jax.ShapeDtypeStruct((nm_pad, LANES), jnp.float32),
           jax.ShapeDtypeStruct((6 * nt_pad, LANES), jnp.float32)],
        interpret=interpret,
    )(ttbl, tbl, mtbl, xtbl, *lane_in)
    return (tuple(outs[:N_LANE_DIFF]), outs[N_LANE_DIFF],
            outs[N_LANE_DIFF + 1], outs[N_LANE_DIFF + 2],
            outs[N_LANE_DIFF + 3])
