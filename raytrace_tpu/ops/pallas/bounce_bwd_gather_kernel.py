"""Pallas backward megakernels for the fused-iteration diff driver.

Two variants share the replay machinery (``jax.vjp(lane_math)`` INSIDE
the kernel — no hand-written chain rule):

* :func:`bounce_bwd_regen_pre_megakernel` — the DEFAULT backward of
  diff/fused_iter.py at every fused-eligible scale: winner/material/
  texture rows arrive PRE-GATHERED per lane (XLA one-hot matmuls
  outside), while the detached regeneration/RNG/camera stage
  reconstructs IN-kernel from the saved integer coordinates
  (bit-identical int32 counter-hash), so the scan backward's XLA stage
  shrinks to the gathers.  Bunny-scale A/B (4,992 tris, 2^17 lanes,
  v5e): 3.99 M fwd+bwd rays/s vs 2.71 M for the generic XLA replay and
  1.78 M for the round-4 self-gathering kernel — which lost its A/B and
  was DELETED (the visit-list precedent; its per-(row, chunk) MXU
  one-hot dots were M=17-latency-bound with no viable batching: the
  dense gather/reduce streaming floor alone exceeded the whole
  replacement path).
* :func:`bounce_bwd_regen_megakernel` — opt-in (RT_FUSED_BWD_KERNEL=1)
  ONE-kernel variant that also moves the gathers in-kernel as
  per-(row, 512-prim-chunk) MXU one-hot dots; measured slower at small
  scale (69.9 vs 91.8 M bench rays/s, Cornell) — kept as the A/B
  reference exercised bit-for-bit by tests/test_fused_iter.py.

Reference parity: Geometry.hs:169-176 + Ray.hs:174-224 — triangle-mesh
paths must be differentiable, not just Cornell quads.
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
CHUNK_P = 512          # prim rows per in-kernel gather/reduce dot
N_LANE_DIFF = 10       # o (3), d (3), time, thr (3)
N_U = 8


# ---------------------------------------------------------------------
# Regen-reconstruction mode: the fused-iteration driver's backward.
# The forward (iter_kernel.py) fuses regeneration/RNG/camera into the
# bounce kernel; this variant reconstructs that detached stage IN the
# backward kernel from the saved integer coordinates — bit-identical
# int32 counter-hash RNG, same camera math — so the scan backward's
# XLA glue collapses to reshapes and the scene-gradient assembly.
# ---------------------------------------------------------------------

def _kernel_regen(ttbl, kt, cam, tbl_ref, mtbl_ref, xtbl_ref, *refs,
                  n_targets: int, has_motion: bool, has_box: bool,
                  t_min: float, n_row: int, n_tblc: int, chunks,
                  nm_pad: int, nt_pad: int, bg: int, n_u: int,
                  width: int, bg_kind: int):
    from .iter_kernel import (
        BG_GRAY, BG_SKY, _divmod_w, _u32c, _uniform_cols_i32,
    )
    import math as _math

    (bi_ref, pix_ref, smp_ref, dep_ref, al_ref) = refs[:5]
    comps_refs = refs[5:12]
    thr_refs = refs[12:15]
    scale_ref = refs[15]
    ct_refs = refs[16:29]
    out = refs[29:29 + 16]
    gcomps_out = out[:7]
    grad_out = out[7:10]
    gthr_out = out[10:13]
    gtbl_out = out[13]
    gmat_out = out[14]
    gtex_out = out[15]
    scr = refs[29 + 16:]
    sc_rows = scr[:n_tblc]
    sc_mx = scr[n_tblc:n_tblc + 12]
    sc_g = scr[n_tblc + 12:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtbl_out[...] = jnp.zeros_like(gtbl_out)
        gmat_out[...] = jnp.zeros_like(gmat_out)
        gtex_out[...] = jnp.zeros_like(gtex_out)

    hi = jax.lax.Precision.HIGHEST

    def onehot_tbl(bi_row, p0c, ln):
        piota = (jnp.float32(p0c) + jax.lax.broadcasted_iota(
            jnp.int32, (ln, 1), 0).astype(jnp.float32))
        return (piota == bi_row).astype(jnp.float32)

    def small_onehot(val_row, npad):
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (npad, 1), 0).astype(jnp.float32)
        return (iota == val_row).astype(jnp.float32)

    # ---- regen reconstruction (detached; iter_kernel.py semantics) ----
    pixv = pix_ref[...]
    smpv = smp_ref[...]
    depv = dep_ref[...]
    alv = al_ref[...] > 0.5
    biv = bi_ref[...]
    k0s, k1s = kt[0, 0], kt[0, 1]
    last_sample = kt[0, 2]
    can = ~alv & (smpv < last_sample)
    can_f = jnp.where(can, 1.0, 0.0)
    smp2 = jnp.where(can, smpv + 1, smpv)
    dep_pre = jnp.where(can, 0, depv)
    alive_pre = alv | can
    alive_pre_f = jnp.where(alive_pre, 1.0, 0.0)
    k0 = k0s ^ (pixv * _u32c(0x9E3779B1)) ^ (smp2 * _u32c(0x632BE5AB))
    k1 = k1s ^ (smp2 * _u32c(0x85EBCA77)) ^ (pixv * _u32c(0xB5297A4D))
    k0 = k0 + dep_pre * _u32c(0xC2B2AE3D)
    k1 = k1 ^ (dep_pre * _u32c(0x27D4EB2F))
    us = _uniform_cols_i32(k0, k1, n_u + 6)
    i_f, j_f = _divmod_w(pixv.astype(jnp.float32), width)
    u5 = us[n_u:n_u + 5]
    r_l = jnp.sqrt(u5[0])
    th = jnp.float32(2.0 * _math.pi) * u5[1]
    dr = cam[0, 18]
    da = r_l * jnp.cos(th) * dr
    db = r_l * jnp.sin(th) * dr
    ii = i_f + u5[2]
    jj = j_f + u5[3]
    n_o, n_d = [], []
    for k in range(3):
        okc = cam[0, 0 + k] + da * cam[0, 12 + k] + db * cam[0, 15 + k]
        tkc = cam[0, 3 + k] + ii * cam[0, 6 + k] + jj * cam[0, 9 + k]
        n_o.append(okc)
        n_d.append(tkc - okc)
    inv = jax.lax.rsqrt(jnp.maximum(
        n_d[0] * n_d[0] + n_d[1] * n_d[1] + n_d[2] * n_d[2], 1e-24))
    new7 = (n_o[0], n_o[1], n_o[2], n_d[0] * inv, n_d[1] * inv,
            n_d[2] * inv, u5[4])

    # ---- phase 1: winner gather (as _kernel) ----
    for g in range(bg):
        gsl = (pl.ds(g, 1), slice(None))
        bi_row = bi_ref[gsl]
        gt = jnp.zeros((n_tblc, LANES), jnp.float32)
        for p0c, ln in chunks:
            oh = onehot_tbl(bi_row, p0c, ln)
            gt = gt + jax.lax.dot_general(
                tbl_ref[pl.ds(p0c, ln), :], oh,
                (((0,), (0,)), ((), ())), precision=hi,
                preferred_element_type=jnp.float32)
        for j in range(n_tblc):
            sc_rows[j][gsl] = gt[j:j + 1, :]
        mat_f = gt[n_tblc - 1:n_tblc, :]
        oh_m = small_onehot(mat_f, nm_pad)
        mrows = jax.lax.dot_general(
            mtbl_ref[...], oh_m, (((0,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)
        tex_f = mrows[1:2, :]
        oh_t = small_onehot(tex_f, nt_pad)
        xrows = jax.lax.dot_general(
            xtbl_ref[...], oh_t, (((0,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)
        for j in range(3):
            sc_mx[j][gsl] = mrows[j:j + 1, :]
        for j in range(9):
            sc_mx[3 + j][gsl] = xrows[j:j + 1, :]

    # ---- phase 2: regen-selects + replay + bg, one vjp ----
    if n_targets > 0:
        qs = [(ttbl[t, 0], ttbl[t, 1], ttbl[t, 2]) for t in range(n_targets)]
        tus = [(ttbl[t, 3], ttbl[t, 4], ttbl[t, 5]) for t in range(n_targets)]
        tvs = [(ttbl[t, 6], ttbl[t, 7], ttbl[t, 8]) for t in range(n_targets)]
        probs = [ttbl[t, 12] for t in range(n_targets)]
        tgt = (qs, tus, tvs, probs)
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
    det_v = ((kind_p, kind_m, texkind, f0l, f1l) + uvr_v
             + tuple(us[:N_U])
             + (alive_pre_f, jnp.where(biv >= 0.0, 1.0, 0.0)))
    comps_in_v = tuple(r[...] for r in comps_refs)
    thr_in_v = tuple(r[...] for r in thr_refs)
    # 3e9, NOT the forward's 3e18 park: dead-lane grads are masked by
    # alive_pre_f anyway, and 3e18 overflows the record math for rows
    # with small edge x-components ((far/e1x)^2 > f32 max) — the inf
    # forward values turn zero cotangents into NaN in the transpose.
    far = jnp.float32(3e9)

    def f2(*diff):
        ci = diff[:7]
        ti = diff[7:10]
        rows = diff[10:10 + n_row]
        c0d = diff[10 + n_row:13 + n_row]
        c1d = diff[13 + n_row:16 + n_row]
        par = diff[16 + n_row]
        # linear regeneration selects (new7 detached), far-nulling
        pre = tuple(can_f * n + (1.0 - can_f) * c
                    for n, c in zip(new7, ci))
        ox_n = alive_pre_f * pre[0] + (1.0 - alive_pre_f) * far
        oy_n = alive_pre_f * pre[1] + (1.0 - alive_pre_f) * far
        oz_n = alive_pre_f * pre[2] + (1.0 - alive_pre_f) * far
        thr_pre = tuple(can_f + (1.0 - can_f) * t for t in ti)
        ld = (rows + c0d + c1d + (par,)
              + (ox_n, oy_n, oz_n, pre[3], pre[4], pre[5], pre[6])
              + thr_pre)
        outs = lane_math(ld, det_v, tgt, has_motion=has_motion,
                         has_box=has_box, t_min=t_min,
                         n_targets=n_targets, exact_trig=False)
        # in-kernel background on miss (iter_kernel.py kinds)
        if bg_kind == 1:                      # sky
            a_sky = 0.5 * (pre[4] + 1.0)
            bgc = ((1.0 - a_sky) + a_sky * 0.5,
                   (1.0 - a_sky) + a_sky * 0.7,
                   (1.0 - a_sky) + a_sky * 1.0)
        elif bg_kind == 2:                    # gray fade
            t_g = (pre[4] + 1.0) * 0.5
            bgc = (t_g, t_g, t_g)
        else:
            bgc = (cam[0, 20], cam[0, 21], cam[0, 22])
        rad = tuple(outs[6 + k] + outs[12] * tp * bgc[k]
                    for k, tp in enumerate(thr_pre))
        return outs[:6] + rad + outs[9:12] + (pre[6],)

    diff_v = comps_in_v + thr_in_v + rows_v + c0_v + c1_v + (param_v,)
    _, vjp = jax.vjp(f2, *diff_v)
    scale = scale_ref[...]
    ct_v = tuple(r[...] for r in ct_refs)
    # layout: ct_comps(7: o2 d2 time), ct_rad(3), ct_thr(3); thr cts
    # pre-scaled by the saved RR factor (survival prob detached)
    cts13 = (ct_v[0:6] + ct_v[7:10]
             + tuple(c * scale for c in ct_v[10:13]) + (ct_v[6],))
    grads = vjp(cts13)
    g_ci = grads[:7]
    g_ti = grads[7:10]
    g_rows = grads[10:10 + n_row]
    g_c0 = grads[10 + n_row:13 + n_row]
    g_c1 = grads[13 + n_row:16 + n_row]
    g_param = grads[16 + n_row]
    for k in range(7):
        gcomps_out[k][...] = g_ci[k]
    for k in range(3):
        # rad passthrough: rad2 = rad_in * (1 - can_f) + contrib
        grad_out[k][...] = ct_v[7 + k] * (1.0 - can_f)
        gthr_out[k][...] = g_ti[k]
    for j in range(n_row):
        sc_g[j][...] = g_rows[j]
    sc_g[n_row][...] = g_param
    for j in range(3):
        sc_g[n_row + 1 + j][...] = g_c0[j]
        sc_g[n_row + 4 + j][...] = g_c1[j]

    # ---- phase 3: one-hot-transpose reduce (as _kernel) ----
    for g in range(bg):
        gsl = (pl.ds(g, 1), slice(None))
        bi_row = bi_ref[gsl]
        gstack = jnp.concatenate(
            [sc_g[j][gsl] for j in range(n_row)], axis=0)
        for p0c, ln in chunks:
            oh = onehot_tbl(bi_row, p0c, ln)
            acc = jax.lax.dot_general(
                oh, gstack, (((1,), (1,)), ((), ())), precision=hi,
                preferred_element_type=jnp.float32)
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


# NB: deliberately NOT @jax.jit — this runs inside the scan backward of
# a custom-VJP, where a nested jit's closed_call jaxpr ends up holding
# tracer constants at MLIR while-lowering time ("No constant handler
# for DynamicJaxprTracer"); called un-jitted it inlines cleanly (the
# isolated-jit form lowers fine, the composition does not).
def bounce_bwd_regen_megakernel(ttbl, kt, cam, tbl, mtbl, xtbl, bi, ints,
                                al, comps_in, thr_in, scale, cts, *,
                                n_targets: int, has_motion: bool,
                                has_box: bool, t_min: float, n_u: int,
                                width: int, bg_kind: int,
                                interpret: bool = False):
    """Backward of one FUSED iteration (iter_kernel.py): reconstructs
    the detached regeneration/RNG/camera stage in-kernel from ``ints``
    = (pix, smp_in, dep_in) i32 and routes every cotangent through the
    linear regen selects, the replay transpose AND the winner one-hot
    reduction in one kernel.  ``cts`` = 13 columns (o2 (3), d2 (3),
    time, rad2 (3), thr2 (3)); ``scale`` the saved RR factor.  Returns
    ``(g_comps_in(7), g_rad_in(3), g_thr_in(3), g_tbl, g_mat, g_tex)``.
    """
    n_tblc = tbl.shape[1]
    n_row = n_tblc - 8
    np_pad = tbl.shape[0]
    nm_pad = mtbl.shape[0]
    nt_pad = xtbl.shape[0]
    chunks = tuple((p0, min(CHUNK_P, np_pad - p0))
                   for p0 in range(0, np_pad, CHUNK_P))
    g = bi.shape[0]
    bg = min(BLOCK_G, g)
    grid = (pl.cdiv(g, bg),)
    flat = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    full = lambda r, c: pl.BlockSpec((r, c), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM)
    lane_in = (bi,) + tuple(ints) + (al,) + tuple(comps_in) \
        + tuple(thr_in) + (scale,) + tuple(cts)
    kernel = functools.partial(
        _kernel_regen, n_targets=n_targets, has_motion=has_motion,
        has_box=has_box, t_min=t_min, n_row=n_row, n_tblc=n_tblc,
        chunks=chunks, nm_pad=nm_pad, nt_pad=nt_pad, bg=bg, n_u=n_u,
        width=width, bg_kind=bg_kind)
    n_scratch = n_tblc + 12 + (n_row + 7)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[full(np_pad, n_tblc), full(nm_pad, 3), full(nt_pad, 9)]
        + [flat] * len(lane_in),
        out_specs=[flat] * 13
        + [full(np_pad, n_row), full(nm_pad, LANES),
           full(6 * nt_pad, LANES)],
        scratch_shapes=[pltpu.VMEM((bg, LANES), jnp.float32)] * n_scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((g, LANES), jnp.float32)] * 13
        + [jax.ShapeDtypeStruct((np_pad, n_row), jnp.float32),
           jax.ShapeDtypeStruct((nm_pad, LANES), jnp.float32),
           jax.ShapeDtypeStruct((6 * nt_pad, LANES), jnp.float32)],
        interpret=interpret,
    )(ttbl, kt, cam, tbl, mtbl, xtbl, *lane_in)
    return (tuple(outs[0:7]), tuple(outs[7:10]), tuple(outs[10:13]),
            outs[13], outs[14], outs[15])


def _regen_stage(kt, cam, pixv, smpv, depv, alv, n_u: int, width: int):
    """Shared in-kernel regeneration/RNG/camera reconstruction
    (iter_kernel.py semantics, bit-identical int32 counter-hash).
    Returns ``(can_f, alive_pre_f, us, new7)``."""
    from .iter_kernel import _divmod_w, _u32c, _uniform_cols_i32
    import math as _math
    can = ~alv & (smpv < kt[0, 2])
    can_f = jnp.where(can, 1.0, 0.0)
    smp2 = jnp.where(can, smpv + 1, smpv)
    dep_pre = jnp.where(can, 0, depv)
    alive_pre_f = jnp.where(alv | can, 1.0, 0.0)
    k0 = kt[0, 0] ^ (pixv * _u32c(0x9E3779B1)) ^ (smp2 * _u32c(0x632BE5AB))
    k1 = kt[0, 1] ^ (smp2 * _u32c(0x85EBCA77)) ^ (pixv * _u32c(0xB5297A4D))
    k0 = k0 + dep_pre * _u32c(0xC2B2AE3D)
    k1 = k1 ^ (dep_pre * _u32c(0x27D4EB2F))
    us = _uniform_cols_i32(k0, k1, n_u + 6)
    i_f, j_f = _divmod_w(pixv.astype(jnp.float32), width)
    u5 = us[n_u:n_u + 5]
    r_l = jnp.sqrt(u5[0])
    th = jnp.float32(2.0 * _math.pi) * u5[1]
    dr = cam[0, 18]
    da = r_l * jnp.cos(th) * dr
    db = r_l * jnp.sin(th) * dr
    ii = i_f + u5[2]
    jj = j_f + u5[3]
    n_o, n_d = [], []
    for k in range(3):
        okc = cam[0, 0 + k] + da * cam[0, 12 + k] + db * cam[0, 15 + k]
        tkc = cam[0, 3 + k] + ii * cam[0, 6 + k] + jj * cam[0, 9 + k]
        n_o.append(okc)
        n_d.append(tkc - okc)
    inv = jax.lax.rsqrt(jnp.maximum(
        n_d[0] * n_d[0] + n_d[1] * n_d[1] + n_d[2] * n_d[2], 1e-24))
    new7 = (n_o[0], n_o[1], n_o[2], n_d[0] * inv, n_d[1] * inv,
            n_d[2] * inv, u5[4])
    return can_f, alive_pre_f, us, new7


def _kernel_regen_pre(ttbl, kt, cam, *refs, n_targets: int,
                      has_motion: bool, has_box: bool, t_min: float,
                      n_row: int, n_u: int, width: int, bg_kind: int):
    """Pre-gathered variant of :func:`_kernel_regen` for small tables:
    winner/material/texture rows arrive as per-lane operands (gathered
    outside by the [R, N] one-hot matmuls of the <=64-row path, where
    one big XLA matmul beats per-row kernel dots), while the detached
    regeneration/RNG/camera stage reconstructs IN-kernel from the saved
    integer coordinates — the scan backward's last XLA stage gone."""
    n_gath = n_row + 7 + 11          # rows + c0/c1/param + det columns
    rows_refs = refs[:n_row]
    c0_refs = refs[n_row:n_row + 3]
    c1_refs = refs[n_row + 3:n_row + 6]
    param_ref = refs[n_row + 6]
    det_refs = refs[n_row + 7:n_row + 18]    # kind_p kind_m texkind f0
    # f1 uvr(6)
    k = n_gath
    (bi_ref, pix_ref, smp_ref, dep_ref, al_ref) = refs[k:k + 5]
    comps_refs = refs[k + 5:k + 12]
    thr_refs = refs[k + 12:k + 15]
    scale_ref = refs[k + 15]
    ct_refs = refs[k + 16:k + 29]
    out = refs[k + 29:]
    grows_out = out[:n_row]
    gc0_out = out[n_row:n_row + 3]
    gc1_out = out[n_row + 3:n_row + 6]
    gparam_out = out[n_row + 6]
    gcomps_out = out[n_row + 7:n_row + 14]
    grad_out = out[n_row + 14:n_row + 17]
    gthr_out = out[n_row + 17:n_row + 20]

    can_f, alive_pre_f, us, new7 = _regen_stage(
        kt, cam, pix_ref[...], smp_ref[...], dep_ref[...],
        al_ref[...] > 0.5, n_u, width)

    if n_targets > 0:
        qs = [(ttbl[t, 0], ttbl[t, 1], ttbl[t, 2]) for t in range(n_targets)]
        tus = [(ttbl[t, 3], ttbl[t, 4], ttbl[t, 5]) for t in range(n_targets)]
        tvs = [(ttbl[t, 6], ttbl[t, 7], ttbl[t, 8]) for t in range(n_targets)]
        probs = [ttbl[t, 12] for t in range(n_targets)]
        tgt = (qs, tus, tvs, probs)
    else:
        tgt = ([], [], [], [])

    det_v = (tuple(r[...] for r in det_refs[:5])
             + tuple(r[...] for r in det_refs[5:11])
             + tuple(us[:N_U])
             + (alive_pre_f, jnp.where(bi_ref[...] >= 0.0, 1.0, 0.0)))
    comps_in_v = tuple(r[...] for r in comps_refs)
    thr_in_v = tuple(r[...] for r in thr_refs)
    # 3e9, NOT the forward's 3e18 park: dead-lane grads are masked by
    # alive_pre_f anyway, and 3e18 overflows the record math for rows
    # with small edge x-components ((far/e1x)^2 > f32 max) — the inf
    # forward values turn zero cotangents into NaN in the transpose.
    far = jnp.float32(3e9)

    def f2(*diff):
        ci = diff[:7]
        ti = diff[7:10]
        rows = diff[10:10 + n_row]
        c0d = diff[10 + n_row:13 + n_row]
        c1d = diff[13 + n_row:16 + n_row]
        par = diff[16 + n_row]
        pre = tuple(can_f * n + (1.0 - can_f) * c
                    for n, c in zip(new7, ci))
        ox_n = alive_pre_f * pre[0] + (1.0 - alive_pre_f) * far
        oy_n = alive_pre_f * pre[1] + (1.0 - alive_pre_f) * far
        oz_n = alive_pre_f * pre[2] + (1.0 - alive_pre_f) * far
        thr_pre = tuple(can_f + (1.0 - can_f) * t for t in ti)
        ld = (rows + c0d + c1d + (par,)
              + (ox_n, oy_n, oz_n, pre[3], pre[4], pre[5], pre[6])
              + thr_pre)
        outs = lane_math(ld, det_v, tgt, has_motion=has_motion,
                         has_box=has_box, t_min=t_min,
                         n_targets=n_targets, exact_trig=False)
        if bg_kind == 1:                      # sky
            a_sky = 0.5 * (pre[4] + 1.0)
            bgc = ((1.0 - a_sky) + a_sky * 0.5,
                   (1.0 - a_sky) + a_sky * 0.7,
                   (1.0 - a_sky) + a_sky * 1.0)
        elif bg_kind == 2:                    # gray fade
            t_g = (pre[4] + 1.0) * 0.5
            bgc = (t_g, t_g, t_g)
        else:
            bgc = (cam[0, 20], cam[0, 21], cam[0, 22])
        rad = tuple(outs[6 + k2] + outs[12] * tp * bgc[k2]
                    for k2, tp in enumerate(thr_pre))
        return outs[:6] + rad + outs[9:12] + (pre[6],)

    diff_v = (comps_in_v + thr_in_v + tuple(r[...] for r in rows_refs)
              + tuple(r[...] for r in c0_refs)
              + tuple(r[...] for r in c1_refs) + (param_ref[...],))
    _, vjp = jax.vjp(f2, *diff_v)
    scale = scale_ref[...]
    ct_v = tuple(r[...] for r in ct_refs)
    cts13 = (ct_v[0:6] + ct_v[7:10]
             + tuple(c * scale for c in ct_v[10:13]) + (ct_v[6],))
    grads = vjp(cts13)
    for k2 in range(7):
        gcomps_out[k2][...] = grads[k2]
    for k2 in range(3):
        grad_out[k2][...] = ct_v[7 + k2] * (1.0 - can_f)
        gthr_out[k2][...] = grads[7 + k2]
    for j in range(n_row):
        grows_out[j][...] = grads[10 + j]
    for j in range(3):
        gc0_out[j][...] = grads[10 + n_row + j]
        gc1_out[j][...] = grads[13 + n_row + j]
    gparam_out[...] = grads[16 + n_row]


def bounce_bwd_regen_pre_megakernel(ttbl, kt, cam, gath, bi, ints, al,
                                    comps_in, thr_in, scale, cts, *,
                                    n_targets: int, has_motion: bool,
                                    has_box: bool, t_min: float,
                                    n_row: int, n_u: int, width: int,
                                    bg_kind: int,
                                    interpret: bool = False):
    """``gath``: the n_row+18 pre-gathered per-lane columns in kernel
    operand order (rows, c0, c1, param, kind_p, kind_m, texkind, f0,
    f1, uvr(6)); ``bi`` the winner index as f32 (clamped >= 0);
    ``ints`` = (pix, smp, dep) i32 — all [G, 128].
    Returns ``(g_rows(n_row), g_c0(3), g_c1(3), g_param,
    g_comps_in(7), g_rad_in(3), g_thr_in(3))``.  Un-jitted for the same
    reason as :func:`bounce_bwd_regen_megakernel`."""
    g = al.shape[0]
    bg = min(BLOCK_G, g)
    grid = (pl.cdiv(g, bg),)
    flat = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    lane_in = tuple(gath) + (bi,) + tuple(ints) + (al,) \
        + tuple(comps_in) + tuple(thr_in) + (scale,) + tuple(cts)
    n_out = n_row + 20
    kernel = functools.partial(
        _kernel_regen_pre, n_targets=n_targets, has_motion=has_motion,
        has_box=has_box, t_min=t_min, n_row=n_row, n_u=n_u, width=width,
        bg_kind=bg_kind)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[flat] * len(lane_in),
        out_specs=[flat] * n_out,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((g, LANES), jnp.float32)] * n_out,
        interpret=interpret,
    )(ttbl, kt, cam, *lane_in)
    return (tuple(outs[:n_row]), tuple(outs[n_row:n_row + 3]),
            tuple(outs[n_row + 3:n_row + 6]), outs[n_row + 6],
            tuple(outs[n_row + 7:n_row + 14]),
            tuple(outs[n_row + 14:n_row + 17]),
            tuple(outs[n_row + 17:n_row + 20]))
