"""Fused wavefront-ITERATION megakernel: regeneration + RNG + camera +
full bounce + Russian roulette + death bookkeeping in ONE Pallas kernel.

Measured motivation (tools/prof_glue.py, v5e): the full-bounce kernel
accounts for ~0.40 ms of a 0.49 ms diff-wavefront forward iteration at
2^18 lanes — the rest is XLA glue (counter-hash RNG block, camera ray
generation, regeneration selects, RR, accumulation), each an [R]-sized
HBM round trip.  The per-iteration cost floor this glue sets is also
what makes the compacted completion-schedule phases pay only ~45% less
than full-width iterations (tools/prof_twophase.py width sweep).  This
kernel moves the whole iteration body into VMEM:

* RNG: the counter-hash stream of core/rng.py (ray_keys_fast +
  mix_depth + uniform_block's pair16 path) re-expressed in int32 —
  every op is a wrapping multiply / xor / logical shift, so the int32
  lowering is BIT-IDENTICAL to the XLA uint32 stream (two's-complement
  wrap == mod-2^32).  The keys carry disappears from the scan state.
* camera: generate_ray_components (render/camera.py:155-183) — thin
  lens, pixel jitter, per-sample time.
* bounce: the shared prim_loop + _shade_values stages (bounce_kernel).
* post: constant/sky/gray background on miss (in-kernel; arbitrary
  jittable backgrounds take the unfused path), depth cap, Russian
  roulette (render/integrator.py:_russian_roulette, detached).

The differentiable wrapper (diff/fused_iter.py) gives the whole
iteration a custom VJP: the backward replays the bounce through the
existing Pallas replay kernel (diff/lane_replay.py) and reconstructs
the regeneration/RNG/camera stage in XLA from the saved integer
coordinates — those stages are detached (sampling) or linear (selects),
exactly the discipline of the unfused path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bounce_kernel import N_U, _shade_values
from .intersect_kernel import LANES, prim_loop

BLOCK_G = 32

# background kinds the kernel can evaluate in-VMEM (render/camera.py)
BG_CONST = 0
BG_SKY = 1
BG_GRAY = 2

N_CAM = 24          # cam scalar-table columns (f32)
N_KT = 4            # kt scalar-table columns (i32)
N_LANE_IN = 17      # pix smp dep al + comps(7) + rad(3) + thr(3)
N_OUT = 21          # comps2(7) rad2(3) thr2(3) al2 smp dep died idx scale


def _u32c(x):
    """uint32 literal as a wrapping int32 constant (same bits)."""
    return jnp.int32(np.uint32(x).astype(np.int32))


def _shr(h, k):
    return jax.lax.shift_right_logical(h, jnp.int32(k))


def _finalize2_i32(h, k1):
    """core/rng.py:_finalize2 on int32 (bit-identical: mul/xor/logical
    shifts are sign-agnostic mod 2^32)."""
    h = h ^ _shr(h, 16)
    h = h * _u32c(0x21F0AAAD)
    h = h ^ _shr(h, 15)
    h = h * _u32c(0x735A2D97)
    h = h ^ _shr(h, 15)
    h = h ^ k1
    h = h ^ _shr(h, 16)
    h = h * _u32c(0xD35A2D97)
    h = h ^ _shr(h, 15)
    return h


def _uniform_cols_i32(k0, k1, n: int):
    """core/rng.py:uniform_block pair16 path: two 16-bit uniforms per
    hash word; returns a python list of ``n`` f32 arrays."""
    m = (n + 1) // 2
    los, his = [], []
    for c in range(m):
        h = _finalize2_i32(k0 + jnp.int32(c) * _u32c(0x9E3779B9), k1)
        los.append((h & jnp.int32(0xFFFF)).astype(jnp.float32))
        his.append(_shr(h, 16).astype(jnp.float32))
    scale = jnp.float32(1.0 / (1 << 16))
    return [u * scale for u in (los + his)[:n]]


def _divmod_w(pixf, w: int):
    """Exact (i, j) = (pix % w, pix // w) in f32 for pix < 2^24 with
    integer-exact fixups (one f32 divide can round across a boundary)."""
    jf = jnp.floor(pixf * jnp.float32(1.0 / w))
    i = pixf - jf * jnp.float32(w)
    over = i >= jnp.float32(w)
    under = i < 0.0
    jf = jnp.where(over, jf + 1.0, jnp.where(under, jf - 1.0, jf))
    i = jnp.where(over, i - jnp.float32(w),
                  jnp.where(under, i + jnp.float32(w), i))
    return i, jf


def _iter_kernel(ptbl, ctbl, gtbl, mtbl, ttbl, cam, kt, *refs,
                 n_prims: int, n_mats: int, n_targets: int, t_min: float,
                 has_motion: bool, use_prim_albedo: bool, has_box: bool,
                 segments, kinds, two_level: bool, n_u: int,
                 rr_depth, max_depth: int, width: int, bg_kind: int,
                 with_uv: bool = False, ap_plan=None):
    (pix, smp, dep, al, ox, oy, oz, dx, dy, dz, tm,
     rr, rg, rb, tr, tg, tb) = refs[:N_LANE_IN]
    (ox_o, oy_o, oz_o, dx_o, dy_o, dz_o, tm_o, rr_o, rg_o, rb_o,
     tr_o, tg_o, tb_o, al_o, smp_o, dep_o, dd_o, pi_o, sc_o) \
        = refs[N_LANE_IN:N_LANE_IN + 19]
    if with_uv:
        uu_o, vv_o = refs[N_LANE_IN + 19:N_LANE_IN + 21]
    n_out = 19 + (2 if with_uv else 0)
    scr = refs[N_LANE_IN + n_out:]

    pixv = pix[...]
    smpv = smp[...]
    depv = dep[...]
    alv = al[...] > 0.5
    k0s, k1s = kt[0, 0], kt[0, 1]
    last_sample = kt[0, 2]

    # ---- regeneration (trace_wavefront_diff body, k_rot == 1) ----
    can = ~alv & (smpv < last_sample)
    can_f = jnp.where(can, 1.0, 0.0)
    smp2 = jnp.where(can, smpv + 1, smpv)
    dep_pre = jnp.where(can, 0, depv)
    alive_pre = alv | can

    # ---- RNG: ray_keys_fast + mix_depth + uniform_block (pair16) ----
    k0 = k0s ^ (pixv * _u32c(0x9E3779B1)) ^ (smp2 * _u32c(0x632BE5AB))
    k1 = k1s ^ (smp2 * _u32c(0x85EBCA77)) ^ (pixv * _u32c(0xB5297A4D))
    k0 = k0 + dep_pre * _u32c(0xC2B2AE3D)
    k1 = k1 ^ (dep_pre * _u32c(0x27D4EB2F))
    us = _uniform_cols_i32(k0, k1, n_u + 6)

    # ---- camera (render/camera.py:generate_ray_components) ----
    i_f, j_f = _divmod_w(pixv.astype(jnp.float32), width)
    u5 = us[n_u:n_u + 5]
    r_l = jnp.sqrt(u5[0])
    th = jnp.float32(2.0 * math.pi) * u5[1]
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

    oxv = jnp.where(can, n_o[0], ox[...])
    oyv = jnp.where(can, n_o[1], oy[...])
    ozv = jnp.where(can, n_o[2], oz[...])
    dxv = jnp.where(can, n_d[0] * inv, dx[...])
    dyv = jnp.where(can, n_d[1] * inv, dy[...])
    dzv = jnp.where(can, n_d[2] * inv, dz[...])
    tmv = jnp.where(can, u5[4], tm[...])
    rad_r = rr[...] * (1.0 - can_f)
    rad_g = rg[...] * (1.0 - can_f)
    rad_b = rb[...] * (1.0 - can_f)
    thr_r = jnp.where(can, 1.0, tr[...])
    thr_g = jnp.where(can, 1.0, tg[...])
    thr_b = jnp.where(can, 1.0, tb[...])

    # dead (budget-exhausted) lanes: stale origins poison block consensus
    # — send them far outside (integrator.bounce_mega_soa)
    far = jnp.float32(3e18)
    box = jnp.where(alive_pre, oxv, far)
    boy = jnp.where(alive_pre, oyv, far)
    boz = jnp.where(alive_pre, ozv, far)

    # ---- bounce: intersect + shared shade stages ----
    if ap_plan is not None:
        # mesh-scale: broadcast all-pairs sweep (prims on sublanes, rays
        # on lanes; per-row chunk/sub-cluster slab consensus — the split
        # path's intersect engine, allpairs_kernel.row_phases) instead
        # of the per-prim clustered loop.  Ray comps round-trip through
        # VMEM scratch so rows can be ref-sliced; winner attrs come from
        # the phase-2 one-hot gather.  ctbl carries the CLUSTER boxes,
        # gtbl the CHUNK boxes here.
        from .allpairs_kernel import _winner_attrs, row_phases
        (sox, soy, soz, sdx, sdy, sdz, stm, s_t, s_bi, s_nx, s_ny,
         s_nz, s_fr, s_uu, s_vv, s_mat, s_sph) = scr[:17]
        if use_prim_albedo:
            s_ar, s_ag, s_ab, s_pp = scr[17:21]
        for ref, v in zip((sox, soy, soz, sdx, sdy, sdz, stm),
                          (box, boy, boz, dxv, dyv, dzv, tmv)):
            ref[...] = v
        inf = jnp.float32(jnp.inf)
        ap_kinds = tuple(sorted({sp[0] for sp in ap_plan}))

        def rb(g, _):
            sl = (pl.ds(g, 1), slice(None))
            ox_r, oy_r, oz_r = sox[sl], soy[sl], soz[sl]
            dx_r, dy_r, dz_r = sdx[sl], sdy[sl], sdz[sl]
            tm_r = stm[sl] if has_motion else None
            bt, bi, gt = row_phases(
                ptbl, gtbl, ctbl, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
                tm_r, seg_plan=ap_plan, t_min=t_min,
                has_motion=has_motion, subc=True, stream=False,
                vis_ref=scr[-2], list_ref=scr[-1])
            c = lambda j: gt[j:j + 1, :]
            n_x, n_y, n_z, fr, uu2, vv2, sphf = _winner_attrs(
                c, bt, bt < inf, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
                tm_r, kinds=ap_kinds, has_motion=has_motion)
            # prim_loop contract: normal already faces the ray
            flip = jnp.where(fr > 0.5, 1.0, -1.0)
            s_t[sl] = bt
            s_bi[sl] = bi
            s_nx[sl] = n_x * flip
            s_ny[sl] = n_y * flip
            s_nz[sl] = n_z * flip
            s_fr[sl] = fr
            s_uu[sl] = uu2
            s_vv[sl] = vv2
            s_mat[sl] = c(17)
            s_sph[sl] = sphf
            if use_prim_albedo:
                s_ar[sl] = c(31)
                s_ag[sl] = c(32)
                s_ab[sl] = c(33)
                s_pp[sl] = c(34)
            return 0

        jax.lax.fori_loop(0, pixv.shape[0], rb, 0)
        hit_res = (s_t[...], s_bi[...], s_nx[...], s_ny[...], s_nz[...],
                   s_fr[...], s_uu[...], s_vv[...], s_mat[...],
                   s_sph[...])
        if use_prim_albedo:
            hit_res = hit_res + (s_ar[...], s_ag[...], s_ab[...],
                                 s_pp[...])
    else:
        hit_res = prim_loop(
            ptbl, box, boy, boz, dxv, dyv, dzv,
            tmv if has_motion else None,
            n_prims=n_prims, t_min=t_min, has_motion=has_motion,
            ctbl_ref=ctbl, with_albedo=use_prim_albedo, has_box=has_box,
            segments=segments, kinds=kinds,
            gtbl_ref=gtbl if two_level else None)
    sh = _shade_values(
        hit_res, mtbl, ttbl, box, boy, boz, dxv, dyv, dzv,
        thr_r, thr_g, thr_b, alive_pre, us[:N_U],
        n_mats=n_mats, n_targets=n_targets,
        use_prim_albedo=use_prim_albedo, with_uv=with_uv)
    (o2x, o2y, o2z, d2x, d2y, d2z, t2r, t2g, t2b,
     emr, emg, emb, na_f, miss_f, bi) = sh[:15]

    # ---- background on miss (in-kernel kinds only) ----
    if bg_kind == BG_SKY:
        a_sky = 0.5 * (dyv + 1.0)
        bgr = (1.0 - a_sky) + a_sky * 0.5
        bgg = (1.0 - a_sky) + a_sky * 0.7
        bgb = (1.0 - a_sky) + a_sky * 1.0
    elif bg_kind == BG_GRAY:
        t_g = (dyv + 1.0) * 0.5
        bgr = bgg = bgb = t_g
    else:
        bgr, bgg, bgb = cam[0, 20], cam[0, 21], cam[0, 22]
    rad2_r = rad_r + emr + miss_f * thr_r * bgr
    rad2_g = rad_g + emg + miss_f * thr_g * bgg
    rad2_b = rad_b + emb + miss_f * thr_b * bgb

    # ---- depth cap + Russian roulette (integrator.py:580-602) ----
    dep2 = dep_pre + 1
    alive_b = na_f > 0.5
    capped = alive_b & (dep2 >= max_depth)
    died = (alive_pre & ~alive_b) | capped
    alive2 = alive_b & ~capped
    if rr_depth is not None:
        thr_max = jnp.maximum(t2r, jnp.maximum(t2g, t2b))
        p_srv = jnp.clip(thr_max, cam[0, 19], 1.0)
        do_rr = dep2 >= jnp.int32(rr_depth)
        kill = do_rr & (us[n_u + 5] >= p_srv)
        scale = jnp.where(do_rr & ~kill, 1.0 / p_srv, 1.0)
        t2r = t2r * scale
        t2g = t2g * scale
        t2b = t2b * scale
        died = died | (alive2 & kill)
        alive2 = alive2 & ~kill
    else:
        scale = jnp.ones_like(t2r)

    ox_o[...] = o2x
    oy_o[...] = o2y
    oz_o[...] = o2z
    dx_o[...] = d2x
    dy_o[...] = d2y
    dz_o[...] = d2z
    tm_o[...] = tmv
    rr_o[...] = rad2_r
    rg_o[...] = rad2_g
    rb_o[...] = rad2_b
    tr_o[...] = t2r
    tg_o[...] = t2g
    tb_o[...] = t2b
    al_o[...] = jnp.where(alive2, 1.0, 0.0)
    smp_o[...] = smp2
    dep_o[...] = dep2
    dd_o[...] = jnp.where(died, 1.0, 0.0)
    pi_o[...] = bi
    sc_o[...] = scale
    if with_uv:
        uu_o[...] = sh[15]
        vv_o[...] = sh[16]


@functools.partial(
    jax.jit,
    static_argnames=("n_prims", "n_mats", "n_targets", "t_min",
                     "has_motion", "use_prim_albedo", "has_box",
                     "segments", "kinds", "n_u", "rr_depth", "max_depth",
                     "width", "bg_kind", "with_uv", "use_ap",
                     "interpret"))
def iter_megakernel(ptbl, ctbl, mtbl, ttbl, cam, kt, lane_in, *,
                    n_prims: int, n_mats: int, n_targets: int,
                    t_min: float, has_motion: bool, use_prim_albedo: bool,
                    has_box: bool, segments, kinds, n_u: int, rr_depth,
                    max_depth: int, width: int, bg_kind: int,
                    with_uv: bool = False, use_ap=None,
                    interpret: bool = False):
    """``lane_in``: 17 [G, 128] arrays (pix/smp/dep i32, al f32, comps 7,
    rad 3, thr 3).  Returns the 19 [G, 128] outputs of ``_iter_kernel``
    (comps2 7, rad2 3, thr2 3, alive2, smp2 i32, dep2 i32, died_f,
    winner idx f32, rr_scale); ``with_uv`` appends the winner's
    (uu, vv) for the deferred rich-texture post-multiply
    (diff/fused_iter.py)."""
    from .intersect_kernel import (
        BLOCK_G_CLUSTERED, CLUSTER, CLUSTER_MIN_PRIMS, GROUP_MIN_CLUSTERS,
        MAX_SMEM_PRIMS, pack_cluster_groups,
    )
    # mesh-scale intersect stage: broadcast all-pairs sweep inside the
    # fused kernel (lane state relabeled to W-wide rows) — the same
    # engine that beats the clustered loop ~3.6x on the forward split
    # path.  ``use_ap=None`` resolves from RT_ITER_AP_MIN at trace time;
    # callers that must honor per-call env changes (A/B tests) resolve
    # it themselves and pass a bool (this function's jit caches on it).
    if use_ap is None:
        use_ap = resolve_use_ap(n_prims, segments)
    if use_ap:
        return _iter_mega_ap(
            ptbl, ctbl, mtbl, ttbl, cam, kt, lane_in, n_prims=n_prims,
            n_mats=n_mats, n_targets=n_targets, t_min=t_min,
            has_motion=has_motion, use_prim_albedo=use_prim_albedo,
            has_box=has_box, segments=segments, kinds=kinds, n_u=n_u,
            rr_depth=rr_depth, max_depth=max_depth, width=width,
            bg_kind=bg_kind, with_uv=with_uv, interpret=interpret)
    two_level = (n_prims >= CLUSTER_MIN_PRIMS
                 and -(-n_prims // CLUSTER) >= GROUP_MIN_CLUSTERS)
    gtbl = pack_cluster_groups(ctbl) if two_level \
        else jnp.zeros((1, 8), jnp.float32)
    g = lane_in[0].shape[0]
    bg = min(BLOCK_G_CLUSTERED if n_prims >= CLUSTER_MIN_PRIMS else BLOCK_G,
             g)
    grid = (pl.cdiv(g, bg),)
    spec = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _iter_kernel, n_prims=n_prims, n_mats=n_mats, n_targets=n_targets,
        t_min=t_min, has_motion=has_motion,
        use_prim_albedo=use_prim_albedo, has_box=has_box,
        segments=segments, kinds=kinds, two_level=two_level, n_u=n_u,
        rr_depth=rr_depth, max_depth=max_depth, width=width,
        bg_kind=bg_kind, with_uv=with_uv)
    n_out = 19 + (2 if with_uv else 0)
    out_shape = ([jax.ShapeDtypeStruct((g, LANES), jnp.float32)] * 14
                 + [jax.ShapeDtypeStruct((g, LANES), jnp.int32)] * 2
                 + [jax.ShapeDtypeStruct((g, LANES), jnp.float32)]
                 * (n_out - 16))
    if n_prims <= MAX_SMEM_PRIMS:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=grid,
            in_specs=[spec] * N_LANE_IN,
            out_specs=[spec] * n_out,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(ptbl, ctbl, gtbl, mtbl, ttbl, cam, kt, *lane_in)

    # mesh-scale tables (bunny: 4,992 rows): the primitive table lives
    # whole in VMEM while the small cluster/material/target/camera/key
    # tables stay scalar-prefetched — the bounce_megakernel layout
    def kernel_vmem(ctbl_ref, gtbl_ref, mtbl_ref, ttbl_ref, cam_ref,
                    kt_ref, ptbl_ref, *rest):
        kernel(ptbl_ref, ctbl_ref, gtbl_ref, mtbl_ref, ttbl_ref,
               cam_ref, kt_ref, *rest)

    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=grid,
        in_specs=[tbl_spec] + [spec] * N_LANE_IN,
        out_specs=[spec] * n_out,
    )
    return pl.pallas_call(
        kernel_vmem,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ctbl, gtbl, mtbl, ttbl, cam, kt, ptbl, *lane_in)


import os as _os

# prim-count threshold above which the fused iteration kernel swaps its
# clustered per-prim intersect loop for the broadcast all-pairs sweep
# (per-W-lane-row chunk + 64-prim sub-cluster slab consensus).  A/B on
# the bunny (4,992 tris, 2^17 lanes, diff wavefront) — see ROADMAP.
# Bunny A/B (4,992 tris, 2^17 lanes, diff wavefront, v5e): clustered
# loop 5.25 M fwd+bwd -> ap 7.17 at W=512 -> 7.88 at W=1024 (W=2048
# trips a Mosaic 'closed_call' lowering bug) -> ~7.98 at 32k-lane
# blocks; 10.4-10.6 M with the retuned completion schedule
# (tools/prof_bunny_grad.py).  512 keeps demo1 (exactly 512 rows) and
# every small scene on the clustered loop.
ITER_AP_MIN = 512
ITER_AP_W = int(_os.environ.get("RT_ITER_AP_W", "1024"))
ITER_AP_BLOCK = int(_os.environ.get("RT_ITER_AP_BLOCK", "32768"))


def resolve_use_ap(n_prims: int, segments) -> bool:
    """Env-resolved (per call) choice of the fused kernel's intersect
    stage — builders call this OUTSIDE jit so RT_ITER_AP_MIN changes
    take effect between calls."""
    ap_min = int(_os.environ.get("RT_ITER_AP_MIN", str(ITER_AP_MIN)))
    return segments is not None and ap_min < n_prims <= 65536


def _iter_mega_ap(ptbl, ctbl, mtbl, ttbl, cam, kt, lane_in, *,
                  n_prims: int, n_mats: int, n_targets: int, t_min: float,
                  has_motion: bool, use_prim_albedo: bool, has_box: bool,
                  segments, kinds, n_u: int, rr_depth, max_depth: int,
                  width: int, bg_kind: int, with_uv: bool,
                  interpret: bool):
    """Mesh-scale fused iteration: same one-kernel body, but the
    intersect stage is the broadcast all-pairs sweep
    (allpairs_kernel.row_phases) over lane state relabeled from
    [G, 128] to W-wide rows (pure relabel; fewer, wider row iterations
    amortize the per-row slab/cond fixed costs exactly as in the
    standalone kernel).  The primitive table lives whole in VMEM;
    CHUNK boxes ride the gtbl slot, CLUSTER boxes the ctbl slot."""
    from .allpairs_kernel import dyn_tables

    w = ITER_AP_W
    g = lane_in[0].shape[0]
    mult = w // LANES
    pad_rows = (-g) % mult
    if pad_rows:
        # pad lanes: dead (al=0), sample budget exhausted (never
        # regenerate), parked far away; outputs sliced off below
        fills = ([0, 2 ** 30, 0, 0.0] + [3e18] * 3 + [1.0, 0.0, 0.0]
                 + [0.0] * 7)
        lane_in = tuple(
            jnp.concatenate(
                [a, jnp.full((pad_rows, LANES), f, a.dtype)])
            for a, f in zip(lane_in, fills))
    rows = (g + pad_rows) // mult
    lane_r = tuple(x.reshape(rows, w) for x in lane_in)
    tbl, cbox, clbox, seg_plan = dyn_tables(ptbl, ctbl, segments, n_prims)

    rg = min(max(ITER_AP_BLOCK // w, 4), rows)
    grid = (pl.cdiv(rows, rg),)
    spec = pl.BlockSpec((rg, w), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    n_out = 19 + (2 if with_uv else 0)
    out_shape = ([jax.ShapeDtypeStruct((rows, w), jnp.float32)] * 14
                 + [jax.ShapeDtypeStruct((rows, w), jnp.int32)] * 2
                 + [jax.ShapeDtypeStruct((rows, w), jnp.float32)]
                 * (n_out - 16))
    n_scr = 17 + (4 if use_prim_albedo else 0)
    scratch = [pltpu.VMEM((rg, w), jnp.float32)] * n_scr \
        + [pltpu.VMEM((cbox.shape[0], 1), jnp.float32),   # batched vis
           pltpu.SMEM((cbox.shape[0],), jnp.int32)]       # chunk list
    kernel = functools.partial(
        _iter_kernel, n_prims=n_prims, n_mats=n_mats,
        n_targets=n_targets, t_min=t_min, has_motion=has_motion,
        use_prim_albedo=use_prim_albedo, has_box=has_box,
        segments=segments, kinds=kinds, two_level=False, n_u=n_u,
        rr_depth=rr_depth, max_depth=max_depth, width=width,
        bg_kind=bg_kind, with_uv=with_uv, ap_plan=seg_plan)

    # VMEM primitive + box tables (the batched visibility prepass
    # reads chunk boxes as [CTILE, 1] columns); small scalar tables
    # prefetched.  Kernel arg order is (ptbl, ctbl=clbox, gtbl=cbox,
    # mtbl, ttbl, cam, kt, ...).
    def kernel_vmem(mtbl_ref, ttbl_ref, cam_ref, kt_ref, clbox_ref,
                    cbox_ref, ptbl_ref, *rest):
        kernel(ptbl_ref, clbox_ref, cbox_ref, mtbl_ref, ttbl_ref,
               cam_ref, kt_ref, *rest)

    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[tbl_spec] * 3 + [spec] * N_LANE_IN,
        out_specs=[spec] * n_out,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel_vmem,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(mtbl, ttbl, cam, kt, clbox, cbox, tbl, *lane_r)
    return tuple(o.reshape(-1, LANES)[:g] for o in outs)


def pack_cam(s, frame, bg_color):
    """[1, N_CAM] f32 scalar table for the kernel's camera/RR/bg stage."""
    vals = jnp.concatenate([
        jnp.asarray(s.center, jnp.float32).reshape(3),
        jnp.asarray(frame["top_left"], jnp.float32).reshape(3),
        jnp.asarray(frame["pixel_u"], jnp.float32).reshape(3),
        jnp.asarray(frame["pixel_v"], jnp.float32).reshape(3),
        jnp.asarray(frame["u"], jnp.float32).reshape(3),
        jnp.asarray(frame["v"], jnp.float32).reshape(3),
        jnp.asarray(frame["defocus_radius"], jnp.float32).reshape(1),
        jnp.asarray(s.rr_min, jnp.float32).reshape(1),
        jnp.asarray(bg_color, jnp.float32).reshape(3),
        jnp.zeros((N_CAM - 23,), jnp.float32),
    ])
    return vals.reshape(1, N_CAM)


def pack_kt(base_key, last_sample: int):
    """[1, N_KT] i32 scalar table: raw key words + sample budget."""
    kd = jax.random.key_data(base_key).astype(jnp.uint32).astype(jnp.int32)
    return jnp.stack([kd[0], kd[1], jnp.int32(last_sample),
                      jnp.int32(0)]).reshape(1, N_KT)
