"""Full-bounce Pallas TPU megakernel.

One kernel advances every lane by a complete path-tracing bounce:
intersection (shared prim loop), material resolution, constant/checker
texture evaluation, emission, specular scatter (mirror/metal/dielectric/
transparent), cosine/uniform-sphere sampling, CDF light redirection and
the MIS mixture pdf — the "wavefront megakernel" of the BASELINE
north-star.  Fusing the bounce into one kernel removes the ~60 XLA kernel
launches per wavefront iteration that dominate wall-clock at 131k lanes.

Out-of-kernel (XLA side, one fusion each): RNG uniform block, dead-lane
regeneration, background accumulation on miss (arbitrary jittable
backgrounds stay supported), image scatter-add.

Eligibility (checked statically): no volumes, <= MAX_DENSE_PRIMS
primitives, every texture CONSTANT or CHECKER, <= 8 redirect targets.
Everything else falls back to the XLA bounce (render/integrator.py),
which is semantically identical.

Math helpers: Mosaic has no atan2/acos lowering, so sphere uv uses a
polynomial arctan (|err| < 1e-5 rad — texture-lookup accuracy).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...materials.materials import (
    MAT_ANISOTROPIC, MAT_DIELECTRIC, MAT_ISOTROPIC, MAT_LAMBERTIAN,
    MAT_LIGHT, MAT_LOMMEL, MAT_METAL, MAT_MIRROR, MAT_PITCH_BLACK,
    MAT_TRANSPARENT, MaterialTable,
)
from ...textures.textures import TEX_CHECKER, TEX_CONSTANT, TextureTable
from .intersect_kernel import LANES, MAX_DENSE_PRIMS, MAX_SMEM_PRIMS, pack_prims, prim_loop

BLOCK_G = 32
N_MCOLS = 12
N_TCOLS = 16

# uniform column layout — MUST match render/integrator.py
_U_SPEC0 = 0
_U_SPEC1 = 1
_U_DIELECTRIC = 2
_U_DIR0 = 3
_U_DIR1 = 4
_U_CHOICE = 5
_U_TGT_I = 6
_U_TGT_J = 7
N_U = 8


def pack_materials(materials: MaterialTable, textures: TextureTable):
    """[M, 12] float table: kind, param, tex_kind, c0(3), c1(3), f0, f1."""
    m = materials.kind.shape[0]
    tex = materials.tex
    tbl = jnp.zeros((m, N_MCOLS), jnp.float32)
    tbl = tbl.at[:, 0].set(materials.kind.astype(jnp.float32))
    tbl = tbl.at[:, 1].set(materials.param)
    tbl = tbl.at[:, 2].set(textures.kind[tex].astype(jnp.float32))
    tbl = tbl.at[:, 3:6].set(textures.c0[tex])
    tbl = tbl.at[:, 6:9].set(textures.c1[tex])
    tbl = tbl.at[:, 9].set(textures.f0[tex])
    tbl = tbl.at[:, 10].set(textures.f1[tex])
    return tbl


def pack_behaviors(materials: MaterialTable, textures: TextureTable):
    """[B, 12] behavior-row table (layout of :func:`pack_materials`).

    Rows are the behavior representatives
    (materials.MaterialTable.behavior_rep); the per-material scalar param
    and constant-texture color ride per-primitive in the prim table
    instead (pack_prims cols 31-34), so e.g. demo1's 460 interned
    constant-color materials collapse to 3 rows — the unrolled material
    loop stays tiny regardless of how many colors a scene interns."""
    rep = materials.behavior_rep
    tex = materials.tex[rep]
    b = rep.shape[0]
    tbl = jnp.zeros((b, N_MCOLS), jnp.float32)
    tbl = tbl.at[:, 0].set(materials.kind[rep].astype(jnp.float32))
    tbl = tbl.at[:, 1].set(materials.param[rep])  # unused (per-prim col 34)
    tbl = tbl.at[:, 2].set(textures.kind[tex].astype(jnp.float32))
    tbl = tbl.at[:, 3:6].set(textures.c0[tex])
    tbl = tbl.at[:, 6:9].set(textures.c1[tex])
    tbl = tbl.at[:, 9].set(textures.f0[tex])
    tbl = tbl.at[:, 10].set(textures.f1[tex])
    return tbl


def pack_targets(prob, q, u, v):
    """[T, 16] float table: q(3) u(3) v(3) cross(3) prob cdf."""
    t = q.shape[0]
    if t == 0:
        return jnp.zeros((1, N_TCOLS), jnp.float32)
    cp = jnp.cross(u, v)
    tbl = jnp.zeros((t, N_TCOLS), jnp.float32)
    tbl = tbl.at[:, 0:3].set(q)
    tbl = tbl.at[:, 3:6].set(u)
    tbl = tbl.at[:, 6:9].set(v)
    tbl = tbl.at[:, 9:12].set(cp)
    tbl = tbl.at[:, 12].set(prob)
    tbl = tbl.at[:, 13].set(jnp.cumsum(prob))
    return tbl


def _poly_atan(t):
    """arctan on [0, 1], |err| ~ 1e-5 rad (minimax polynomial)."""
    z = t * t
    return t * (0.9998660 + z * (-0.3302995 + z * (0.1801410
                + z * (-0.0851330 + z * 0.0208351))))


def _atan2(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    a = _poly_atan(t)
    a = jnp.where(ay > ax, (math.pi / 2) - a, a)
    a = jnp.where(x < 0.0, math.pi - a, a)
    return jnp.where(y < 0.0, -a, a)


def _acos(x):
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)


def _rsqrt3(x, y, z):
    return jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))


def _unit_from_uniforms(u, v):
    z = 1.0 - 2.0 * u
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = (2.0 * math.pi) * v
    return r * jnp.cos(phi), r * jnp.sin(phi), z


def _kernel(ptbl, ctbl, gtbl, mtbl, ttbl,
            ox, oy, oz, dx, dy, dz, tm, tr, tg, tb, al, un,
            ox_o, oy_o, oz_o, dx_o, dy_o, dz_o, tr_o, tg_o, tb_o,
            rr_o, rg_o, rb_o, al_o, ms_o, pi_o,
            *, n_prims: int, n_mats: int, n_targets: int, t_min: float,
            has_motion: bool, use_prim_albedo: bool = False,
            has_box: bool = False, segments=None, kinds=None,
            two_level: bool = False):
    oxv, oyv, ozv = ox[...], oy[...], oz[...]
    dxv, dyv, dzv = dx[...], dy[...], dz[...]

    # ---- 1. nearest hit + record (shared prim loop) ----
    hit_res = prim_loop(
        ptbl, oxv, oyv, ozv, dxv, dyv, dzv,
        tm[...] if has_motion else None,
        n_prims=n_prims, t_min=t_min, has_motion=has_motion,
        ctbl_ref=ctbl, with_albedo=use_prim_albedo, has_box=has_box,
        segments=segments, kinds=kinds,
        gtbl_ref=gtbl if two_level else None)
    _shade(hit_res, mtbl, ttbl, oxv, oyv, ozv, dxv, dyv, dzv,
           tr, tg, tb, al, un,
           ox_o, oy_o, oz_o, dx_o, dy_o, dz_o, tr_o, tg_o, tb_o,
           rr_o, rg_o, rb_o, al_o, ms_o, pi_o,
           n_mats=n_mats, n_targets=n_targets,
           use_prim_albedo=use_prim_albedo)


def _shade(hit_res, mtbl, ttbl, oxv, oyv, ozv, dxv, dyv, dzv,
           tr, tg, tb, al, un,
           ox_o, oy_o, oz_o, dx_o, dy_o, dz_o, tr_o, tg_o, tb_o,
           rr_o, rg_o, rb_o, al_o, ms_o, pi_o,
           *, n_mats: int, n_targets: int,
           use_prim_albedo: bool = False,
           tmed=None, vmat=None, sphere_rots=()):
    """Material/texture/emission/scatter/MIS stage of the bounce
    megakernel, shared by the consensus and visit-list intersect
    variants (takes the prim_loop result tuple).

    ``tmed``/``vmat`` (optional [*, 128] refs): per-lane constant-medium
    scatter candidate + its material id from the volume crossing kernel
    (render/volumes.py).  A medium event wins when ``tmed < t``; the
    record is overridden exactly as the XLA bounce does
    (render/integrator.py:345-350 / Geometry.hs:320-326): normal = -d,
    front, uv = 0.

    Rich textures (image/noise/marble — anything but constant/checker)
    are *deferred*: their lanes get albedo 1.0 here and the caller
    multiplies the real albedo into throughput afterwards (the
    direction/pdf/alive logic never depends on albedo; light-source
    emission does, so fused-path eligibility requires const/checker
    lights — integrator.fused_shade_eligible).

    ``sphere_rots``: static ((row, r9), ...) world->object rotations for
    instanced spheres — UV evaluates in object space
    (Geometry.hs:382-391, ops/intersect.py:apply_sphere_rotations).
    """
    vals = _shade_values(
        hit_res, mtbl, ttbl, oxv, oyv, ozv, dxv, dyv, dzv,
        tr[...], tg[...], tb[...], al[...] > 0.5, un[...],
        n_mats=n_mats, n_targets=n_targets,
        use_prim_albedo=use_prim_albedo,
        tmed=tmed[...] if tmed is not None else None,
        vmat=vmat[...] if vmat is not None else None,
        sphere_rots=sphere_rots)
    for ref, v in zip((ox_o, oy_o, oz_o, dx_o, dy_o, dz_o, tr_o, tg_o,
                       tb_o, rr_o, rg_o, rb_o, al_o, ms_o, pi_o), vals):
        ref[...] = v


def _shade_values(hit_res, mtbl, ttbl, oxv, oyv, ozv, dxv, dyv, dzv,
                  trv, tgv, tbv, alive, u_all,
                  *, n_mats: int, n_targets: int,
                  use_prim_albedo: bool = False,
                  tmed=None, vmat=None, sphere_rots=(),
                  with_uv: bool = False):
    """Value-in/value-out core of :func:`_shade` (same math, no refs) —
    also called directly by the fused-iteration kernel
    (ops/pallas/iter_kernel.py), whose shade outputs feed further
    in-kernel stages instead of output refs.  Returns the 15 outputs in
    _kernel's output order: o2 (3), d2 (3), thr2 (3), emitted radiance
    (3), alive', miss_f, winner index.  ``with_uv=True`` appends the
    winner's (uu, vv) — the deferred rich-texture post-multiply of the
    DIFF fused-iteration path needs them outside the kernel."""
    (t, bi, nx, ny, nz, fr_f, uu, vv, mat_f, sph_f) = hit_res[:10]

    if tmed is not None:
        tmv = tmed
        in_med = tmv < t
        t = jnp.where(in_med, tmv, t)
        mat_f = jnp.where(in_med, vmat, mat_f)
        nx = jnp.where(in_med, -dxv, nx)
        ny = jnp.where(in_med, -dyv, ny)
        nz = jnp.where(in_med, -dzv, nz)
        fr_f = jnp.where(in_med, 1.0, fr_f)
        uu = jnp.where(in_med, 0.0, uu)
        vv = jnp.where(in_med, 0.0, vv)
        sph_f = jnp.where(in_med, 0.0, sph_f)

    hit = t < jnp.float32(jnp.inf)
    t_safe = jnp.where(hit, t, 1.0)
    px = oxv + t_safe * dxv
    py = oyv + t_safe * dyv
    pz = ozv + t_safe * dzv
    front = fr_f > 0.5
    is_sphere = sph_f > 0.5

    # sphere uv (Geometry.hs:100-104) via polynomial atan2; instanced
    # spheres rotate the outward normal into object space first
    flip = jnp.where(front, 1.0, -1.0)
    owx = nx * flip
    owy = ny * flip
    owz = nz * flip
    for row, r9 in sphere_rots:
        sel = bi == jnp.float32(row)
        rx = r9[0] * owx + r9[1] * owy + r9[2] * owz
        ry = r9[3] * owx + r9[4] * owy + r9[5] * owz
        rz = r9[6] * owx + r9[7] * owy + r9[8] * owz
        owx = jnp.where(sel, rx, owx)
        owy = jnp.where(sel, ry, owy)
        owz = jnp.where(sel, rz, owz)
    su = _atan2(owx, owz) * (0.5 / math.pi) + 0.5
    sv = _acos(jnp.clip(-owy, -1.0, 1.0)) * (1.0 / math.pi)
    uu = jnp.where(is_sphere, su, uu)
    vv = jnp.where(is_sphere, sv, vv)

    # ---- 2. material + texture resolution (loop over material rows;
    # with use_prim_albedo the rows are collapsed *behaviors* and the
    # constant-texture color + scalar param come from the winner's prim
    # columns instead — see pack_behaviors) ----
    kind = jnp.zeros_like(t)
    param = jnp.zeros_like(t)
    ar = jnp.zeros_like(t)
    ag = jnp.zeros_like(t)
    ab = jnp.zeros_like(t)
    for mi in range(n_mats):
        sel = mat_f == float(mi)
        kind = jnp.where(sel, mtbl[mi, 0], kind)
        if not use_prim_albedo:
            param = jnp.where(sel, mtbl[mi, 1], param)
        tex_kind = mtbl[mi, 2]
        c0r, c0g, c0b = mtbl[mi, 3], mtbl[mi, 4], mtbl[mi, 5]
        # checker parity (Texture.hs:46-56); constant when tex_kind==0
        i_idx = jnp.floor(uu * mtbl[mi, 9])
        j_idx = jnp.floor(vv * mtbl[mi, 10])
        even = jnp.mod(i_idx + j_idx, 2.0) == 0.0
        use_c1 = jnp.logical_and(tex_kind == float(TEX_CHECKER), ~even)
        tr_ = jnp.where(use_c1, mtbl[mi, 6], c0r)
        tg_ = jnp.where(use_c1, mtbl[mi, 7], c0g)
        tb_ = jnp.where(use_c1, mtbl[mi, 8], c0b)
        if use_prim_albedo:
            # constant-texture behavior: color from prim cols 31-33
            cf = jnp.where(tex_kind == float(TEX_CONSTANT), 1.0, 0.0)
            tr_ = cf * hit_res[10] + (1.0 - cf) * tr_
            tg_ = cf * hit_res[11] + (1.0 - cf) * tg_
            tb_ = cf * hit_res[12] + (1.0 - cf) * tb_
        # rich textures (image/noise/marble/custom) defer: albedo 1.0
        # here, real albedo multiplied into throughput by the caller
        rich = jnp.logical_and(tex_kind != float(TEX_CONSTANT),
                               tex_kind != float(TEX_CHECKER))
        tr_ = jnp.where(rich, 1.0, tr_)
        tg_ = jnp.where(rich, 1.0, tg_)
        tb_ = jnp.where(rich, 1.0, tb_)
        ar = jnp.where(sel, tr_, ar)
        ag = jnp.where(sel, tg_, ag)
        ab = jnp.where(sel, tb_, ab)
    if use_prim_albedo:
        param = hit_res[13]               # per-prim scalar param (col 34)

    live_hit = alive & hit

    # ---- 3. emission (Ray.hs:181-183) ----
    emit = jnp.where(live_hit & (kind == float(MAT_LIGHT)), 1.0, 0.0)
    emit_r = trv * ar * emit
    emit_g = tgv * ag * emit
    emit_b = tbv * ab * emit

    # ---- 4. behaviour classes ----
    is_absorb = (kind == float(MAT_LIGHT)) | (kind == float(MAT_PITCH_BLACK))
    is_hemi = (kind == float(MAT_LAMBERTIAN)) | (kind == float(MAT_LOMMEL))
    is_spec = ((kind == float(MAT_MIRROR)) | (kind == float(MAT_METAL))
               | (kind == float(MAT_DIELECTRIC))
               | (kind == float(MAT_TRANSPARENT)))

    # ---- 5. specular family (Material.hs:65-112) ----
    ddn = dxv * nx + dyv * ny + dzv * nz
    rfx = dxv - 2.0 * ddn * nx
    rfy = dyv - 2.0 * ddn * ny
    rfz = dzv - 2.0 * ddn * nz
    fx, fy, fz = _unit_from_uniforms(u_all[_U_SPEC0], u_all[_U_SPEC1])
    mx = rfx + param * fx
    my = rfy + param * fy
    mz = rfz + param * fz
    metal_ok = (mx * nx + my * ny + mz * nz) > 0.0
    inv = _rsqrt3(mx, my, mz)
    mx, my, mz = mx * inv, my * inv, mz * inv

    ior = jnp.maximum(param, 1e-6)
    ior_ratio = jnp.where(front, 1.0 / ior, ior)
    cos_t = jnp.minimum(1.0, -(ddn))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    cannot = ior_ratio * sin_t > 1.0
    r0 = (1.0 - ior_ratio) / (1.0 + ior_ratio)
    r0 = r0 * r0
    one_c = 1.0 - cos_t
    oc2 = one_c * one_c
    schlick = r0 + (1.0 - r0) * (oc2 * oc2 * one_c)
    di_reflect = cannot | (u_all[_U_DIELECTRIC] < schlick)
    # refract (Material.hs:81-85)
    qx = ior_ratio * (dxv + cos_t * nx)
    qy = ior_ratio * (dyv + cos_t * ny)
    qz = ior_ratio * (dzv + cos_t * nz)
    par = jnp.sqrt(jnp.maximum(
        jnp.abs(1.0 - (qx * qx + qy * qy + qz * qz)), 1e-12))
    fx2 = qx - par * nx
    fy2 = qy - par * ny
    fz2 = qz - par * nz
    di_r = jnp.where(di_reflect, 1.0, 0.0)
    dix = di_r * rfx + (1.0 - di_r) * fx2
    diy = di_r * rfy + (1.0 - di_r) * fy2
    diz = di_r * rfz + (1.0 - di_r) * fz2

    is_metal = kind == float(MAT_METAL)
    is_diel = kind == float(MAT_DIELECTRIC)
    is_mirror = kind == float(MAT_MIRROR)
    sx = jnp.where(is_mirror, rfx, dxv)
    sy = jnp.where(is_mirror, rfy, dyv)
    sz = jnp.where(is_mirror, rfz, dzv)
    sx = jnp.where(is_metal, mx, sx)
    sy = jnp.where(is_metal, my, sy)
    sz = jnp.where(is_metal, mz, sz)
    sx = jnp.where(is_diel, dix, sx)
    sy = jnp.where(is_diel, diy, sy)
    sz = jnp.where(is_diel, diz, sz)
    s_ar = jnp.where(is_diel, 1.0, ar)
    s_ag = jnp.where(is_diel, 1.0, ag)
    s_ab = jnp.where(is_diel, 1.0, ab)
    spec_dead = is_metal & ~metal_ok

    # ---- 6. diffuse family + redirection (Ray.hs:187-224) ----
    ux, uy, uz = _unit_from_uniforms(u_all[_U_DIR0], u_all[_U_DIR1])
    cdx = nx + ux
    cdy = ny + uy
    cdz = nz + uz
    inv = _rsqrt3(cdx, cdy, cdz)
    hemi_f = jnp.where(is_hemi, 1.0, 0.0)
    bx = hemi_f * (cdx * inv) + (1.0 - hemi_f) * ux
    by = hemi_f * (cdy * inv) + (1.0 - hemi_f) * uy
    bz = hemi_f * (cdz * inv) + (1.0 - hemi_f) * uz

    if n_targets > 0:
        cdf_last = ttbl[n_targets - 1, 13]
        x_t = u_all[_U_CHOICE]
        use_t = x_t < cdf_last
        # select target: accumulate params of the first t with x < cdf
        lqx = jnp.zeros_like(t); lqy = jnp.zeros_like(t); lqz = jnp.zeros_like(t)
        lux = jnp.zeros_like(t); luy = jnp.zeros_like(t); luz = jnp.zeros_like(t)
        lvx = jnp.zeros_like(t); lvy = jnp.zeros_like(t); lvz = jnp.zeros_like(t)
        chosen = jnp.zeros_like(t)  # 0 = none yet
        for ti in range(n_targets):
            pick = (x_t < ttbl[ti, 13]) & (chosen < 0.5)
            chosen = jnp.where(pick, 1.0, chosen)
            lqx = jnp.where(pick, ttbl[ti, 0], lqx)
            lqy = jnp.where(pick, ttbl[ti, 1], lqy)
            lqz = jnp.where(pick, ttbl[ti, 2], lqz)
            lux = jnp.where(pick, ttbl[ti, 3], lux)
            luy = jnp.where(pick, ttbl[ti, 4], luy)
            luz = jnp.where(pick, ttbl[ti, 5], luz)
            lvx = jnp.where(pick, ttbl[ti, 6], lvx)
            lvy = jnp.where(pick, ttbl[ti, 7], lvy)
            lvz = jnp.where(pick, ttbl[ti, 8], lvz)
        ti_u = u_all[_U_TGT_I]
        tj_u = u_all[_U_TGT_J]
        tgx = lqx + ti_u * lux + tj_u * lvx - px
        tgy = lqy + ti_u * luy + tj_u * lvy - py
        tgz = lqz + ti_u * luz + tj_u * lvz - pz
        inv = _rsqrt3(tgx, tgy, tgz)
        use_f = jnp.where(use_t, 1.0, 0.0)
        bx = use_f * (tgx * inv) + (1.0 - use_f) * bx
        by = use_f * (tgy * inv) + (1.0 - use_f) * by
        bz = use_f * (tgz * inv) + (1.0 - use_f) * bz

    mu1 = bx * nx + by * ny + bz * nz
    pdf_base = jnp.where(is_hemi, mu1 * (1.0 / math.pi),
                         0.25 / math.pi)
    hemi_dead = is_hemi & (pdf_base <= 0.0)            # Ray.hs:198

    if n_targets > 0:
        rem_prob = 1.0 - cdf_last
        pdf_sum = rem_prob * pdf_base
        for ti in range(n_targets):
            # private parallelogram intersector (Ray.hs:112-118)
            cpx, cpy, cpz = ttbl[ti, 9], ttbl[ti, 10], ttbl[ti, 11]
            cp2 = cpx * cpx + cpy * cpy + cpz * cpz
            inv_cp = 1.0 / jnp.maximum(cp2, 1e-30)
            nxs = cpx * jnp.sqrt(inv_cp)
            nys = cpy * jnp.sqrt(inv_cp)
            nzs = cpz * jnp.sqrt(inv_cp)
            den = bx * nxs + by * nys + bz * nzs
            den_ok = jnp.abs(den) > 1e-8
            den_s = jnp.where(den_ok, den, 1.0)
            qn = ttbl[ti, 0] * nxs + ttbl[ti, 1] * nys + ttbl[ti, 2] * nzs
            tt = (qn - (px * nxs + py * nys + pz * nzs)) / den_s
            # a, b via scaled-normal triple products
            nsx, nsy, nsz = cpx * inv_cp, cpy * inv_cp, cpz * inv_cp
            # w_a = cross(v, n_s), w_b = cross(n_s, u)
            vx_, vy_, vz_ = ttbl[ti, 6], ttbl[ti, 7], ttbl[ti, 8]
            ux_, uy_, uz_ = ttbl[ti, 3], ttbl[ti, 4], ttbl[ti, 5]
            wax = vy_ * nsz - vz_ * nsy
            way = vz_ * nsx - vx_ * nsz
            waz = vx_ * nsy - vy_ * nsx
            wbx = nsy * uz_ - nsz * uy_
            wby = nsz * ux_ - nsx * uz_
            wbz = nsx * uy_ - nsy * ux_
            rx = px + tt * bx - ttbl[ti, 0]
            ry = py + tt * by - ttbl[ti, 1]
            rz = pz + tt * bz - ttbl[ti, 2]
            aa = rx * wax + ry * way + rz * waz
            bb = rx * wbx + ry * wby + rz * wbz
            hit_t = (den_ok & (tt > 0.0) & (aa >= 0.0) & (aa <= 1.0)
                     & (bb >= 0.0) & (bb <= 1.0))
            cross_dot = jnp.abs(bx * cpx + by * cpy + bz * cpz)
            pdf_i = jnp.where(hit_t,
                              tt * tt / jnp.maximum(cross_dot, 1e-12), 0.0)
            pdf_sum = pdf_sum + ttbl[ti, 12] * pdf_i
        pdf_mix = jnp.maximum(pdf_sum, 1e-12)
    else:
        pdf_mix = jnp.maximum(pdf_base, 1e-12)

    mu0 = -(ddn)
    lommel = 0.25 / jnp.maximum(mu0 + mu1, 1e-8)
    # Henyey-Greenstein: (1-g^2) / (1+g^2-2g mu)^1.5 (Material.hs:124-129)
    g = param
    hg_mu = dxv * bx + dyv * by + dzv * bz
    hg_den = jnp.maximum(1.0 + g * g - 2.0 * g * hg_mu, 1e-12)
    hg = (1.0 - g * g) / (hg_den * jnp.sqrt(hg_den))
    brdf = jnp.where(kind == float(MAT_LOMMEL), lommel, 1.0)
    brdf = jnp.where(kind == float(MAT_ANISOTROPIC), hg, brdf)
    dw = brdf * pdf_base / pdf_mix
    d_ar = ar * dw
    d_ag = ag * dw
    d_ab = ab * dw

    # ---- 7. combine ----
    spec_f = jnp.where(is_spec, 1.0, 0.0)
    ndx = spec_f * sx + (1.0 - spec_f) * bx
    ndy = spec_f * sy + (1.0 - spec_f) * by
    ndz = spec_f * sz + (1.0 - spec_f) * bz
    w_r = jnp.where(is_spec, s_ar, d_ar)
    w_g = jnp.where(is_spec, s_ag, d_ag)
    w_b = jnp.where(is_spec, s_ab, d_ab)
    next_alive = live_hit & ~is_absorb & ~spec_dead & ~hemi_dead

    na = jnp.where(next_alive, 1.0, 0.0)
    # winner primitive index (-1 on miss) — the residual that lets the
    # differentiable wrapper (diff/mega_bounce.py) recompute the bounce
    # without re-running the prim loop in the backward pass
    out = (jnp.where(next_alive, px, oxv),
           jnp.where(next_alive, py, oyv),
           jnp.where(next_alive, pz, ozv),
           jnp.where(next_alive, ndx, dxv),
           jnp.where(next_alive, ndy, dyv),
           jnp.where(next_alive, ndz, dzv),
           jnp.where(next_alive, trv * w_r, trv),
           jnp.where(next_alive, tgv * w_g, tgv),
           jnp.where(next_alive, tbv * w_b, tbv),
           emit_r, emit_g, emit_b,
           na, jnp.where(alive & ~hit, 1.0, 0.0), bi)
    if with_uv:
        out = out + (uu, vv)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("n_prims", "n_mats", "n_targets", "t_min",
                     "has_motion", "use_prim_albedo", "has_box",
                     "segments", "kinds", "interpret"))
def bounce_megakernel(ptbl, ctbl, mtbl, ttbl, ox, oy, oz, dx, dy, dz, tm,
                      tr, tg, tb, al, uniforms, *, n_prims: int, n_mats: int,
                      n_targets: int, t_min: float, has_motion: bool,
                      use_prim_albedo: bool = False, has_box: bool = False,
                      segments=None, kinds=None, interpret: bool = False):
    from .intersect_kernel import (
        CLUSTER, GROUP_MIN_CLUSTERS, pack_cluster_groups,
    )
    """Ray components / throughput / alive are [G, 128]; ``uniforms`` is
    [N_U, G, 128]; ``ctbl`` the pack_clusters AABB table.  Returns 15
    [G, 128] outputs (see _kernel; the last is the winner prim index as
    f32, -1 on miss)."""
    from .intersect_kernel import BLOCK_G_CLUSTERED, CLUSTER_MIN_PRIMS
    g = ox.shape[0]
    two_level = (n_prims >= CLUSTER_MIN_PRIMS
                 and -(-n_prims // CLUSTER) >= GROUP_MIN_CLUSTERS)
    gtbl = pack_cluster_groups(ctbl) if two_level \
        else jnp.zeros((1, 8), jnp.float32)
    bg = min(BLOCK_G_CLUSTERED if n_prims >= CLUSTER_MIN_PRIMS else BLOCK_G,
             g)
    grid = (pl.cdiv(g, bg),)
    ray_spec = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    uni_spec = pl.BlockSpec((N_U, bg, LANES), lambda i, *_: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM)] * 15
    out_shape = [jax.ShapeDtypeStruct((g, LANES), jnp.float32)] * 15
    kernel = functools.partial(
        _kernel, n_prims=n_prims, n_mats=n_mats, n_targets=n_targets,
        t_min=t_min, has_motion=has_motion,
        use_prim_albedo=use_prim_albedo, has_box=has_box,
        segments=segments, kinds=kinds, two_level=two_level)
    from .intersect_kernel import MAX_SMEM_PRIMS
    if n_prims <= MAX_SMEM_PRIMS:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=[ray_spec] * 11 + [uni_spec],
            out_specs=out_specs,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(ptbl, ctbl, gtbl, mtbl, ttbl, ox, oy, oz, dx, dy, dz, tm, tr,
          tg, tb, al, uniforms)

    # mesh-scale scenes: the primitive table lives whole in VMEM while the
    # small cluster/material/target tables stay scalar-prefetched in SMEM
    def kernel_vmem(ctbl_ref, gtbl_ref, mtbl_ref, ttbl_ref, ptbl_ref,
                    *rest):
        kernel(ptbl_ref, ctbl_ref, gtbl_ref, mtbl_ref, ttbl_ref, *rest)

    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[tbl_spec] + [ray_spec] * 11 + [uni_spec],
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel_vmem,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ctbl, gtbl, mtbl, ttbl, ptbl, ox, oy, oz, dx, dy, dz, tm, tr, tg,
      tb, al, uniforms)


def _shade_only_kernel(mtbl, ttbl, t, bi, nx, ny, nz, fr, uu, vv, mat,
                       sph, *rest, n_mats: int, n_targets: int,
                       has_medium: bool, sphere_rots=()):
    if has_medium:
        tmed, vmat = rest[0], rest[1]
        rest = rest[2:]
    else:
        tmed = vmat = None
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, al, un) = rest[:11]
    outs = rest[11:]
    hit_res = (t[...], bi[...], nx[...], ny[...], nz[...], fr[...],
               uu[...], vv[...], mat[...], sph[...])
    _shade(hit_res, mtbl, ttbl, ox[...], oy[...], oz[...],
           dx[...], dy[...], dz[...], tr, tg, tb, al, un, *outs,
           n_mats=n_mats, n_targets=n_targets,
           tmed=tmed, vmat=vmat, sphere_rots=sphere_rots)


@functools.partial(
    jax.jit,
    static_argnames=("n_mats", "n_targets", "has_medium", "sphere_rots",
                     "interpret"))
def shade_megakernel(mtbl, ttbl, hit, medium, lanes, uniforms, *,
                     n_mats: int, n_targets: int, has_medium: bool,
                     sphere_rots=(), interpret: bool = False):
    """Fused material/texture/emission/scatter/MIS stage fed by a
    PRECOMPUTED hit record — the Pallas replacement for the XLA shade
    half of render/integrator.py:bounce on scenes the full-bounce
    megakernel cannot take (volumes, rich textures, any intersect
    engine).  One kernel replaces the ~40 XLA launches of the shade
    stage; the intersect engine stays freely chosen (all-pairs,
    clustered, streamed) and the volume crossing kernel feeds medium
    events per lane.

    ``hit``: 10-tuple (t, idx_f32, nx, ny, nz, front_f, u, v, mat_f,
    sphere_f) — [G, 128] each, normals hit-side, uv PRE-computed (pass
    sphere_f = 0 to keep the input uv; the in-kernel polynomial sphere
    uv is only for the full megakernel).  ``medium``: (t_med, vmat_f)
    or None.  ``lanes``: (ox, oy, oz, dx, dy, dz, tr, tg, tb, alive_f).
    ``uniforms``: [N_U, G, 128].  Returns the 15 standard bounce
    outputs (see _kernel).
    """
    g = hit[0].shape[0]
    bg = min(BLOCK_G, g)
    grid = (pl.cdiv(g, bg),)
    ray_spec = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    uni_spec = pl.BlockSpec((N_U, bg, LANES), lambda i, *_: (0, i, 0),
                            memory_space=pltpu.VMEM)
    n_in = 10 + (2 if has_medium else 0) + 10
    out_specs = [pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM)] * 15
    out_shape = [jax.ShapeDtypeStruct((g, LANES), jnp.float32)] * 15
    kernel = functools.partial(
        _shade_only_kernel, n_mats=n_mats, n_targets=n_targets,
        has_medium=has_medium, sphere_rots=sphere_rots)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[ray_spec] * n_in + [uni_spec],
        out_specs=out_specs,
    )
    med = tuple(medium) if has_medium else ()
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(mtbl, ttbl, *hit, *med, *lanes, uniforms)
