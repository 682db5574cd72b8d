"""SoA replay of one megakernel bounce, shared by the XLA and Pallas
backward paths.

The generic backward of diff/mega_bounce.py replays the bounce through
the XLA integrator (``bounce(..., hit_override=...)``) and costs ~2.6x
the forward Pallas kernel per wavefront iteration (1.33 ms vs 0.51 ms at
2^18 lanes, v5e; tools/prof_bwd_split.py).  Kernel traces show the cost
is HBM traffic: every elementwise intermediate of the replay and its
transpose is an [R]-sized HBM round trip.

:func:`lane_math` is the cure's foundation: the complete bounce given a
known winner index — ``ops/diff_intersect.py:winner_surface_hit`` +
``render/integrator.py:bounce`` (Ray.hs:174-224 semantics) — written as
a pure SoA function of per-lane scalars with Mosaic-lowerable ops only
(polynomial atan2/acos, no bool-vector selects).  It is used two ways:

* :func:`replay_bwd` — XLA path: one ``jax.vjp`` over the function with
  winner/material/texture rows gathered by one-hot matmuls
  (scatter-free).  Used on CPU and as the numerical oracle.
* ``ops/pallas/bounce_bwd_kernel.py`` — TPU path: the same function is
  ``jax.vjp``-ed INSIDE a Pallas kernel, so the whole replay and its
  transpose stay in VMEM (one kernel, HBM traffic = inputs + cotangent
  outputs only).

Both produce gradients numerically equal to the generic path (same
detachment discipline: sampled directions and the MIS mixture
denominator are ``stop_gradient``-ed); tests/test_lane_replay.py checks
every cotangent on randomized scenes covering all 10 material kinds,
all 4 primitive kinds, motion blur and redirect targets.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.vecmath import DTYPE
from ..materials.materials import (
    MAT_ANISOTROPIC, MAT_DIELECTRIC, MAT_LAMBERTIAN, MAT_LIGHT, MAT_LOMMEL,
    MAT_METAL, MAT_MIRROR, MAT_PITCH_BLACK, MAT_TRANSPARENT,
)
from ..ops.intersect import DENOM_EPS
from ..scene.types import (
    PRIM_BOX, PRIM_PARALLELOGRAM, PRIM_SPHERE, PRIM_TRIANGLE,
)
from ..textures.textures import TEX_CHECKER

# a plain python inf stays a weak-typed literal; np.float32(inf) would be
# a captured constant, which pallas_call kernels reject
INF = float("inf")

# One-hot row caps: the [R, N] selector of the OUTSIDE-gather path grows
# linearly in N; past MAX_REPLAY_PRIMS only the fused-iteration driver's
# pre-gathered backward serves (replay_pre_eligible — the round-4
# self-gathering kernel lost its bunny A/B to it and was deleted, like
# the visit-list subsystem before it).  Material / texture tables stay
# hard-capped (per-row [nm, 128] one-hot gathers).
MAX_REPLAY_PRIMS = 64
MAX_REPLAY_MATS = 64
MAX_REPLAY_TEX = 64

_SG = jax.lax.stop_gradient


def replay_eligible(scene, defer_rich: bool = False) -> bool:
    """Static check: can the SoA replay backward serve this scene
    (the <= 64-row one-hot paths — mesh scale is served by the fused
    driver's pre-gathered backward, :func:`replay_pre_eligible`)?

    ``defer_rich=True`` (the fused-iteration diff driver): rich
    textures are allowed on non-light materials — :func:`lane_math`
    shades them at albedo 1.0 and the driver multiplies the real texel
    into throughput outside the kernel; light emission happens
    in-kernel, so LIGHT textures must stay constant/checker."""
    from ..textures.textures import TEX_CONSTANT
    base_tex = {TEX_CONSTANT, TEX_CHECKER}
    if defer_rich:
        tex_ok = set(scene.materials.light_tex_kinds) <= base_tex
    else:
        tex_ok = set(scene.textures.kinds_present) <= base_tex
    return (scene.volumes is None
            and scene.prims.kind.shape[0] <= MAX_REPLAY_PRIMS
            and scene.materials.kind.shape[0] <= MAX_REPLAY_MATS
            and scene.textures.kind.shape[0] <= MAX_REPLAY_TEX
            and tex_ok)


def replay_pre_eligible(scene, defer_rich: bool = True) -> bool:
    """Eligibility for the PRE-GATHERED fused-iteration backward
    (diff/fused_iter.py:_f_bwd_pre): the replay kernel itself is
    table-size-independent (it sees per-lane gathered operands), so the
    prim cap is the forward megakernel's — winner rows gather by one-hot
    matmul below RT_DIFF_ONEHOT_MAX rows and by direct take/scatter-add
    above (ops/diff_intersect.py measured the crossover)."""
    from ..render.integrator import MEGA_MAX_PRIMS
    from ..textures.textures import TEX_CONSTANT
    base_tex = {TEX_CONSTANT, TEX_CHECKER}
    if defer_rich:
        # rich textures ride the deferred-albedo multiply at EVERY
        # megakernel-eligible scale: the per-prim texture routing is
        # [R, n] one-hot matmuls (fused_iter.apply_rich), the same
        # shape the pre-gathered backward already runs at 4,992 rows
        # (measured faster than take/scatter, ops/diff_intersect.py).
        # Light emission stays in-kernel, so light textures must stay
        # constant/checker.
        tex_ok = set(scene.materials.light_tex_kinds) <= base_tex
    else:
        tex_ok = set(scene.textures.kinds_present) <= base_tex
    return (scene.volumes is None
            and scene.prims.kind.shape[0] <= MEGA_MAX_PRIMS
            and scene.materials.kind.shape[0] <= MAX_REPLAY_MATS
            and scene.textures.kind.shape[0] <= MAX_REPLAY_TEX
            and tex_ok)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _norm3(x, y, z, eps=1e-12):
    inv = 1.0 / jnp.sqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv


def _poly_atan(t):
    """arctan on [0, 1] (minimax, |err| ~ 1e-5 rad) — Mosaic has no atan2
    lowering (ops/pallas/bounce_kernel.py)."""
    z = t * t
    return t * (0.9998660 + z * (-0.3302995 + z * (0.1801410
                + z * (-0.0851330 + z * 0.0208351))))


def _atan2_poly(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    a = _poly_atan(t)
    a = jnp.where(ay > ax, (math.pi / 2) - a, a)
    a = jnp.where(x < 0.0, math.pi - a, a)
    return jnp.where(y < 0.0, -a, a)


def _acos_poly(x):
    return _atan2_poly(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)


N_DIFF_BASE = 26   # p0(3) e1(3) e2(3) c0(3) c1(3) param o(3) d(3) time thr(3)
N_DIFF_MOTION = 32  # + mv0(3) mv1(3)
N_DET = 21         # kindp kindm texkind f0 f1 uv(6) u(8) alive valid0
N_OUT = 13         # o2(3) d2(3) rad(3) thr2(3) miss


def lane_math(diff, det, tgt, *, has_motion: bool, has_box: bool,
              t_min: float, n_targets: int, exact_trig: bool = False):
    """One bounce from the saved winner index — pure SoA per-lane math.

    ``diff`` (differentiable, each a [.] f32 array): winner-row p0/e1/e2
    (9), [mv0/mv1 (6) when motion], texture c0/c1 (6), material param,
    ray o/d (6), time, throughput (3).
    ``det`` (detached): winner prim kind, material kind, texture kind,
    checker f0/f1, triangle corner uvs (6), the 8 bounce uniforms,
    alive flag, idx>=0 flag — all as f32 arrays.
    ``tgt``: redirect-target scalars ``(q, u, v, prob)`` as length-
    ``n_targets`` lists of 3-tuples / floats (traced scalars — jnp or
    SMEM reads) — detached by construction (Ray.hs:187-224 discipline).

    Every op is Mosaic-lowerable (``exact_trig=False``: polynomial
    atan2/acos — sphere uv only feeds the checker ``floor``, so its
    gradient contribution is exactly zero either way; ``exact_trig=True``
    matches the XLA record bit-for-bit).  No bool-vector selects.

    Returns the 13 SoA outputs: o2 (3), d2 (3), radiance contribution
    WITHOUT the miss-background term (3), thr2 (3), and ``miss_f`` so the
    caller can add ``miss * thr * background(o, d)`` (arbitrary jittable
    backgrounds stay out of kernel-safe code, like the forward
    megakernel does — render/integrator.py:bounce_mega_soa).
    """
    if has_motion:
        (p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z,
         mv0x, mv0y, mv0z, mv1x, mv1y, mv1z,
         c0r, c0g, c0b, c1r, c1g, c1b, param,
         ox, oy, oz, dx, dy, dz, time, thr_r, thr_g, thr_b) = diff
    else:
        (p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z,
         c0r, c0g, c0b, c1r, c1g, c1b, param,
         ox, oy, oz, dx, dy, dz, time, thr_r, thr_g, thr_b) = diff
    (kind_p, kind_m, texkind, f0l, f1l, uv0u, uv0v, uv1u, uv1v, uv2u,
     uv2v, u0, u1, u2, u3, u4, u5, u6, u7, alive_f, idxv_f) = det

    alive = alive_f > 0.5
    atan2 = jnp.arctan2 if exact_trig else _atan2_poly
    acos = (lambda x: jnp.arccos(x)) if exact_trig else _acos_poly

    if has_motion:
        mt = 1.0 - time
        shx = mv0x * mt + time * mv1x
        shy = mv0y * mt + time * mv1y
        shz = mv0z * mt + time * mv1z
        osx, osy, osz = ox - shx, oy - shy, oz - shz
    else:
        osx, osy, osz = ox, oy, oz

    is_sphere = kind_p == float(PRIM_SPHERE)
    is_par = kind_p == float(PRIM_PARALLELOGRAM)
    is_tri = kind_p == float(PRIM_TRIANGLE)
    is_boxk = kind_p == float(PRIM_BOX)

    # ---- hit t (ops/intersect.py:_single_prim_t_rows semantics) ----
    ocx, ocy, ocz = p0x - osx, p0y - osy, p0z - osz
    h = _dot3(dx, dy, dz, ocx, ocy, ocz)
    cc = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - e1x * e1x
    disc = h * h - cc
    sq = jnp.sqrt(jnp.where(disc >= 0.0, jnp.maximum(disc, 1e-20), 1.0))
    s_r1 = h - sq
    s_r2 = h + sq

    cpx, cpy, cpz = _cross3(e1x, e1y, e1z, e2x, e2y, e2z)
    cp_sq_raw = _dot3(cpx, cpy, cpz, cpx, cpy, cpz)
    degen = cp_sq_raw < 1e-24
    cpx = jnp.where(degen, 0.0, cpx)
    cpy = jnp.where(degen, 0.0, cpy)
    cpz = jnp.where(degen, 1.0, cpz)
    cp_sq = jnp.where(degen, 1.0, cp_sq_raw)
    inv_cp = jax.lax.rsqrt(cp_sq)
    nux, nuy, nuz = cpx * inv_cp, cpy * inv_cp, cpz * inv_cp
    denom = _dot3(nux, nuy, nuz, dx, dy, dz)
    denom_ok = jnp.abs(denom) > DENOM_EPS
    denom_safe = jnp.where(denom_ok, denom, 1.0)
    t_plane = _dot3(nux, nuy, nuz, p0x - osx, p0y - osy, p0z - osz) \
        / denom_safe
    prx = osx + t_plane * dx - p0x
    pry = osy + t_plane * dy - p0y
    prz = osz + t_plane * dz - p0z
    nsx, nsy, nsz = cpx / cp_sq, cpy / cp_sq, cpz / cp_sq
    c1x, c1y, c1z = _cross3(prx, pry, prz, e2x, e2y, e2z)
    c2x, c2y, c2z = _cross3(e1x, e1y, e1z, prx, pry, prz)
    a = _dot3(nsx, nsy, nsz, c1x, c1y, c1z)
    b = _dot3(nsx, nsy, nsz, c2x, c2y, c2z)
    in01 = lambda x: (0.0 <= x) & (x <= 1.0)
    # no bool-vector select: combine membership as masked float
    member_par = jnp.where(in01(a) & in01(b), 1.0, 0.0)
    member_tri = jnp.where((a >= 0.0) & (b >= 0.0) & (a + b <= 1.0),
                           1.0, 0.0)
    member_f = jnp.where(is_par, member_par, member_tri)
    plane_ok = denom_ok & ~degen & (member_f > 0.5)

    r1 = jnp.where(is_sphere, jnp.where(disc >= 0.0, s_r1, INF),
                   jnp.where(plane_ok, t_plane, INF))
    r2 = jnp.where(is_sphere & (disc >= 0.0), s_r2, INF)
    if has_box:
        # slab test: p0 = lo, e1 = hi (ops/intersect.py:_box_roots_rows)
        tn = jnp.full_like(r1, -INF)
        tf = jnp.full_like(r1, INF)
        for lo_c, hi_c, o_c, d_c in ((p0x, e1x, osx, dx),
                                     (p0y, e1y, osy, dy),
                                     (p0z, e1z, osz, dz)):
            d_sf = jnp.where(jnp.abs(d_c) < 1e-20,
                             jnp.where(d_c < 0, -1e-20, 1e-20), d_c)
            t0 = (lo_c - o_c) / d_sf
            t1 = (hi_c - o_c) / d_sf
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        box_ok = is_boxk & (tn <= tf)
        r1 = jnp.where(box_ok, tn, r1)
        r2 = jnp.where(box_ok, tf, r2)
    # roots_to_hit_t: nearest root strictly inside the open interval
    ok1 = (t_min < r1) & (r1 < INF)
    ok2 = (t_min < r2) & (r2 < INF)
    t_roots = jnp.where(ok1, r1, jnp.where(ok2, r2, INF))

    valid = (idxv_f > 0.5) & (t_roots < INF)
    t_safe = jnp.where(valid, t_roots, 1.0)
    px = ox + t_safe * dx
    py = oy + t_safe * dy
    pz = oz + t_safe * dz

    # ---- hit record (ops/intersect.py:make_hit_record_rows) ----
    radius = jnp.where(jnp.abs(e1x) > 0, e1x, 1.0)
    inv_r = 1.0 / radius
    # record-side prim is shifted forward; point - p0_shifted equals the
    # os-relative offset
    rx = osx + t_safe * dx - p0x
    ry = osy + t_safe * dy - p0y
    rz = osz + t_safe * dz - p0z
    owx, owy, owz = rx * inv_r, ry * inv_r, rz * inv_r
    s_front_f = jnp.where(_dot3(dx, dy, dz, owx, owy, owz) <= 0.0, 1.0, 0.0)
    sgn_s = 2.0 * s_front_f - 1.0
    s_nx, s_ny, s_nz = owx * sgn_s, owy * sgn_s, owz * sgn_s
    xz_ok = owx * owx + owz * owz > 1e-12
    sxu = jnp.where(xz_ok, owx, 0.0)
    szu = jnp.where(xz_ok, owz, 1.0)
    s_u = atan2(sxu, szu) * (0.5 / math.pi) + 0.5
    s_v = acos(jnp.clip(-owy, -1.0 + 1e-6, 1.0 - 1e-6)) * (1.0 / math.pi)

    p_front_f = jnp.where(denom < 0.0, 1.0, 0.0)
    sgn_p = 2.0 * p_front_f - 1.0
    p_nx, p_ny, p_nz = nux * sgn_p, nuy * sgn_p, nuz * sgn_p
    # plane (a, b) at the record point (== t_plane for plane winners)
    c1x, c1y, c1z = _cross3(rx, ry, rz, e2x, e2y, e2z)
    c2x, c2y, c2z = _cross3(e1x, e1y, e1z, rx, ry, rz)
    ra = _dot3(nsx, nsy, nsz, c1x, c1y, c1z)
    rb = _dot3(nsx, nsy, nsz, c2x, c2y, c2z)
    w0 = 1.0 - ra - rb
    tri_u = w0 * uv0u + ra * uv1u + rb * uv2u
    tri_v = w0 * uv0v + ra * uv1v + rb * uv2v
    p_u = jnp.where(is_tri, tri_u, ra)
    p_v = jnp.where(is_tri, tri_v, rb)

    nx = jnp.where(is_sphere, s_nx, p_nx)
    ny = jnp.where(is_sphere, s_ny, p_ny)
    nz = jnp.where(is_sphere, s_nz, p_nz)
    front_f = jnp.where(is_sphere, s_front_f, p_front_f)
    uu = jnp.where(is_sphere, s_u, p_u)
    vv = jnp.where(is_sphere, s_v, p_v)

    if has_box:
        szx = jnp.maximum(e1x - p0x, 1e-12)
        szy = jnp.maximum(e1y - p0y, 1e-12)
        szz = jnp.maximum(e1z - p0z, 1e-12)
        # rel = (point - center)/size, center = (lo+hi)/2; rx is point-lo
        relx = rx / szx - 0.5
        rely = ry / szy - 0.5
        relz = rz / szz - 0.5
        arx, ary, arz = jnp.abs(relx), jnp.abs(rely), jnp.abs(relz)
        ax_x = (arx >= ary) & (arx >= arz)
        ax_y = ~ax_x & (ary >= arz)
        ax_z = ~ax_x & ~ax_y
        # sign(where(rel==0, 1, rel)) == where(rel>=0, 1, -1)
        sgx = jnp.where(relx >= 0.0, 1.0, -1.0)
        sgy = jnp.where(rely >= 0.0, 1.0, -1.0)
        sgz = jnp.where(relz >= 0.0, 1.0, -1.0)
        bowx = jnp.where(ax_x, sgx, 0.0)
        bowy = jnp.where(ax_y, sgy, 0.0)
        bowz = jnp.where(ax_z, sgz, 0.0)
        b_front_f = jnp.where(_dot3(dx, dy, dz, bowx, bowy, bowz) < 0.0,
                              1.0, 0.0)
        sgn_b = 2.0 * b_front_f - 1.0
        fx_ = rx / szx
        fy_ = ry / szy
        fz_ = rz / szz
        # face -> (a, b) per the reference cuboid winding
        # (Geometry.hs:154-166; scene/builder.py:box_faces)
        b_a = jnp.where(
            ax_z, jnp.where(sgz > 0.0, fx_, 1.0 - fx_),
            jnp.where(ax_x, jnp.where(sgx > 0.0, 1.0 - fz_, fz_), fx_))
        b_b = jnp.where(ax_y, jnp.where(sgy > 0.0, 1.0 - fz_, fz_), fy_)
        nx = jnp.where(is_boxk, bowx * sgn_b, nx)
        ny = jnp.where(is_boxk, bowy * sgn_b, ny)
        nz = jnp.where(is_boxk, bowz * sgn_b, nz)
        front_f = jnp.where(is_boxk, b_front_f, front_f)
        uu = jnp.where(is_boxk, b_a, uu)
        vv = jnp.where(is_boxk, b_b, vv)

    front = front_f > 0.5

    # ---- texture (textures.py:eval_texture; floor kills uv grads) ----
    i_f = jnp.floor(uu * f0l)
    j_f = jnp.floor(vv * f1l)
    odd = jnp.mod(i_f + j_f, 2.0) != 0.0
    use_c1 = (texkind == float(TEX_CHECKER)) & odd
    alr = jnp.where(use_c1, c1r, c0r)
    alg = jnp.where(use_c1, c1g, c0g)
    alb = jnp.where(use_c1, c1b, c0b)
    # rich textures (image/noise/marble/custom) are DEFERRED: albedo 1.0
    # here, texel multiplied into throughput outside the kernel by the
    # fused-iteration driver (diff/fused_iter.py) — mirrors the forward
    # megakernel's deferral (bounce_kernel._shade_values).  The where
    # also zeroes c0/c1 cotangents for rich rows.
    rich_tex = texkind > float(TEX_CHECKER)
    alr = jnp.where(rich_tex, 1.0, alr)
    alg = jnp.where(rich_tex, 1.0, alg)
    alb = jnp.where(rich_tex, 1.0, alb)

    live_hit = alive & valid
    miss_f = jnp.where(alive & ~valid, 1.0, 0.0)

    # ---- emission (Ray.hs:181-183); background added by the caller ----
    emit_f = jnp.where(live_hit & (kind_m == float(MAT_LIGHT)), 1.0, 0.0)
    rad_r = thr_r * alr * emit_f
    rad_g = thr_g * alg * emit_f
    rad_b = thr_b * alb * emit_f

    # ---- behaviour classes ----
    is_absorb = (kind_m == float(MAT_LIGHT)) | \
        (kind_m == float(MAT_PITCH_BLACK))
    is_hemi = (kind_m == float(MAT_LAMBERTIAN)) | \
        (kind_m == float(MAT_LOMMEL))
    is_metal = kind_m == float(MAT_METAL)
    is_diel = kind_m == float(MAT_DIELECTRIC)
    is_mirror = kind_m == float(MAT_MIRROR)
    is_spec = is_mirror | is_metal | is_diel | \
        (kind_m == float(MAT_TRANSPARENT))

    # ---- specular family (Material.hs:65-112) ----
    ddn = _dot3(dx, dy, dz, nx, ny, nz)
    rfx = dx - 2.0 * ddn * nx
    rfy = dy - 2.0 * ddn * ny
    rfz = dz - 2.0 * ddn * nz
    zf = 1.0 - 2.0 * u0
    rf = jnp.sqrt(jnp.maximum(1.0 - zf * zf, 0.0))
    phf = (2.0 * math.pi) * u1
    fux, fuy, fuz = rf * jnp.cos(phf), rf * jnp.sin(phf), zf
    mxx = rfx + param * fux
    mxy = rfy + param * fuy
    mxz = rfz + param * fuz
    metal_ok = _dot3(mxx, mxy, mxz, nx, ny, nz) > 0.0
    mxx, mxy, mxz = _norm3(mxx, mxy, mxz)

    ior = jnp.maximum(param, 1e-6)
    ior_ratio = jnp.where(front, 1.0 / ior, ior)
    cos_t = jnp.minimum(1.0, _dot3(nx, ny, nz, -dx, -dy, -dz))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    cannot = ior_ratio * sin_t > 1.0
    r0 = (1.0 - ior_ratio) / (1.0 + ior_ratio)
    r0 = r0 * r0
    one_c = 1.0 - cos_t
    oc2 = one_c * one_c
    schlick = r0 + (1.0 - r0) * (oc2 * oc2 * one_c)
    di_reflect = cannot | (u2 < schlick)
    qx = ior_ratio * (dx + cos_t * nx)
    qy = ior_ratio * (dy + cos_t * ny)
    qz = ior_ratio * (dz + cos_t * nz)
    rem = jnp.maximum(jnp.abs(1.0 - (qx * qx + qy * qy + qz * qz)), 1e-12)
    par = jnp.sqrt(rem)
    fx2, fy2, fz2 = qx - par * nx, qy - par * ny, qz - par * nz
    dix = jnp.where(di_reflect, rfx, fx2)
    diy = jnp.where(di_reflect, rfy, fy2)
    diz = jnp.where(di_reflect, rfz, fz2)

    spx = jnp.where(is_mirror, rfx, dx)
    spy = jnp.where(is_mirror, rfy, dy)
    spz = jnp.where(is_mirror, rfz, dz)
    spx = jnp.where(is_metal, mxx, spx)
    spy = jnp.where(is_metal, mxy, spy)
    spz = jnp.where(is_metal, mxz, spz)
    spx = jnp.where(is_diel, dix, spx)
    spy = jnp.where(is_diel, diy, spy)
    spz = jnp.where(is_diel, diz, spz)
    s_ar = jnp.where(is_diel, 1.0, alr)
    s_ag = jnp.where(is_diel, 1.0, alg)
    s_ab = jnp.where(is_diel, 1.0, alb)
    spec_dead = is_metal & ~metal_ok

    # ---- diffuse family with redirection (Ray.hs:187-224) ----
    zu = 1.0 - 2.0 * u3
    ru = jnp.sqrt(jnp.maximum(1.0 - zu * zu, 0.0))
    phu = (2.0 * math.pi) * u4
    uux, uuy, uuz = ru * jnp.cos(phu), ru * jnp.sin(phu), zu
    cdx, cdy, cdz = nx + uux, ny + uuy, nz + uuz
    cdx, cdy, cdz = _norm3(cdx, cdy, cdz)
    bx = jnp.where(is_hemi, cdx, uux)
    by = jnp.where(is_hemi, cdy, uuy)
    bz = jnp.where(is_hemi, cdz, uuz)

    if n_targets > 0:
        qs, us, vs, probs = tgt
        cdf = []
        acc = 0.0
        for ti in range(n_targets):
            acc = acc + probs[ti]
            cdf.append(acc)
        use_t = u5 < cdf[n_targets - 1]
        zz = jnp.zeros_like(u5)
        lqx = lqy = lqz = lux = luy = luz = lvx = lvy = lvz = zz
        chosen = zz
        for ti in range(n_targets):
            pick = (u5 < cdf[ti]) & (chosen < 0.5)
            chosen = jnp.where(pick, 1.0, chosen)
            lqx = jnp.where(pick, qs[ti][0], lqx)
            lqy = jnp.where(pick, qs[ti][1], lqy)
            lqz = jnp.where(pick, qs[ti][2], lqz)
            lux = jnp.where(pick, us[ti][0], lux)
            luy = jnp.where(pick, us[ti][1], luy)
            luz = jnp.where(pick, us[ti][2], luz)
            lvx = jnp.where(pick, vs[ti][0], lvx)
            lvy = jnp.where(pick, vs[ti][1], lvy)
            lvz = jnp.where(pick, vs[ti][2], lvz)
        tgx = lqx + u6 * lux + u7 * lvx - px
        tgy = lqy + u6 * luy + u7 * lvy - py
        tgz = lqz + u6 * luz + u7 * lvz - pz
        tgx, tgy, tgz = _norm3(tgx, tgy, tgz)
        bx = jnp.where(use_t, tgx, bx)
        by = jnp.where(use_t, tgy, by)
        bz = jnp.where(use_t, tgz, bz)
    bx, by, bz = _SG(bx), _SG(by), _SG(bz)

    mu1 = _dot3(bx, by, bz, nx, ny, nz)
    pdf_base = jnp.where(is_hemi, mu1 * (1.0 / math.pi), 0.25 / math.pi)
    hemi_dead = is_hemi & (pdf_base <= 0.0)

    if n_targets > 0:
        rem_prob = 1.0 - cdf[n_targets - 1]
        pdf_sum = rem_prob * pdf_base
        for ti in range(n_targets):
            cpx_t, cpy_t, cpz_t = _cross3(
                us[ti][0], us[ti][1], us[ti][2],
                vs[ti][0], vs[ti][1], vs[ti][2])
            cp2 = jnp.maximum(cpx_t * cpx_t + cpy_t * cpy_t
                              + cpz_t * cpz_t, 1e-30)
            inv_sq_t = jax.lax.rsqrt(cp2)
            ntx = cpx_t * inv_sq_t
            nty = cpy_t * inv_sq_t
            ntz = cpz_t * inv_sq_t
            den = bx * ntx + by * nty + bz * ntz
            den_ok = jnp.abs(den) > 1e-8
            den_s = jnp.where(den_ok, den, 1.0)
            qn = qs[ti][0] * ntx + qs[ti][1] * nty + qs[ti][2] * ntz
            tt = (qn - (px * ntx + py * nty + pz * ntz)) / den_s
            nsx_t, nsy_t, nsz_t = cpx_t / cp2, cpy_t / cp2, cpz_t / cp2
            wax, way, waz = _cross3(vs[ti][0], vs[ti][1], vs[ti][2],
                                    nsx_t, nsy_t, nsz_t)
            wbx, wby, wbz = _cross3(nsx_t, nsy_t, nsz_t,
                                    us[ti][0], us[ti][1], us[ti][2])
            hx = px + tt * bx - qs[ti][0]
            hy = py + tt * by - qs[ti][1]
            hz = pz + tt * bz - qs[ti][2]
            aa = _dot3(hx, hy, hz, wax, way, waz)
            bb = _dot3(hx, hy, hz, wbx, wby, wbz)
            hit_t = (den_ok & (tt > 0.0) & (0.0 <= aa) & (aa <= 1.0)
                     & (0.0 <= bb) & (bb <= 1.0))
            cross_dot = jnp.abs(bx * cpx_t + by * cpy_t + bz * cpz_t)
            pdf_i = jnp.where(
                hit_t, tt * tt / jnp.maximum(cross_dot, 1e-12), 0.0)
            pdf_sum = pdf_sum + probs[ti] * pdf_i
        pdf_mix = pdf_sum
    else:
        pdf_mix = pdf_base
    pdf_mix = _SG(jnp.maximum(pdf_mix, 1e-12))

    mu0 = -ddn
    lommel = 0.25 / jnp.maximum(mu0 + mu1, 1e-8)
    g_hg = param
    hg_mu = _dot3(dx, dy, dz, bx, by, bz)
    hg_den = jnp.maximum(1.0 + g_hg * g_hg - 2.0 * g_hg * hg_mu, 1e-12)
    hg = (1.0 - g_hg * g_hg) / (hg_den * jnp.sqrt(hg_den))
    brdf = jnp.where(kind_m == float(MAT_LOMMEL), lommel, 1.0)
    brdf = jnp.where(kind_m == float(MAT_ANISOTROPIC), hg, brdf)
    dw = brdf * pdf_base / pdf_mix
    d_ar = alr * dw
    d_ag = alg * dw
    d_ab = alb * dw

    # ---- combine ----
    ndx = jnp.where(is_spec, spx, bx)
    ndy = jnp.where(is_spec, spy, by)
    ndz = jnp.where(is_spec, spz, bz)
    w_r = jnp.where(is_spec, s_ar, d_ar)
    w_g = jnp.where(is_spec, s_ag, d_ag)
    w_b = jnp.where(is_spec, s_ab, d_ab)
    next_alive = live_hit & ~is_absorb & ~spec_dead & ~hemi_dead

    thr2r = jnp.where(next_alive, thr_r * w_r, thr_r)
    thr2g = jnp.where(next_alive, thr_g * w_g, thr_g)
    thr2b = jnp.where(next_alive, thr_b * w_b, thr_b)
    o2x = jnp.where(next_alive, px, ox)
    o2y = jnp.where(next_alive, py, oy)
    o2z = jnp.where(next_alive, pz, oz)
    d2x = jnp.where(next_alive, ndx, dx)
    d2y = jnp.where(next_alive, ndy, dy)
    d2z = jnp.where(next_alive, ndz, dz)
    return (o2x, o2y, o2z, d2x, d2y, d2z, rad_r, rad_g, rad_b,
            thr2r, thr2g, thr2b, miss_f)


def build_det(scene, s, uniforms_cols, alive, idx):
    """Detached per-lane context for :func:`lane_math` + the one-hot
    selectors: returns ``(det, oh_p, oh_m, oh_t)``.  ``uniforms_cols`` is
    the 8-tuple of bounce uniform columns ([R] each)."""
    from ..core.vecmath import onehot_rows
    p, m, tx = scene.prims, scene.materials, scene.textures
    n, nm, nt = p.kind.shape[0], m.kind.shape[0], tx.kind.shape[0]
    pi = jnp.maximum(idx, 0)
    oh_p = onehot_rows(pi, n)
    kind_p = oh_p @ p.kind.astype(DTYPE)
    mat_f = oh_p @ p.mat.astype(DTYPE)
    oh_m = jax.nn.one_hot(mat_f.astype(jnp.int32), nm, dtype=DTYPE)
    kind_m = oh_m @ m.kind.astype(DTYPE)
    tex_f = oh_m @ m.tex.astype(DTYPE)
    oh_t = jax.nn.one_hot(tex_f.astype(jnp.int32), nt, dtype=DTYPE)
    texkind = oh_t @ tx.kind.astype(DTYPE)
    f0l = oh_t @ tx.f0
    f1l = oh_t @ tx.f1
    uvr = oh_p @ p.uvs.reshape(n, 6)
    det = ((kind_p, kind_m, texkind, f0l, f1l)
           + tuple(uvr[:, k] for k in range(6))
           + tuple(uniforms_cols)
           + (jnp.where(alive, 1.0, 0.0).astype(DTYPE),
              jnp.where(idx >= 0, 1.0, 0.0).astype(DTYPE)))
    return jax.lax.stop_gradient(det), _SG(oh_p), _SG(oh_m), _SG(oh_t)


def build_tgt(s, n_targets: int):
    """Detached redirect-target scalars for :func:`lane_math`."""
    if n_targets == 0:
        return ([], [], [], [])
    q = _SG(s.redirect_q)
    u = _SG(s.redirect_u)
    v = _SG(s.redirect_v)
    pr = _SG(s.redirect_prob)
    qs = [(q[t, 0], q[t, 1], q[t, 2]) for t in range(n_targets)]
    us = [(u[t, 0], u[t, 1], u[t, 2]) for t in range(n_targets)]
    vs = [(v[t, 0], v[t, 1], v[t, 2]) for t in range(n_targets)]
    probs = [pr[t] for t in range(n_targets)]
    return (qs, us, vs, probs)


def _bg_term(s, o, d, thr, miss_f):
    """Miss-background radiance contribution (Ray.hs:179), kept outside
    :func:`lane_math` so arbitrary jittable backgrounds stay supported."""
    bg = s.background(o, d).astype(DTYPE)
    return thr * bg * miss_f[:, None]


def replay_bwd_soa(scene, s, comps, u_cols, thr, alive, idx, ct12, *,
                   has_motion: bool, t_min: float, use_pallas: bool,
                   interpret: bool = False):
    """VJP of one megakernel bounce via the SoA replay.

    ``comps`` = (ox, oy, oz, dx, dy, dz, time), ``thr`` = (r, g, b),
    ``u_cols`` the 8 bounce uniform columns, ``ct12`` the cotangents of
    (o2 x3, d2 x3, radiance contribution x3, thr2 x3) — all 1-D [R].
    ``use_pallas=True`` runs the replay + transpose fused in one Pallas
    kernel (ops/pallas/bounce_bwd_kernel.py); False runs the same math
    as an XLA vjp (CPU / the numerical-oracle path in tests).

    Returns ``(g_scene, g_lane)`` with ``g_lane = (g_o x3, g_d x3,
    g_time, g_thr x3)``; ``g_scene`` mirrors the scene pytree with
    float-leaf gradients and is numerically equal to ``jax.vjp`` over
    the generic XLA replay.
    """
    p = scene.prims
    m = scene.materials
    tx = scene.textures
    n_targets = int(s.n_redirect)
    has_box = p.has_box
    ox, oy, oz, dx, dy, dz, time = comps
    tr, tg, tb = thr
    r = ox.shape[0]

    if not use_pallas:
        det, oh_p, oh_m, oh_t = build_det(scene, s, u_cols, alive, idx)
        tgt = build_tgt(s, n_targets)
        parts = [p.p0, p.e1, p.e2]
        if has_motion:
            parts += [p.mv0, p.mv1]
        ptab = jnp.concatenate(parts, axis=1)

        def h(ptab, mparam, tc0, tc1, ox, oy, oz, dx, dy, dz, time,
              tr, tg, tb):
            rows = oh_p @ ptab
            c0 = oh_t @ tc0
            c1 = oh_t @ tc1
            param = oh_m @ mparam
            diff = (tuple(rows[:, k] for k in range(rows.shape[1]))
                    + (c0[:, 0], c0[:, 1], c0[:, 2],
                       c1[:, 0], c1[:, 1], c1[:, 2], param,
                       ox, oy, oz, dx, dy, dz, time, tr, tg, tb))
            outs = lane_math(diff, det, tgt, has_motion=has_motion,
                             has_box=has_box, t_min=t_min,
                             n_targets=n_targets, exact_trig=True)
            o3 = jnp.stack([ox, oy, oz], axis=-1)
            d3 = jnp.stack([dx, dy, dz], axis=-1)
            thr3 = jnp.stack([tr, tg, tb], axis=-1)
            bg = _bg_term(s, o3, d3, thr3, outs[12])
            return outs[:6] + (outs[6] + bg[:, 0], outs[7] + bg[:, 1],
                               outs[8] + bg[:, 2]) + outs[9:12]

        _, vjp = jax.vjp(h, ptab, m.param, tx.c0, tx.c1,
                         ox, oy, oz, dx, dy, dz, time, tr, tg, tb)
        (g_ptab, g_mparam, g_tc0, g_tc1, g_ox, g_oy, g_oz, g_dx, g_dy,
         g_dz, g_time, g_tr, g_tg, g_tb) = vjp(tuple(ct12))
        g_scene = assemble_scene_grads(
            scene, g_ptab[:, 0:3], g_ptab[:, 3:6], g_ptab[:, 6:9],
            g_ptab[:, 9:12] if has_motion else None,
            g_ptab[:, 12:15] if has_motion else None,
            g_mparam, g_tc0, g_tc1)
        return g_scene, (g_ox, g_oy, g_oz, g_dx, g_dy, g_dz, g_time,
                         g_tr, g_tg, g_tb)

    # ---- Pallas path: replay + transpose fused in one kernel ----
    from ..ops.pallas.bounce_bwd_kernel import bounce_bwd_megakernel
    from ..ops.pallas.bounce_kernel import pack_targets
    from ..core.vecmath import onehot_rows

    g = r // 128
    # ONE [R, N] one-hot matmul gathers everything per-prim (rows, uvs,
    # kind, mat) — oh_p is 25 MB at 2^18 lanes/24 prims, so every extra
    # pass over it is ~30 us of pure HBM traffic
    n = p.kind.shape[0]
    pi = jnp.maximum(idx, 0)
    oh_p = _SG(onehot_rows(pi, n))
    parts = [p.p0, p.e1, p.e2]
    if has_motion:
        parts += [p.mv0, p.mv1]
    n_row = 3 * len(parts)
    merged = jnp.concatenate(
        parts + [p.uvs.reshape(n, 6), p.kind.astype(DTYPE)[:, None],
                 p.mat.astype(DTYPE)[:, None]], axis=1)
    rows_all = _SG(oh_p @ merged)
    rows = rows_all[:, :n_row]
    uvr = rows_all[:, n_row:n_row + 6]
    kind_p = rows_all[:, n_row + 6]
    mat_f = rows_all[:, n_row + 7]
    nm, nt = m.kind.shape[0], tx.kind.shape[0]
    oh_m = _SG(jax.nn.one_hot(mat_f.astype(jnp.int32), nm, dtype=DTYPE))
    mrows = oh_m @ jnp.concatenate(
        [m.kind.astype(DTYPE)[:, None], m.tex.astype(DTYPE)[:, None],
         m.param[:, None]], axis=1)
    kind_m, tex_f, param = mrows[:, 0], mrows[:, 1], mrows[:, 2]
    oh_t = _SG(jax.nn.one_hot(tex_f.astype(jnp.int32), nt, dtype=DTYPE))
    trows = oh_t @ jnp.concatenate(
        [tx.kind.astype(DTYPE)[:, None], tx.f0[:, None], tx.f1[:, None],
         tx.c0, tx.c1], axis=1)
    texkind, f0l, f1l = trows[:, 0], trows[:, 1], trows[:, 2]
    c0 = trows[:, 3:6]
    c1 = trows[:, 6:9]
    det = ((_SG(kind_p), _SG(kind_m), _SG(texkind), _SG(f0l), _SG(f1l))
           + tuple(_SG(uvr[:, k]) for k in range(6))
           + tuple(u_cols)
           + (jnp.where(alive, 1.0, 0.0).astype(DTYPE),
              jnp.where(idx >= 0, 1.0, 0.0).astype(DTYPE)))
    det = jax.lax.stop_gradient(det)

    diff_rows = (tuple(rows[:, k] for k in range(n_row))
                 + (c0[:, 0], c0[:, 1], c0[:, 2],
                    c1[:, 0], c1[:, 1], c1[:, 2], param,
                    ox, oy, oz, dx, dy, dz, time, tr, tg, tb))
    n_diff = len(diff_rows)
    st = lambda xs: tuple(x.reshape(g, 128) for x in xs)   # free reshape
    ttbl = pack_targets(s.redirect_prob, s.redirect_q, s.redirect_u,
                        s.redirect_v)
    gdiff, miss = bounce_bwd_megakernel(
        _SG(ttbl), _SG(st(diff_rows)), st(det), _SG(st(ct12)),
        n_targets=n_targets, has_motion=has_motion, has_box=has_box,
        t_min=t_min, interpret=interpret)
    gd = tuple(x.reshape(r) for x in gdiff)
    miss_f = miss.reshape(r)

    # winner-row / material / texture grads: one-hot-transpose matmuls
    stk = lambda a, b: jnp.stack(gd[a:b], axis=-1)     # [R, b-a]
    g_ptab = oh_p.T @ stk(0, n_row)                    # [N, n_row]
    i = n_row
    g_tc0 = oh_t.T @ stk(i, i + 3)
    g_tc1 = oh_t.T @ stk(i + 3, i + 6)
    g_mparam = gd[i + 6] @ oh_m
    i += 7
    g_lane = gd[i:i + 10]

    # miss-background term (kept in XLA: arbitrary jittable backgrounds)
    def bgf(o3, d3, thr3):
        return _bg_term(s, o3, d3, thr3, miss_f)

    o3 = jnp.stack([ox, oy, oz], axis=-1)
    d3 = jnp.stack([dx, dy, dz], axis=-1)
    thr3 = jnp.stack([tr, tg, tb], axis=-1)
    ct_rad3 = jnp.stack(ct12[6:9], axis=-1)
    _, bg_vjp = jax.vjp(bgf, o3, d3, thr3)
    go_bg, gd_bg, gthr_bg = bg_vjp(ct_rad3)
    g_lane = (g_lane[0] + go_bg[:, 0], g_lane[1] + go_bg[:, 1],
              g_lane[2] + go_bg[:, 2],
              g_lane[3] + gd_bg[:, 0], g_lane[4] + gd_bg[:, 1],
              g_lane[5] + gd_bg[:, 2], g_lane[6],
              g_lane[7] + gthr_bg[:, 0], g_lane[8] + gthr_bg[:, 1],
              g_lane[9] + gthr_bg[:, 2])

    g_scene = assemble_scene_grads(
        scene, g_ptab[:, 0:3], g_ptab[:, 3:6], g_ptab[:, 6:9],
        g_ptab[:, 9:12] if has_motion else None,
        g_ptab[:, 12:15] if has_motion else None, g_mparam, g_tc0, g_tc1)
    return g_scene, g_lane


def build_bwd_tables(scene, has_motion: bool):
    """Padded (tbl, mtbl, xtbl) for the self-gathering backward kernels
    (ops/pallas/bounce_bwd_gather_kernel.py): prim rows + uvs + kind +
    mat; material (kind, tex, param); texture (kind, f0, f1, c0, c1).
    Returns ``(tbl, mtbl, xtbl, n, n_row, nm, nt)``."""
    from ..ops.pallas.bounce_bwd_gather_kernel import CHUNK_P
    p, m, tx = scene.prims, scene.materials, scene.textures
    n, nm, nt = p.kind.shape[0], m.kind.shape[0], tx.kind.shape[0]
    parts = [p.p0, p.e1, p.e2]
    if has_motion:
        parts += [p.mv0, p.mv1]
    n_row = 3 * len(parts)
    tbl = jnp.concatenate(
        parts + [p.uvs.reshape(n, 6), p.kind.astype(DTYPE)[:, None],
                 p.mat.astype(DTYPE)[:, None]], axis=1)
    np_pad = max(-(-n // CHUNK_P) * CHUNK_P, 8) if n > CHUNK_P \
        else -(-n // 8) * 8
    pad_row = jnp.zeros((np_pad - n, tbl.shape[1]), DTYPE).at[:, n_row + 6]\
        .set(-1.0)                                  # kind=-1: no prim
    tbl = jnp.concatenate([tbl, pad_row], axis=0)
    nm_pad = -(-nm // 8) * 8
    mtbl = jnp.concatenate(
        [m.kind.astype(DTYPE)[:, None], m.tex.astype(DTYPE)[:, None],
         m.param[:, None]], axis=1)
    mtbl = jnp.concatenate(
        [mtbl, jnp.zeros((nm_pad - nm, 3), DTYPE)], axis=0)
    nt_pad = -(-nt // 8) * 8
    xtbl = jnp.concatenate(
        [tx.kind.astype(DTYPE)[:, None], tx.f0[:, None], tx.f1[:, None],
         tx.c0, tx.c1], axis=1)
    xtbl = jnp.concatenate(
        [xtbl, jnp.zeros((nt_pad - nt, 9), DTYPE)], axis=0)
    return tbl, mtbl, xtbl, n, n_row, nm, nt


def replay_bwd(scene, s, o, d, time, uniforms, throughput, alive, idx,
               cts, *, has_motion: bool, t_min: float):
    """[R, 3]-interface wrapper over :func:`replay_bwd_soa` (XLA path);
    the numerical-oracle entry used by tests.  Returns
    ``(g_scene, g_o, g_d, g_time, g_rad, g_thr)``."""
    ct_o, ct_d, ct_rad, ct_thr = cts
    ct12 = (ct_o[:, 0], ct_o[:, 1], ct_o[:, 2],
            ct_d[:, 0], ct_d[:, 1], ct_d[:, 2],
            ct_rad[:, 0], ct_rad[:, 1], ct_rad[:, 2],
            ct_thr[:, 0], ct_thr[:, 1], ct_thr[:, 2])
    comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time)
    thr = (throughput[:, 0], throughput[:, 1], throughput[:, 2])
    u_cols = tuple(uniforms[:, k] for k in range(8))
    g_scene, gl = replay_bwd_soa(
        scene, s, comps, u_cols, thr, alive, idx, ct12,
        has_motion=has_motion, t_min=t_min, use_pallas=False)
    g_o = jnp.stack(gl[0:3], axis=-1)
    g_d = jnp.stack(gl[3:6], axis=-1)
    g_thr = jnp.stack(gl[7:10], axis=-1)
    return g_scene, g_o, g_d, gl[6], ct_rad, g_thr


def replay_bwd_pallas(scene, s, o, d, time, uniforms, throughput, alive,
                      idx, cts, *, has_motion: bool, t_min: float,
                      interpret: bool = False):
    """[R, 3]-interface wrapper over :func:`replay_bwd_soa` (Pallas
    path); kept for tests/benchmarks."""
    ct_o, ct_d, ct_rad, ct_thr = cts
    ct12 = (ct_o[:, 0], ct_o[:, 1], ct_o[:, 2],
            ct_d[:, 0], ct_d[:, 1], ct_d[:, 2],
            ct_rad[:, 0], ct_rad[:, 1], ct_rad[:, 2],
            ct_thr[:, 0], ct_thr[:, 1], ct_thr[:, 2])
    comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time)
    thr = (throughput[:, 0], throughput[:, 1], throughput[:, 2])
    u_cols = tuple(uniforms[:, k] for k in range(8))
    g_scene, gl = replay_bwd_soa(
        scene, s, comps, u_cols, thr, alive, idx, ct12,
        has_motion=has_motion, t_min=t_min, use_pallas=True,
        interpret=interpret)
    g_o = jnp.stack(gl[0:3], axis=-1)
    g_d = jnp.stack(gl[3:6], axis=-1)
    g_thr = jnp.stack(gl[7:10], axis=-1)
    return g_scene, g_o, g_d, gl[6], ct_rad, g_thr


def assemble_scene_grads(scene, g_p0, g_e1, g_e2, g_mv0, g_mv1, g_mparam,
                         g_tc0, g_tc1):
    """Scene-pytree gradient: computed leaves in place, zeros elsewhere,
    None for non-float leaves (the ``partition`` params structure)."""
    p = scene.prims

    def zf(x):
        return (jnp.zeros_like(x)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                          jnp.floating)
                else None)

    g_scene = jax.tree_util.tree_map(zf, scene)
    return g_scene.replace(
        prims=g_scene.prims.replace(
            p0=g_p0, e1=g_e1, e2=g_e2,
            mv0=g_mv0 if g_mv0 is not None else jnp.zeros_like(p.mv0),
            mv1=g_mv1 if g_mv1 is not None else jnp.zeros_like(p.mv1)),
        materials=g_scene.materials.replace(param=g_mparam),
        textures=g_scene.textures.replace(c0=g_tc0, c1=g_tc1))
