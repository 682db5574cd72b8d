"""Pallas TPU megakernel: fused nearest-hit + hit-record for dense scenes.

This is the performance-critical core mandated by the BASELINE north-star
("a wavefront megakernel in Pallas fuses sphere/parallelogram/triangle
intersection ... "). The XLA dense path (ops/intersect.py) materializes
~15 [R, C] intermediates in HBM per bounce; this kernel keeps the whole
ray tile in VMEM and loops over primitives with their parameters held as
SMEM scalars, so the only HBM traffic is the ray load and record store.

Layout: ray component arrays are shaped [G, 128] (G = R/128 rows); the
grid tiles G by BLOCK_G rows per program.  Primitive parameters are
pre-packed into a [C, 32] float table (scalar-prefetched to SMEM):

  col  0-2   p0 (sphere center / plane corner q)
  col  3     sphere radius^2 (signed radius in col 30)
  col  4-6   unit plane normal n
  col  7-9   w_a = cross(v, n_s)   (a = p_rel . w_a)
  col 10-12  w_b = cross(n_s, u)   (b = p_rel . w_b)
  col 13-15  q.n, q.w_a, q.w_b
  col 16     kind (-1 pad / 0 sphere / 1 parallelogram / 2 triangle)
  col 17     material id
  col 18-23  triangle corner uvs (u0,v0,u1,v1,u2,v2)
  col 24-26  motion displacement at time 0 (mv0)
  col 27-29  motion delta (mv1 - mv0)
  col 30     sphere radius (signed)

Semantics are identical to ops/intersect.py (reference Geometry.hs:58-176):
two-root sphere selection against the open interval, plane membership via
scalar triple products, front-side flip, polar / barycentric uvs.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene.types import (
    PRIM_PARALLELOGRAM, PRIM_SPHERE, PRIM_TRIANGLE, Primitives,
)

LANES = 128
BLOCK_G = 32          # ray rows per program (32*128 = 4096 rays)
N_COLS = 32
MAX_SMEM_PRIMS = 512       # parameter table in SMEM (scalar prefetch)
MAX_DENSE_PRIMS = 8192     # above MAX_SMEM_PRIMS the table lives in VMEM


def pack_prims(prims: Primitives) -> jnp.ndarray:
    """[C, 32] float parameter table (see module docstring)."""
    kind = prims.kind
    p0 = prims.p0
    e1 = prims.e1
    e2 = prims.e2
    c = kind.shape[0]

    cp = jnp.cross(e1, e2)
    cp_sq_raw = jnp.sum(cp * cp, -1)
    degen = cp_sq_raw < 1e-24
    cp = jnp.where(degen[:, None], jnp.asarray([0.0, 0.0, 1.0]), cp)
    cp_sq = jnp.where(degen, 1.0, cp_sq_raw)
    n_unit = cp * jax.lax.rsqrt(cp_sq)[:, None]
    n_s = cp / cp_sq[:, None]
    w_a = jnp.cross(e2, n_s)
    w_b = jnp.cross(n_s, e1)
    # degenerate planes can never hit: encode as pad
    kind_f = jnp.where(
        degen & (kind != PRIM_SPHERE), -1.0, kind.astype(jnp.float32))

    tbl = jnp.zeros((c, N_COLS), jnp.float32)
    tbl = tbl.at[:, 0:3].set(p0)
    tbl = tbl.at[:, 3].set(e1[:, 0] * e1[:, 0])
    tbl = tbl.at[:, 4:7].set(n_unit)
    tbl = tbl.at[:, 7:10].set(w_a)
    tbl = tbl.at[:, 10:13].set(w_b)
    tbl = tbl.at[:, 13].set(jnp.sum(p0 * n_unit, -1))
    tbl = tbl.at[:, 14].set(jnp.sum(p0 * w_a, -1))
    tbl = tbl.at[:, 15].set(jnp.sum(p0 * w_b, -1))
    tbl = tbl.at[:, 16].set(kind_f)
    tbl = tbl.at[:, 17].set(prims.mat.astype(jnp.float32))
    tbl = tbl.at[:, 18:24].set(prims.uvs.reshape(c, 6))
    tbl = tbl.at[:, 24:27].set(prims.mv0)
    tbl = tbl.at[:, 27:30].set(prims.mv1 - prims.mv0)
    tbl = tbl.at[:, 30].set(e1[:, 0])
    return tbl


def prim_loop(tbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv, *, n_prims: int,
              t_min: float, has_motion: bool):
    """Shared fused nearest-hit loop over the packed primitive table.

    Operates on value tiles (any shape); returns
    (t, idx_f, nx, ny, nz, front_f, u, v, mat_f, sphere_f) where the
    normal faces the ray, ``front_f``/``sphere_f`` are 0/1 floats and
    sphere uv is NOT yet computed (needs atan2; see callers).
    """
    shp = oxv.shape

    inf = jnp.float32(jnp.inf)
    init = (
        jnp.full(shp, inf, jnp.float32),          # best t
        jnp.full(shp, -1.0, jnp.float32),         # best prim index
        jnp.zeros(shp, jnp.float32),              # outward x / normal
        jnp.zeros(shp, jnp.float32),
        jnp.ones(shp, jnp.float32),
        jnp.zeros(shp, jnp.float32),              # front (1.0 = front)
        jnp.zeros(shp, jnp.float32),              # u
        jnp.zeros(shp, jnp.float32),              # v
        jnp.zeros(shp, jnp.float32),              # mat
        jnp.ones(shp, jnp.float32),               # is_sphere (for post uv)
    )

    def body(ci, carry):
        (bt, bi, cnx, cny, cnz, cfr, cu, cv, cm, csp) = carry
        px = tbl_ref[ci, 0]
        py = tbl_ref[ci, 1]
        pz = tbl_ref[ci, 2]
        if has_motion:
            sx = tbl_ref[ci, 24] + tmv * tbl_ref[ci, 27]
            sy = tbl_ref[ci, 25] + tmv * tbl_ref[ci, 28]
            sz = tbl_ref[ci, 26] + tmv * tbl_ref[ci, 29]
            px = px + sx
            py = py + sy
            pz = pz + sz
        kind = tbl_ref[ci, 16]

        # ---- sphere branch (Geometry.hs:63-92) ----
        r2 = tbl_ref[ci, 3]
        ocx = px - oxv
        ocy = py - oyv
        ocz = pz - ozv
        h = dxv * ocx + dyv * ocy + dzv * ocz
        cterm = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = h * h - cterm
        ok_s = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = h - sq
        rr2 = h + sq
        t_s = jnp.where(r1 > t_min, r1, jnp.where(rr2 > t_min, rr2, inf))
        t_s = jnp.where(ok_s, t_s, inf)

        # ---- plane branch (Geometry.hs:117-142) ----
        nxs = tbl_ref[ci, 4]
        nys = tbl_ref[ci, 5]
        nzs = tbl_ref[ci, 6]
        den = dxv * nxs + dyv * nys + dzv * nzs
        den_ok = jnp.abs(den) > 1e-8
        den_safe = jnp.where(den_ok, den, 1.0)
        on = oxv * nxs + oyv * nys + ozv * nzs
        t_p = (tbl_ref[ci, 13] - on) / den_safe
        wax, way, waz = tbl_ref[ci, 7], tbl_ref[ci, 8], tbl_ref[ci, 9]
        wbx, wby, wbz = tbl_ref[ci, 10], tbl_ref[ci, 11], tbl_ref[ci, 12]
        owa = oxv * wax + oyv * way + ozv * waz
        dwa = dxv * wax + dyv * way + dzv * waz
        owb = oxv * wbx + oyv * wby + ozv * wbz
        dwb = dxv * wbx + dyv * wby + dzv * wbz
        a = owa - tbl_ref[ci, 14] + t_p * dwa
        b = owb - tbl_ref[ci, 15] + t_p * dwb
        is_tri = kind == 2.0
        # Mosaic cannot select i1 vectors: fold the tri/para membership
        # difference into a float bound (tri: a+b<=1; para: max(a,b)<=1)
        bound = jnp.where(is_tri, a + b, jnp.maximum(a, b))
        memb = (a >= 0.0) & (b >= 0.0) & (bound <= 1.0)
        ok_p = den_ok & memb & (t_p > t_min)
        t_pv = jnp.where(ok_p, t_p, inf)

        is_sphere = kind == 0.0
        cand = jnp.where(is_sphere, t_s,
                         jnp.where(kind > 0.5, t_pv, inf))
        better = cand < bt

        # record attributes of the candidate
        # sphere: outward normal (computed from point), front = t <= h
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30)) * jnp.sign(
            tbl_ref[ci, 30])
        sox = (oxv + cand * dxv - px) * inv_r
        soy = (oyv + cand * dyv - py) * inv_r
        soz = (ozv + cand * dzv - pz) * inv_r
        # front flags as floats (i1-vector selects don't legalize)
        s_front = jnp.where(cand <= h, 1.0, 0.0)
        # plane: normal = n (flip later by front), front = den < 0
        p_front = jnp.where(den < 0.0, 1.0, 0.0)
        # triangle uv interpolation / parallelogram (a, b)
        u0, v0 = tbl_ref[ci, 18], tbl_ref[ci, 19]
        u1, v1 = tbl_ref[ci, 20], tbl_ref[ci, 21]
        u2, v2 = tbl_ref[ci, 22], tbl_ref[ci, 23]
        w0 = 1.0 - a - b
        uu = jnp.where(is_tri, w0 * u0 + a * u1 + b * u2, a)
        vv = jnp.where(is_tri, w0 * v0 + a * v1 + b * v2, b)

        nx_c = jnp.where(is_sphere, sox, nxs)
        ny_c = jnp.where(is_sphere, soy, nys)
        nz_c = jnp.where(is_sphere, soz, nzs)
        fr_c = jnp.where(is_sphere, s_front, p_front)

        bt = jnp.where(better, cand, bt)
        bi = jnp.where(better, ci.astype(jnp.float32), bi)
        cnx = jnp.where(better, nx_c, cnx)
        cny = jnp.where(better, ny_c, cny)
        cnz = jnp.where(better, nz_c, cnz)
        cfr = jnp.where(better, fr_c, cfr)
        cu = jnp.where(better, uu, cu)
        cv = jnp.where(better, vv, cv)
        cm = jnp.where(better, tbl_ref[ci, 17], cm)
        csp = jnp.where(better, jnp.where(is_sphere, 1.0, 0.0), csp)
        return (bt, bi, cnx, cny, cnz, cfr, cu, cv, cm, csp)

    (bt, bi, cnx, cny, cnz, cfr, cu, cv, cm, csp) = jax.lax.fori_loop(
        0, n_prims, body, init)

    # flip the normal toward the ray
    flip = jnp.where(cfr > 0.5, 1.0, -1.0)
    return (bt, bi, cnx * flip, cny * flip, cnz * flip, cfr, cu, cv, cm, csp)


def _kernel(tbl_ref, ox, oy, oz, dx, dy, dz, tm,
            t_out, i_out, nx_out, ny_out, nz_out, fr_out, u_out, v_out,
            m_out, *, n_prims: int, t_min: float, has_motion: bool):
    (bt, bi, nx, ny, nz, cfr, cu, cv, cm, csp) = prim_loop(
        tbl_ref, ox[...], oy[...], oz[...], dx[...], dy[...], dz[...],
        tm[...] if has_motion else None, n_prims=n_prims, t_min=t_min,
        has_motion=has_motion)
    t_out[...] = bt
    # sphere uv is computed by the caller (atan2/arccos have no cheap
    # Pallas lowering here) from the outward normal = normal * (+-1 front).
    # sphere flag piggybacks on the front output: bit0 front, bit1 sphere
    fr_out[...] = ((cfr > 0.5).astype(jnp.int32)
                   + 2 * (csp > 0.5).astype(jnp.int32))
    i_out[...] = bi.astype(jnp.int32)
    nx_out[...] = nx
    ny_out[...] = ny
    nz_out[...] = nz
    u_out[...] = cu
    v_out[...] = cv
    m_out[...] = cm.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("n_prims", "t_min", "has_motion", "interpret"))
def pallas_nearest_record(tbl, ox, oy, oz, dx, dy, dz, tm, *, n_prims: int,
                          t_min: float, has_motion: bool,
                          interpret: bool = False):
    """Run the dense megakernel.  Ray components are [G, 128] arrays.

    Returns (t, idx, nx, ny, nz, front, u, v, mat), all [G, 128].
    """
    g = ox.shape[0]
    bg = min(BLOCK_G, g)
    grid = (pl.cdiv(g, bg),)
    # with num_scalar_prefetch=1, index maps receive (grid_idx, scalar_ref)
    ray_spec = pl.BlockSpec((bg, LANES), lambda i, tbl: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((bg, LANES), lambda i, tbl: (i, 0),
                              memory_space=pltpu.VMEM)] * 9
    f32 = jnp.float32
    i32 = jnp.int32
    out_shape = [
        jax.ShapeDtypeStruct((g, LANES), f32),   # t
        jax.ShapeDtypeStruct((g, LANES), i32),   # idx
        jax.ShapeDtypeStruct((g, LANES), f32),   # nx
        jax.ShapeDtypeStruct((g, LANES), f32),   # ny
        jax.ShapeDtypeStruct((g, LANES), f32),   # nz
        jax.ShapeDtypeStruct((g, LANES), i32),   # front
        jax.ShapeDtypeStruct((g, LANES), f32),   # u
        jax.ShapeDtypeStruct((g, LANES), f32),   # v
        jax.ShapeDtypeStruct((g, LANES), i32),   # mat
    ]
    kernel = functools.partial(_kernel, n_prims=n_prims, t_min=t_min,
                               has_motion=has_motion)
    if n_prims <= MAX_SMEM_PRIMS:
        # small scene: per-primitive scalars prefetched to SMEM
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[ray_spec] * 7,
            out_specs=out_specs,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(tbl, ox, oy, oz, dx, dy, dz, tm)
    # large scene (meshes): table lives whole in VMEM; dynamic row reads
    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[tbl_spec] + [pl.BlockSpec((bg, LANES), lambda i: (i, 0),
                                            memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec((bg, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 9,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tbl, ox, oy, oz, dx, dy, dz, tm)
