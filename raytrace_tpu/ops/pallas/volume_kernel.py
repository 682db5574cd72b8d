"""Pallas TPU kernel: constant-medium boundary crossings.

The wavefront integrator samples each constant-density medium
(Geometry.hs:298-330) from the ray's two smallest boundary crossings
(render/volumes.py).  The XLA chunked-scan implementation costs ~10 ms
per 90k-lane iteration on demo2's two media (many small kernel launches
+ [R, C] HBM intermediates); this kernel keeps the whole ray tile in
VMEM and loops over each volume's boundary primitives with their
parameters in SMEM/VMEM — same structure as the flat intersect loop
(intersect_kernel.py), with a carried (first, front-of-first, second)
crossing triple instead of a nearest-hit record.

Semantics match render/volumes.py:_crossing_scan2 exactly: crossings are
strictly beyond ``t_min``; the second crossing is strictly beyond the
first (shared mesh edges collapse); sphere near roots enter (front),
far roots exit; planes are front iff approached from the normal side.

The primitive table layout is pack_prims' (intersect_kernel.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_kernel import BLOCK_G, LANES, MAX_SMEM_PRIMS

INF = float("inf")  # python float: jnp constants would be captured consts


def _merge(b1, f1, b2, c, cf):
    """Fold candidate crossing ``(c, cf)`` into the carried
    (first, front-of-first, strictly-second) triple."""
    new_b1 = jnp.minimum(b1, c)
    take = c < b1
    new_f1 = jnp.where(take, cf, f1)
    gtv = lambda x: jnp.where(x > new_b1, x, INF)
    new_b2 = jnp.minimum(jnp.minimum(gtv(b1), gtv(b2)), gtv(c))
    return new_b1, new_f1, new_b2


def _volume_loop(tbl_ref, start: int, count: int, oxv, oyv, ozv,
                 dxv, dyv, dzv, tmv, *, t_min: float, has_motion: bool,
                 has_box: bool = False):
    """Two smallest crossings of the prim slice [start, start+count)."""
    shp = oxv.shape
    if has_box:
        safe = lambda dd: jnp.where(jnp.abs(dd) < 1e-20,
                                    jnp.where(dd < 0, -1e-20, 1e-20), dd)
        inv_dx = 1.0 / safe(dxv)
        inv_dy = 1.0 / safe(dyv)
        inv_dz = 1.0 / safe(dzv)

    def body(ci, carry):
        b1, f1, b2 = carry
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
        is_sphere = kind == 0.0

        # sphere: both quadratic roots (Geometry.hs:63-80)
        r2s = tbl_ref[ci, 3]
        ocx = px - oxv
        ocy = py - oyv
        ocz = pz - ozv
        h = dxv * ocx + dyv * ocy + dzv * ocz
        disc = h * h - (ocx * ocx + ocy * ocy + ocz * ocz - r2s)
        ok_s = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        s_r1 = h - sq
        s_r2 = h + sq

        # plane: single root with membership (Geometry.hs:117-142)
        nxs, nys, nzs = tbl_ref[ci, 4], tbl_ref[ci, 5], tbl_ref[ci, 6]
        wax, way, waz = tbl_ref[ci, 7], tbl_ref[ci, 8], tbl_ref[ci, 9]
        wbx, wby, wbz = tbl_ref[ci, 10], tbl_ref[ci, 11], tbl_ref[ci, 12]
        qn = tbl_ref[ci, 13]
        qwa = tbl_ref[ci, 14]
        qwb = tbl_ref[ci, 15]
        if has_motion:
            qn = qn + sx * nxs + sy * nys + sz * nzs
            qwa = qwa + sx * wax + sy * way + sz * waz
            qwb = qwb + sx * wbx + sy * wby + sz * wbz
        den = dxv * nxs + dyv * nys + dzv * nzs
        den_ok = jnp.abs(den) > 1e-8
        t_p = (qn - (oxv * nxs + oyv * nys + ozv * nzs)) / jnp.where(
            den_ok, den, 1.0)
        a = (oxv * wax + oyv * way + ozv * waz) - qwa \
            + t_p * (dxv * wax + dyv * way + dzv * waz)
        b = (oxv * wbx + oyv * wby + ozv * wbz) - qwb \
            + t_p * (dxv * wbx + dyv * wby + dzv * wbz)
        is_tri = kind == 2.0
        bound = jnp.where(is_tri, a + b, jnp.maximum(a, b))
        memb = (a >= 0.0) & (b >= 0.0) & (bound <= 1.0)
        ok_p = den_ok & memb

        tmn = jnp.float32(t_min)
        # candidate 1: sphere near root (front/enter) or plane root
        c1 = jnp.where(is_sphere,
                       jnp.where(ok_s & (s_r1 > tmn), s_r1, INF),
                       jnp.where((kind > 0.5) & ok_p & (t_p > tmn), t_p,
                                 INF))
        cf1 = jnp.where(is_sphere, 1.0, jnp.where(den < 0.0, 1.0, 0.0))
        # candidate 2: sphere far root (back/exit); planes have none
        c2 = jnp.where(is_sphere & ok_s & (s_r2 > tmn), s_r2, INF)
        if has_box:
            # box slab roots: entry enters (front), exit exits — the same
            # two-root contract as spheres (intersect_kernel.py box docs)
            is_boxk = kind == 3.0
            hix = tbl_ref[ci, 7]
            hiy = tbl_ref[ci, 8]
            hiz = tbl_ref[ci, 9]
            if has_motion:
                hix = hix + sx
                hiy = hiy + sy
                hiz = hiz + sz
            bx0 = (px - oxv) * inv_dx
            bx1 = (hix - oxv) * inv_dx
            by0 = (py - oyv) * inv_dy
            by1 = (hiy - oyv) * inv_dy
            bz0 = (pz - ozv) * inv_dz
            bz1 = (hiz - ozv) * inv_dz
            btn = jnp.maximum(jnp.maximum(jnp.minimum(bx0, bx1),
                                          jnp.minimum(by0, by1)),
                              jnp.minimum(bz0, bz1))
            btf = jnp.minimum(jnp.minimum(jnp.maximum(bx0, bx1),
                                          jnp.maximum(by0, by1)),
                              jnp.maximum(bz0, bz1))
            ok_b = btn <= btf
            c1 = jnp.where(is_boxk,
                           jnp.where(ok_b & (btn > tmn), btn, INF), c1)
            cf1 = jnp.where(is_boxk, 1.0, cf1)
            c2 = jnp.where(is_boxk,
                           jnp.where(ok_b & (btf > tmn), btf, INF), c2)
        b1, f1, b2 = _merge(b1, f1, b2, c1, cf1)
        b1, f1, b2 = _merge(b1, f1, b2, c2, jnp.zeros(shp, jnp.float32))
        return b1, f1, b2

    init = (jnp.full(shp, INF, jnp.float32), jnp.zeros(shp, jnp.float32),
            jnp.full(shp, INF, jnp.float32))
    return jax.lax.fori_loop(start, start + count, body, init)


def _kernel(tbl_ref, ox, oy, oz, dx, dy, dz, tm, *outs,
            slices: tuple, t_min: float, has_motion: bool,
            has_box: bool = False):
    oxv, oyv, ozv = ox[...], oy[...], oz[...]
    dxv, dyv, dzv = dx[...], dy[...], dz[...]
    tmv = tm[...] if has_motion else None
    for v, (start, count) in enumerate(slices):
        b1, f1, b2 = _volume_loop(tbl_ref, start, count, oxv, oyv, ozv,
                                  dxv, dyv, dzv, tmv, t_min=t_min,
                                  has_motion=has_motion, has_box=has_box)
        outs[3 * v][...] = b1
        outs[3 * v + 1][...] = f1
        outs[3 * v + 2][...] = b2


@functools.partial(
    jax.jit,
    static_argnames=("slices", "t_min", "has_motion", "has_box",
                     "interpret"))
def pallas_volume_crossings(vtbl, ox, oy, oz, dx, dy, dz, tm, *,
                            slices: tuple, t_min: float, has_motion: bool,
                            has_box: bool = False,
                            interpret: bool = False):
    """Run the crossing kernel.  Ray components are [G, 128]; ``vtbl`` is
    pack_prims(volumes.prims); ``slices`` a static tuple of
    (start, count) per volume.

    Returns a list of 3V arrays [G, 128]:
    ``[t1_0, front1_0, t2_0, t1_1, ...]`` (front as 0/1 float).
    """
    g = ox.shape[0]
    n_out = 3 * len(slices)
    bg = min(BLOCK_G, g)
    grid = (pl.cdiv(g, bg),)
    ray_spec = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM)] * n_out
    out_shape = [jax.ShapeDtypeStruct((g, LANES), jnp.float32)] * n_out
    kernel = functools.partial(_kernel, slices=slices, t_min=t_min,
                               has_motion=has_motion, has_box=has_box)
    if vtbl.shape[0] <= MAX_SMEM_PRIMS:
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
        )(vtbl, ox, oy, oz, dx, dy, dz, tm)

    # mesh-boundary volumes (pawn: 1200 tris): table whole in VMEM
    def kernel_vmem(tbl_ref, *rest):
        kernel(tbl_ref, *rest)

    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[tbl_spec] + [ray_spec] * 7,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel_vmem,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(vtbl, ox, oy, oz, dx, dy, dz, tm)
