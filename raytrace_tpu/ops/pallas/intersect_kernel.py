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
  col 31-33  per-prim albedo (behavior-collapsed material packing only)
  col 34     per-prim material param (ditto)

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
    PRIM_BOX, PRIM_PARALLELOGRAM, PRIM_SPHERE, PRIM_TRIANGLE, Primitives,
)

LANES = 128
BLOCK_G = 32          # ray rows per program (32*128 = 4096 rays)
BLOCK_G_CLUSTERED = 32  # consensus granularity: one program = 32 rows =
                        # four 8x128 pixel tiles (grid programs run
                        # SEQUENTIALLY on the TensorCore, so smaller
                        # blocks only multiply per-cluster branch
                        # overhead, ~0.4us per (cluster, program))
N_COLS = 36
MAX_SMEM_PRIMS = 512       # parameter table in SMEM (scalar prefetch)
MAX_DENSE_PRIMS = 65536    # above MAX_SMEM_PRIMS the table lives in VMEM
CLUSTER = 64               # prims per cluster (clustered consensus loop)
CLUSTER_MIN_PRIMS = 65     # below this, the flat single-pass loop wins
import os as _os

GROUP = 16                 # clusters per group (two-level consensus)
GROUP_MIN_CLUSTERS = int(_os.environ.get("RT_GROUP_MIN_CLUSTERS", "48"))
                           # below this, one level of conds is cheaper.
                           # 48 (was 96): the bunny's 78 clusters gain
                           # the group level — fused diff 3.99 -> 4.72 M
                           # fwd+bwd rays/s (round-5 A/B)
FORCE_LOOP = None          # None adaptive; "flat"/"clustered" pin the
                           # block-level choice (tests + A/B tools)


def pack_prims(prims: Primitives, mat_override=None, albedo=None,
               param=None) -> jnp.ndarray:
    """[C, 36] float parameter table (see module docstring).

    ``mat_override``/``albedo``/``param`` fill the behavior-collapsed
    material columns (full-bounce megakernel; see
    materials.MaterialTable.behavior_of)."""
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
    # degenerate planes can never hit: encode as pad (boxes/spheres have
    # e2 = 0 by construction and are exempt)
    is_box = kind == PRIM_BOX
    kind_f = jnp.where(
        degen & (kind != PRIM_SPHERE) & ~is_box,
        -1.0, kind.astype(jnp.float32))

    tbl = jnp.zeros((c, N_COLS), jnp.float32)
    tbl = tbl.at[:, 0:3].set(p0)                       # center / q / box lo
    tbl = tbl.at[:, 3].set(e1[:, 0] * e1[:, 0])
    tbl = tbl.at[:, 4:7].set(n_unit)
    # box rows: hi corner in the w_a slots (their plane math is unused)
    tbl = tbl.at[:, 7:10].set(jnp.where(is_box[:, None], e1, w_a))
    tbl = tbl.at[:, 10:13].set(w_b)
    tbl = tbl.at[:, 13].set(jnp.sum(p0 * n_unit, -1))
    tbl = tbl.at[:, 14].set(jnp.sum(p0 * w_a, -1))
    tbl = tbl.at[:, 15].set(jnp.sum(p0 * w_b, -1))
    tbl = tbl.at[:, 16].set(kind_f)
    mat = prims.mat if mat_override is None else mat_override
    tbl = tbl.at[:, 17].set(mat.astype(jnp.float32))
    tbl = tbl.at[:, 18:24].set(prims.uvs.reshape(c, 6))
    tbl = tbl.at[:, 24:27].set(prims.mv0)
    tbl = tbl.at[:, 27:30].set(prims.mv1 - prims.mv0)
    tbl = tbl.at[:, 30].set(e1[:, 0])
    if albedo is not None:
        tbl = tbl.at[:, 31:34].set(albedo)
    if param is not None:
        tbl = tbl.at[:, 34].set(param)
    return tbl


def pack_clusters(prims: Primitives) -> jnp.ndarray:
    """[K, 8] cluster AABB table: lo(3), hi(3), pad(2).

    Clusters are ``CLUSTER`` consecutive primitive rows; compile_scene
    orders rows by the BVH median-split permutation so consecutive rows
    are spatially tight.  Motion-blurred prims contribute the union of
    their t=0 and t=1 boxes (reference ``moving`` bbox, Geometry.hs:452).
    """
    kind = prims.kind
    p0, e1, e2 = prims.p0, prims.e1, prims.e2
    is_sphere = (kind == PRIM_SPHERE)[:, None]
    r = jnp.abs(e1[:, 0:1])
    slo = p0 - r
    shi = p0 + r
    # planar prims: hull of q, q+u, q+v, q+u+v (+ pad like Geometry.hs:143)
    c0 = p0
    c1 = p0 + e1
    c2 = p0 + e2
    c3 = p0 + e1 + e2
    plo = jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3)) - 1e-4
    phi = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3)) + 1e-4
    lo = jnp.where(is_sphere, slo, plo)
    hi = jnp.where(is_sphere, shi, phi)
    if prims.has_box:
        is_box = (kind == PRIM_BOX)[:, None]
        lo = jnp.where(is_box, p0, lo)
        hi = jnp.where(is_box, e1, hi)
    if prims.has_motion:
        lo = jnp.minimum(lo + prims.mv0, lo + prims.mv1)
        hi = jnp.maximum(hi + prims.mv0, hi + prims.mv1)
    pad = (kind == -1)[:, None]
    lo = jnp.where(pad, jnp.inf, lo)
    hi = jnp.where(pad, -jnp.inf, hi)

    n = kind.shape[0]
    k = -(-n // CLUSTER)
    lo_p = jnp.full((k * CLUSTER, 3), jnp.inf, jnp.float32).at[:n].set(lo)
    hi_p = jnp.full((k * CLUSTER, 3), -jnp.inf, jnp.float32).at[:n].set(hi)
    clo = lo_p.reshape(k, CLUSTER, 3).min(axis=1)
    chi = hi_p.reshape(k, CLUSTER, 3).max(axis=1)
    tbl = jnp.zeros((k, 8), jnp.float32)
    tbl = tbl.at[:, 0:3].set(clo)
    tbl = tbl.at[:, 3:6].set(chi)
    return tbl


def pack_cluster_groups(ctbl):
    """[K, 8] cluster AABBs -> [ceil(K/GROUP), 8] group AABBs (the second
    consensus level: a group is GROUP consecutive clusters, spatially
    tight because clusters follow the BVH median-split row order)."""
    k = ctbl.shape[0]
    ng = -(-k // GROUP)
    lo = jnp.full((ng * GROUP, 3), jnp.inf, jnp.float32).at[:k].set(
        ctbl[:, 0:3])
    hi = jnp.full((ng * GROUP, 3), -jnp.inf, jnp.float32).at[:k].set(
        ctbl[:, 3:6])
    gtbl = jnp.zeros((ng, 8), jnp.float32)
    gtbl = gtbl.at[:, 0:3].set(lo.reshape(ng, GROUP, 3).min(axis=1))
    gtbl = gtbl.at[:, 3:6].set(hi.reshape(ng, GROUP, 3).max(axis=1))
    return gtbl


def prim_loop(tbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv, *, n_prims: int,
              t_min: float, has_motion: bool, ctbl_ref=None,
              with_albedo: bool = False, has_box: bool = False,
              segments=None, kinds=None, gtbl_ref=None):
    """Shared fused nearest-hit loop over the packed primitive table.

    Operates on value tiles (any shape); returns
    (t, idx_f, nx, ny, nz, front_f, u, v, mat_f, sphere_f) where the
    normal faces the ray, ``front_f``/``sphere_f`` are 0/1 floats and
    sphere uv is NOT yet computed (needs atan2; see callers).
    ``with_albedo`` appends the winner's per-prim material columns
    (ar, ag, ab, param — cols 31-34) to the returned tuple.

    With ``ctbl_ref`` (pack_clusters) and ``n_prims >=
    CLUSTER_MIN_PRIMS``, the loop is ADAPTIVE per program block: a cheap
    slab pre-pass counts how many 64-prim clusters the block's rays
    collectively touch; coherent blocks (tile-ordered primary/early
    bounces — see integrator._tile_maps) take the clustered two-phase
    loop that skips untouched clusters via block-consensus ``lax.cond``
    (~5x on mesh scenes), incoherent blocks fall back to the flat
    single-pass scan (the clustered loop is ~1.7x *slower* than flat
    when every cluster is visited: double table reads + per-cluster
    branch overhead).
    """
    if ctbl_ref is not None and n_prims >= CLUSTER_MIN_PRIMS:
        n_clusters = -(-n_prims // CLUSTER)

        def flat(_):
            if segments is not None:
                # Kind-segmented one-pass scan: same per-kind
                # specialization as the clustered loop, but no slab
                # tests, conds, or second (attribute) traversal — wins
                # when the block would visit most clusters anyway.
                return _prim_loop_flat_segmented(
                    tbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv,
                    n_prims=n_prims, t_min=t_min, has_motion=has_motion,
                    with_albedo=with_albedo, segments=segments)
            return _prim_loop_flat(
                tbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv,
                n_prims=n_prims, t_min=t_min, has_motion=has_motion,
                with_albedo=with_albedo, has_box=has_box, kinds=kinds)

        def clustered(_):
            return _prim_loop_clustered(
                tbl_ref, ctbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv,
                n_prims=n_prims, t_min=t_min, has_motion=has_motion,
                with_albedo=with_albedo, has_box=has_box,
                segments=segments, gtbl_ref=gtbl_ref)

        if FORCE_LOOP == "flat":
            return flat(0)
        if FORCE_LOOP == "clustered":
            return clustered(0)

        if segments is not None:
            # Kind-segmented table: every visited cluster runs a loop
            # specialized to its one kind, so even visit-everything
            # (incoherent) blocks beat the one-pass segmented flat scan
            # (measured on the demo2 table, tools/prof_demo2_intersect:
            # clustered 8.05 ms vs flat 9.40 ms per 90k incoherent
            # lanes; 3.41 vs 9.43 coherent) — no adaptive pre-pass.
            return clustered(0)

        # pre-pass: how many cluster AABBs does this block touch at all?
        safe = lambda d: jnp.where(jnp.abs(d) < 1e-20,
                                   jnp.where(d < 0, -1e-20, 1e-20), d)
        inv_dx = 1.0 / safe(dxv)
        inv_dy = 1.0 / safe(dyv)
        inv_dz = 1.0 / safe(dzv)

        def count_body(k, nv):
            lox, loy, loz = ctbl_ref[k, 0], ctbl_ref[k, 1], ctbl_ref[k, 2]
            hix, hiy, hiz = ctbl_ref[k, 3], ctbl_ref[k, 4], ctbl_ref[k, 5]
            tx0 = (lox - oxv) * inv_dx
            tx1 = (hix - oxv) * inv_dx
            ty0 = (loy - oyv) * inv_dy
            ty1 = (hiy - oyv) * inv_dy
            tz0 = (loz - ozv) * inv_dz
            tz1 = (hiz - ozv) * inv_dz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.maximum(jnp.minimum(tz0, tz1),
                                         jnp.float32(t_min)))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1))
            return nv + jnp.any(tn <= tf).astype(jnp.int32)

        n_visit = jax.lax.fori_loop(0, n_clusters, count_body,
                                    jnp.zeros((), jnp.int32))
        return jax.lax.cond(n_visit * 2 < n_clusters, clustered, flat, 0)
    return _prim_loop_flat(tbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv,
                           n_prims=n_prims, t_min=t_min,
                           has_motion=has_motion, with_albedo=with_albedo,
                           has_box=has_box, kinds=kinds)


def _box_attrs(lox, loy, loz, hix, hiy, hiz, hx, hy, hz, dxv, dyv, dzv):
    """Box hit-record attributes from the hit point: outward-face normal,
    front flag (float), and the per-face uv that reproduces the
    reference's six-parallelogram winding (Geometry.hs:154-166; the
    face->uv table is derived in ops/intersect.py make_hit_record_rows).
    All args are lane vectors (box params broadcast per prim)."""
    eps = jnp.float32(1e-12)
    szx = jnp.maximum(hix - lox, eps)
    szy = jnp.maximum(hiy - loy, eps)
    szz = jnp.maximum(hiz - loz, eps)
    relx = (hx - 0.5 * (lox + hix)) / szx
    rely = (hy - 0.5 * (loy + hiy)) / szy
    relz = (hz - 0.5 * (loz + hiz)) / szz
    ax, ay, az = jnp.abs(relx), jnp.abs(rely), jnp.abs(relz)
    on_x = (ax >= ay) & (ax >= az)
    on_y = ~on_x & (ay >= az)
    on_z = ~on_x & ~on_y
    sgnx = jnp.where(relx >= 0.0, 1.0, -1.0)
    sgny = jnp.where(rely >= 0.0, 1.0, -1.0)
    sgnz = jnp.where(relz >= 0.0, 1.0, -1.0)
    nx = jnp.where(on_x, sgnx, 0.0)
    ny = jnp.where(on_y, sgny, 0.0)
    nz = jnp.where(on_z, sgnz, 0.0)
    front = jnp.where(dxv * nx + dyv * ny + dzv * nz < 0.0, 1.0, 0.0)
    fx = (hx - lox) / szx
    fy = (hy - loy) / szy
    fz = (hz - loz) / szz
    pos_x = relx >= 0.0
    pos_y = rely >= 0.0
    pos_z = relz >= 0.0
    uu = jnp.where(
        on_z, jnp.where(pos_z, fx, 1.0 - fx),
        jnp.where(on_x, jnp.where(pos_x, 1.0 - fz, fz), fx))
    vv = jnp.where(on_y, jnp.where(pos_y, 1.0 - fz, fz), fy)
    return nx, ny, nz, front, uu, vv


def _prim_loop_flat(tbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv, *,
                    n_prims: int, t_min: float, has_motion: bool,
                    with_albedo: bool = False, has_box: bool = False,
                    kinds: tuple | None = None, row0: int = 0,
                    carry0=None, flip_normal: bool = True):
    """Single-pass dense scan (see :func:`prim_loop`).

    ``kinds`` (static) is the set of primitive kinds present in the
    table (scene/types.py Primitives.kinds_present); branches for absent
    kinds compile to nothing — a parallelogram-only scene (Cornell) runs
    no sphere code per prim and vice versa.  None compiles everything.

    ``row0``/``n_prims`` bound the scanned row range and ``carry0``
    seeds the running best (both static), so segmented callers
    (:func:`_prim_loop_flat_segmented`) can chain one specialized scan
    per kind segment; ``flip_normal=False`` defers the front-side flip
    to the last segment.
    """
    shp = oxv.shape
    want_sphere = kinds is None or PRIM_SPHERE in kinds
    want_plane = kinds is None or (PRIM_PARALLELOGRAM in kinds
                                   or PRIM_TRIANGLE in kinds)
    want_tri = kinds is None or PRIM_TRIANGLE in kinds
    if has_box:
        safe = lambda dd: jnp.where(jnp.abs(dd) < 1e-20,
                                    jnp.where(dd < 0, -1e-20, 1e-20), dd)
        inv_dx = 1.0 / safe(dxv)
        inv_dy = 1.0 / safe(dyv)
        inv_dz = 1.0 / safe(dzv)

    inf = jnp.float32(jnp.inf)
    if carry0 is not None:
        init = carry0
    else:
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
            jnp.ones(shp, jnp.float32),               # is_sphere (post uv)
        )
        if with_albedo:
            init = init + (jnp.zeros(shp, jnp.float32),) * 4  # ar ag ab prm

    def body(ci, carry):
        (bt, bi, cnx, cny, cnz, cfr, cu, cv, cm, csp) = carry[:10]
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

        if want_sphere:
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
            t_s = jnp.where(r1 > t_min, r1,
                            jnp.where(rr2 > t_min, rr2, inf))
            t_s = jnp.where(ok_s & is_sphere, t_s, inf)

        if want_plane:
            # ---- plane branch (Geometry.hs:117-142) ----
            nxs = tbl_ref[ci, 4]
            nys = tbl_ref[ci, 5]
            nzs = tbl_ref[ci, 6]
            den = dxv * nxs + dyv * nys + dzv * nzs
            den_ok = jnp.abs(den) > 1e-8
            den_safe = jnp.where(den_ok, den, 1.0)
            on = oxv * nxs + oyv * nys + ozv * nzs
            qn = tbl_ref[ci, 13]
            qwa = tbl_ref[ci, 14]
            qwb = tbl_ref[ci, 15]
            wax, way, waz = tbl_ref[ci, 7], tbl_ref[ci, 8], tbl_ref[ci, 9]
            wbx, wby, wbz = (tbl_ref[ci, 10], tbl_ref[ci, 11],
                             tbl_ref[ci, 12])
            if has_motion:
                # the plane's corner q moves with the prim (Geometry.hs:452)
                qn = qn + sx * nxs + sy * nys + sz * nzs
                qwa = qwa + sx * wax + sy * way + sz * waz
                qwb = qwb + sx * wbx + sy * wby + sz * wbz
            t_p = (qn - on) / den_safe
            owa = oxv * wax + oyv * way + ozv * waz
            dwa = dxv * wax + dyv * way + dzv * waz
            owb = oxv * wbx + oyv * wby + ozv * wbz
            dwb = dxv * wbx + dyv * wby + dzv * wbz
            a = owa - qwa + t_p * dwa
            b = owb - qwb + t_p * dwb
            is_tri = kind == 2.0
            # Mosaic cannot select i1 vectors: fold the tri/para
            # membership difference into a float bound
            # (tri: a+b<=1; para: max(a,b)<=1)
            if want_tri:
                bound = jnp.where(is_tri, a + b, jnp.maximum(a, b))
            else:
                bound = jnp.maximum(a, b)
            memb = (a >= 0.0) & (b >= 0.0) & (bound <= 1.0)
            ok_p = den_ok & memb & (t_p > t_min)
            # the kind mask keeps pad rows (and absent-branch kinds) out
            t_pv = jnp.where(ok_p & (kind > 0.5) & (kind < 2.5), t_p, inf)

        if want_sphere and want_plane:
            cand = jnp.minimum(t_s, t_pv)
        elif want_sphere:
            cand = t_s
        elif want_plane:
            cand = t_pv
        else:
            cand = jnp.full(shp, inf, jnp.float32)
        if has_box:
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
            t_b = jnp.where(btn > t_min, btn,
                            jnp.where(btf > t_min, btf, inf))
            t_b = jnp.where(btn <= btf, t_b, inf)
            cand = jnp.where(is_boxk, t_b, cand)
        better = cand < bt

        # record attributes of the candidate
        if want_sphere:
            # sphere: outward normal (from the point), front = t <= h
            inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30)) * jnp.sign(
                tbl_ref[ci, 30])
            sox = (oxv + cand * dxv - px) * inv_r
            soy = (oyv + cand * dyv - py) * inv_r
            soz = (ozv + cand * dzv - pz) * inv_r
            # front flags as floats (i1-vector selects don't legalize)
            s_front = jnp.where(cand <= h, 1.0, 0.0)
        if want_plane:
            # plane: normal = n (flip later by front), front = den < 0
            p_front = jnp.where(den < 0.0, 1.0, 0.0)
            if want_tri:
                # triangle uv interpolation / parallelogram (a, b)
                u0, v0 = tbl_ref[ci, 18], tbl_ref[ci, 19]
                u1, v1 = tbl_ref[ci, 20], tbl_ref[ci, 21]
                u2, v2 = tbl_ref[ci, 22], tbl_ref[ci, 23]
                w0 = 1.0 - a - b
                uu = jnp.where(is_tri, w0 * u0 + a * u1 + b * u2, a)
                vv = jnp.where(is_tri, w0 * v0 + a * v1 + b * v2, b)
            else:
                uu, vv = a, b
        else:
            uu = jnp.zeros(shp, jnp.float32)
            vv = jnp.zeros(shp, jnp.float32)

        if want_sphere and want_plane:
            nx_c = jnp.where(is_sphere, sox, nxs)
            ny_c = jnp.where(is_sphere, soy, nys)
            nz_c = jnp.where(is_sphere, soz, nzs)
            fr_c = jnp.where(is_sphere, s_front, p_front)
        elif want_sphere:
            nx_c, ny_c, nz_c, fr_c = sox, soy, soz, s_front
        elif want_plane:
            nx_c, ny_c, nz_c, fr_c = nxs, nys, nzs, p_front
        else:
            nx_c = jnp.zeros(shp, jnp.float32)
            ny_c = jnp.zeros(shp, jnp.float32)
            nz_c = jnp.ones(shp, jnp.float32)
            fr_c = jnp.ones(shp, jnp.float32)
        if has_box:
            t_hit = jnp.where(cand < inf, cand, 1.0)
            b_nx, b_ny, b_nz, b_fr, b_uu, b_vv = _box_attrs(
                px, py, pz, hix, hiy, hiz,
                oxv + t_hit * dxv, oyv + t_hit * dyv, ozv + t_hit * dzv,
                dxv, dyv, dzv)
            nx_c = jnp.where(is_boxk, b_nx, nx_c)
            ny_c = jnp.where(is_boxk, b_ny, ny_c)
            nz_c = jnp.where(is_boxk, b_nz, nz_c)
            fr_c = jnp.where(is_boxk, b_fr, fr_c)
            uu = jnp.where(is_boxk, b_uu, uu)
            vv = jnp.where(is_boxk, b_vv, vv)

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
        out = (bt, bi, cnx, cny, cnz, cfr, cu, cv, cm, csp)
        if with_albedo:
            out = out + tuple(
                jnp.where(better, tbl_ref[ci, 31 + k], carry[10 + k])
                for k in range(4))
        return out

    res = jax.lax.fori_loop(row0, n_prims, body, init)
    if not flip_normal:
        return res
    (bt, bi, cnx, cny, cnz, cfr, cu, cv, cm, csp) = res[:10]

    # flip the normal toward the ray
    flip = jnp.where(cfr > 0.5, 1.0, -1.0)
    return (bt, bi, cnx * flip, cny * flip, cnz * flip, cfr, cu, cv, cm,
            csp) + res[10:]


_SEG_KINDS = {
    PRIM_SPHERE: (PRIM_SPHERE,),
    PRIM_PARALLELOGRAM: (PRIM_PARALLELOGRAM, PRIM_TRIANGLE),
    PRIM_BOX: (PRIM_BOX,),
}


def _prim_loop_flat_segmented(tbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv,
                              *, n_prims: int, t_min: float,
                              has_motion: bool, with_albedo: bool = False,
                              segments=None):
    """Kind-segmented single-pass scan: one :func:`_prim_loop_flat` range
    per kind segment (compile_scene's kind-major row order), each
    compiling only its kind's math, chained through one running-best
    carry.  For incoherent blocks that would visit every cluster anyway
    this does the same math as the two-phase clustered loop but in ONE
    pass — no slab pre-tests, no per-cluster ``lax.cond`` overhead, and
    no second attribute-reconstruction traversal."""
    carry = None
    first = True
    for gkind, k0, k1 in segments:
        row0 = k0 * CLUSTER
        row1 = min(k1 * CLUSTER, n_prims)
        carry = _prim_loop_flat(
            tbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv,
            n_prims=row1, t_min=t_min, has_motion=has_motion,
            with_albedo=with_albedo, has_box=(gkind == PRIM_BOX),
            kinds=_SEG_KINDS[gkind], row0=row0,
            carry0=None if first else carry, flip_normal=False)
        first = False
    (bt, bi, cnx, cny, cnz, cfr, cu, cv, cm, csp) = carry[:10]
    flip = jnp.where(cfr > 0.5, 1.0, -1.0)
    return (bt, bi, cnx * flip, cny * flip, cnz * flip, cfr, cu, cv, cm,
            csp) + carry[10:]


def _make_prim_math(tbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv, *,
                    t_min: float, has_motion: bool, has_box: bool):
    """Shared per-primitive candidate/attribute math over a packed table.

    Returns ``(cand_t, attrs_of, inv_d)`` closures used by the
    clustered consensus loop and the visit-list loop:

    * ``cand_t(ci, mode)`` — candidate hit t of every lane vs prim
      ``ci`` (no attributes); ``mode`` statically selects which kind's
      math is compiled.
    * ``attrs_of(ci, mode, hx, hy, hz)`` — (normal, front, uv,
      is_sphere) of prim ``ci`` at the lanes' hit points.
    * ``inv_d`` — safe reciprocal direction components (for slab tests).
    """
    inf = jnp.float32(jnp.inf)
    shp = oxv.shape

    safe = lambda d: jnp.where(jnp.abs(d) < 1e-20,
                               jnp.where(d < 0, -1e-20, 1e-20), d)
    inv_dx = 1.0 / safe(dxv)
    inv_dy = 1.0 / safe(dyv)
    inv_dz = 1.0 / safe(dzv)

    def motion_shift(ci):
        sx = tbl_ref[ci, 24] + tmv * tbl_ref[ci, 27]
        sy = tbl_ref[ci, 25] + tmv * tbl_ref[ci, 28]
        sz = tbl_ref[ci, 26] + tmv * tbl_ref[ci, 29]
        return sx, sy, sz

    def cand_sphere(ci, px, py, pz, kind):
        r2 = tbl_ref[ci, 3]
        ocx = px - oxv
        ocy = py - oyv
        ocz = pz - ozv
        h = dxv * ocx + dyv * ocy + dzv * ocz
        disc = h * h - (ocx * ocx + ocy * ocy + ocz * ocz - r2)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = h - sq
        rr2 = h + sq
        t_s = jnp.where(r1 > t_min, r1, jnp.where(rr2 > t_min, rr2, inf))
        # kind mask keeps pad rows (and, in generic mode, other kinds) out
        return jnp.where((disc >= 0.0) & (kind == 0.0), t_s, inf)

    def cand_plane(ci, px, py, pz, kind, sxyz):
        nxs, nys, nzs = tbl_ref[ci, 4], tbl_ref[ci, 5], tbl_ref[ci, 6]
        wax, way, waz = tbl_ref[ci, 7], tbl_ref[ci, 8], tbl_ref[ci, 9]
        wbx, wby, wbz = tbl_ref[ci, 10], tbl_ref[ci, 11], tbl_ref[ci, 12]
        qn = tbl_ref[ci, 13]
        qwa = tbl_ref[ci, 14]
        qwb = tbl_ref[ci, 15]
        if has_motion:
            sx, sy, sz = sxyz
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
        ok = den_ok & memb & (t_p > t_min) & (kind > 0.5) & (kind < 2.5)
        return jnp.where(ok, t_p, inf)

    def cand_box(ci, px, py, pz, kind, sxyz):
        hix = tbl_ref[ci, 7]
        hiy = tbl_ref[ci, 8]
        hiz = tbl_ref[ci, 9]
        if has_motion:
            sx, sy, sz = sxyz
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
        t_b = jnp.where(btn > t_min, btn,
                        jnp.where(btf > t_min, btf, inf))
        return jnp.where((btn <= btf) & (kind == 3.0), t_b, inf)

    def cand_t(ci, mode):
        """Candidate hit t of every lane vs prim ci (no attributes);
        ``mode`` statically selects which kind's math is compiled."""
        px = tbl_ref[ci, 0]
        py = tbl_ref[ci, 1]
        pz = tbl_ref[ci, 2]
        sxyz = None
        if has_motion:
            sxyz = motion_shift(ci)
            px = px + sxyz[0]
            py = py + sxyz[1]
            pz = pz + sxyz[2]
        kind = tbl_ref[ci, 16]
        if mode == PRIM_SPHERE:
            return cand_sphere(ci, px, py, pz, kind)
        if mode == PRIM_PARALLELOGRAM:       # planar: para + tri
            return cand_plane(ci, px, py, pz, kind, sxyz)
        if mode == PRIM_BOX:
            return cand_box(ci, px, py, pz, kind, sxyz)
        cand = jnp.minimum(cand_sphere(ci, px, py, pz, kind),
                           cand_plane(ci, px, py, pz, kind, sxyz))
        if has_box:
            cand = jnp.minimum(cand, cand_box(ci, px, py, pz, kind, sxyz))
        return cand

    def attrs_of(ci, mode, hx, hy, hz):
        """(normal, front, uv, is_sphere) of prim ci at the lane's hit
        point (hx, hy, hz); ``mode`` statically prunes other kinds."""
        kind = tbl_ref[ci, 16]
        px = tbl_ref[ci, 0]
        py = tbl_ref[ci, 1]
        pz = tbl_ref[ci, 2]
        if has_motion:
            sx, sy, sz = motion_shift(ci)
            px = px + sx
            py = py + sy
            pz = pz + sz

        def sphere_attrs():
            inv_r = jax.lax.rsqrt(
                jnp.maximum(tbl_ref[ci, 3], 1e-30)) * jnp.sign(
                    tbl_ref[ci, 30])
            sox = (hx - px) * inv_r
            soy = (hy - py) * inv_r
            soz = (hz - pz) * inv_r
            s_front = jnp.where(
                dxv * sox + dyv * soy + dzv * soz <= 0.0, 1.0, 0.0)
            # sphere uv is reconstructed by the caller from the outward
            # normal (atan2 has no cheap lowering here): uv = (0, 0)
            zero = jnp.zeros(shp, jnp.float32)
            return sox, soy, soz, s_front, zero, zero

        def plane_attrs():
            is_tri = kind == 2.0
            nxs, nys, nzs = tbl_ref[ci, 4], tbl_ref[ci, 5], tbl_ref[ci, 6]
            den = dxv * nxs + dyv * nys + dzv * nzs
            p_front = jnp.where(den < 0.0, 1.0, 0.0)
            wax, way, waz = tbl_ref[ci, 7], tbl_ref[ci, 8], tbl_ref[ci, 9]
            wbx, wby, wbz = (tbl_ref[ci, 10], tbl_ref[ci, 11],
                             tbl_ref[ci, 12])
            a = (hx * wax + hy * way + hz * waz) - tbl_ref[ci, 14]
            b = (hx * wbx + hy * wby + hz * wbz) - tbl_ref[ci, 15]
            if has_motion:
                # w-dots of the motion shift (q moved with the prim)
                sx = px - tbl_ref[ci, 0]
                sy = py - tbl_ref[ci, 1]
                sz = pz - tbl_ref[ci, 2]
                a = a - (sx * wax + sy * way + sz * waz)
                b = b - (sx * wbx + sy * wby + sz * wbz)
            u0, v0 = tbl_ref[ci, 18], tbl_ref[ci, 19]
            u1, v1 = tbl_ref[ci, 20], tbl_ref[ci, 21]
            u2, v2 = tbl_ref[ci, 22], tbl_ref[ci, 23]
            w0 = 1.0 - a - b
            uu = jnp.where(is_tri, w0 * u0 + a * u1 + b * u2, a)
            vv = jnp.where(is_tri, w0 * v0 + a * v1 + b * v2, b)
            return nxs, nys, nzs, p_front, uu, vv

        def box_attrs():
            hix = tbl_ref[ci, 7]
            hiy = tbl_ref[ci, 8]
            hiz = tbl_ref[ci, 9]
            if has_motion:
                hix = hix + (px - tbl_ref[ci, 0])
                hiy = hiy + (py - tbl_ref[ci, 1])
                hiz = hiz + (pz - tbl_ref[ci, 2])
            return _box_attrs(px, py, pz, hix, hiy, hiz, hx, hy, hz,
                              dxv, dyv, dzv)

        if mode == PRIM_SPHERE:
            n_x, n_y, n_z, fr, uu, vv = sphere_attrs()
            return n_x, n_y, n_z, fr, uu, vv, jnp.ones(shp, jnp.float32)
        if mode == PRIM_PARALLELOGRAM:
            n_x, n_y, n_z, fr, uu, vv = plane_attrs()
            return n_x, n_y, n_z, fr, uu, vv, jnp.zeros(shp, jnp.float32)
        if mode == PRIM_BOX:
            n_x, n_y, n_z, fr, uu, vv = box_attrs()
            return n_x, n_y, n_z, fr, uu, vv, jnp.zeros(shp, jnp.float32)
        is_sphere = kind == 0.0
        sx_, sy_, sz_, sfr, _, _ = sphere_attrs()
        pxn, pyn, pzn, pfr, uu, vv = plane_attrs()
        n_x = jnp.where(is_sphere, sx_, pxn)
        n_y = jnp.where(is_sphere, sy_, pyn)
        n_z = jnp.where(is_sphere, sz_, pzn)
        fr = jnp.where(is_sphere, sfr, pfr)
        if has_box:
            is_boxk = kind == 3.0
            b_nx, b_ny, b_nz, b_fr, b_uu, b_vv = box_attrs()
            n_x = jnp.where(is_boxk, b_nx, n_x)
            n_y = jnp.where(is_boxk, b_ny, n_y)
            n_z = jnp.where(is_boxk, b_nz, n_z)
            fr = jnp.where(is_boxk, b_fr, fr)
            uu = jnp.where(is_boxk, b_uu, uu)
            vv = jnp.where(is_boxk, b_vv, vv)
        sph_f = jnp.where(is_sphere, 1.0, 0.0)
        return n_x, n_y, n_z, fr, uu, vv, sph_f

    return cand_t, attrs_of, (inv_dx, inv_dy, inv_dz)


def _prim_loop_clustered(tbl_ref, ctbl_ref, oxv, oyv, ozv, dxv, dyv, dzv,
                         tmv, *, n_prims: int, t_min: float,
                         has_motion: bool, with_albedo: bool = False,
                         has_box: bool = False, segments=None,
                         gtbl_ref=None):
    """Two-phase clustered nearest hit (mesh-scale scenes).

    Phase 1 finds the winning (t, prim) with a candidate-t-only inner
    loop, visiting a 64-prim cluster only when at least one lane in the
    block hits its AABB closer than its current best (``lax.cond``
    consensus — the TPU answer to divergent BVH traversal: hierarchy at
    block granularity, pure SIMD inside).  Phase 2 revisits only clusters
    that own some lane's winner and reconstructs the hit record.  Same
    return contract as :func:`prim_loop`.

    ``segments`` (static) is compile_scene's kind segmentation: a tuple
    of ``(kind:int, cluster_start, cluster_end)`` with primitive rows
    reordered so every cluster holds ONE kind.  Each segment then runs a
    loop specialized to its kind — sphere clusters compile no plane/box
    code and vice versa (~2-3x less VPU work per visited cluster than the
    generic loop; see docs/COMPONENTS.md BVH-traversal note).  ``None``
    falls back to one generic segment.
    """
    inf = jnp.float32(jnp.inf)
    n_clusters = -(-n_prims // CLUSTER)
    shp = oxv.shape
    if segments is None:
        segments = ((None, 0, n_clusters),)

    cand_t, attrs_of, (inv_dx, inv_dy, inv_dz) = _make_prim_math(
        tbl_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmv, t_min=t_min,
        has_motion=has_motion, has_box=has_box)

    def slab_hit(k, bt, box_ref=None):
        box_ref = ctbl_ref if box_ref is None else box_ref
        lox, loy, loz = box_ref[k, 0], box_ref[k, 1], box_ref[k, 2]
        hix, hiy, hiz = box_ref[k, 3], box_ref[k, 4], box_ref[k, 5]
        tx0 = (lox - oxv) * inv_dx
        tx1 = (hix - oxv) * inv_dx
        ty0 = (loy - oyv) * inv_dy
        ty1 = (hiy - oyv) * inv_dy
        tz0 = (loz - ozv) * inv_dz
        tz1 = (hiz - ozv) * inv_dz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.maximum(jnp.minimum(tz0, tz1),
                                     jnp.float32(t_min)))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                     jnp.maximum(ty0, ty1)),
                         jnp.minimum(jnp.maximum(tz0, tz1), bt))
        return tn <= tf

    # ---- phase 1: winning (t, prim index) ----
    def cluster1_for(mode):
        def cluster1(k, carry):
            bt, bi = carry
            hit = slab_hit(k, bt)

            def visit(c):
                bt, bi = c
                base = k * CLUSTER
                end = jnp.minimum(base + CLUSTER, n_prims)

                def prim(ci, c2):
                    bt, bi = c2
                    cand = cand_t(ci, mode)
                    better = cand < bt
                    return (jnp.where(better, cand, bt),
                            jnp.where(better, ci.astype(jnp.float32), bi))

                return jax.lax.fori_loop(base, end, prim, (bt, bi))

            return jax.lax.cond(jnp.any(hit), visit, lambda c: c, carry)
        return cluster1

    # Two-level consensus for mesh-scale tables: a group-AABB slab test
    # skips GROUP clusters (their slab tests AND conds) at once.  Grid
    # programs run sequentially, so per-cluster cond overhead (~0.4 us) is
    # paid per (cluster, program); at 50 k prims that is ~780 conds per
    # program in one level vs ~49 group conds + visited-group clusters.
    two_level = gtbl_ref is not None

    def group1_for(mode, k0, k1):
        cl1 = cluster1_for(mode)

        def group1(g, carry):
            ghit = slab_hit(g, carry[0], box_ref=gtbl_ref)

            def visit(c):
                ks = jnp.maximum(g * GROUP, k0)
                ke = jnp.minimum((g + 1) * GROUP, k1)
                return jax.lax.fori_loop(ks, ke, cl1, c)

            return jax.lax.cond(jnp.any(ghit), visit, lambda c: c, carry)
        return group1

    carry = (jnp.full(shp, inf, jnp.float32),
             jnp.full(shp, -1.0, jnp.float32))
    for mode, k0, k1 in segments:
        if two_level:
            carry = jax.lax.fori_loop(k0 // GROUP, -(-k1 // GROUP),
                                      group1_for(mode, k0, k1), carry)
        else:
            carry = jax.lax.fori_loop(k0, k1, cluster1_for(mode), carry)
    bt, bi = carry

    # ---- phase 2: hit record of the winner (winner clusters only) ----
    t_safe = jnp.where(bt < inf, bt, 1.0)
    hx = oxv + t_safe * dxv
    hy = oyv + t_safe * dyv
    hz = ozv + t_safe * dzv

    attrs0 = (
        jnp.zeros(shp, jnp.float32), jnp.zeros(shp, jnp.float32),
        jnp.ones(shp, jnp.float32),                    # normal
        jnp.zeros(shp, jnp.float32),                   # front
        jnp.zeros(shp, jnp.float32), jnp.zeros(shp, jnp.float32),  # uv
        jnp.zeros(shp, jnp.float32),                   # mat
        jnp.ones(shp, jnp.float32),                    # is_sphere
    )
    if with_albedo:
        attrs0 = attrs0 + (jnp.zeros(shp, jnp.float32),) * 4

    def cluster2_for(mode):
        def cluster2(k, attrs):
            base_f = (k * CLUSTER).astype(jnp.float32)
            in_cl = (bi >= base_f) & (bi < base_f + jnp.float32(CLUSTER))

            def visit(attrs):
                base = k * CLUSTER
                end = jnp.minimum(base + CLUSTER, n_prims)

                def prim(ci, attrs):
                    (cnx, cny, cnz, cfr, cu, cv, cm, csp) = attrs[:8]
                    sel = bi == ci.astype(jnp.float32)
                    n_x, n_y, n_z, fr, uu, vv, sph_f = attrs_of(
                        ci, mode, hx, hy, hz)
                    out = (
                        jnp.where(sel, n_x, cnx),
                        jnp.where(sel, n_y, cny),
                        jnp.where(sel, n_z, cnz),
                        jnp.where(sel, fr, cfr),
                        jnp.where(sel, uu, cu),
                        jnp.where(sel, vv, cv),
                        jnp.where(sel, tbl_ref[ci, 17], cm),
                        jnp.where(sel, sph_f, csp),
                    )
                    if with_albedo:
                        out = out + tuple(
                            jnp.where(sel, tbl_ref[ci, 31 + j], attrs[8 + j])
                            for j in range(4))
                    return out

                return jax.lax.fori_loop(base, end, prim, attrs)

            return jax.lax.cond(jnp.any(in_cl), visit, lambda a: a, attrs)
        return cluster2

    def group2_for(mode, k0, k1):
        cl2 = cluster2_for(mode)

        def group2(g, attrs):
            base_f = (g * (GROUP * CLUSTER)).astype(jnp.float32)
            in_g = (bi >= base_f) & (
                bi < base_f + jnp.float32(GROUP * CLUSTER))

            def visit(a):
                ks = jnp.maximum(g * GROUP, k0)
                ke = jnp.minimum((g + 1) * GROUP, k1)
                return jax.lax.fori_loop(ks, ke, cl2, a)

            return jax.lax.cond(jnp.any(in_g), visit, lambda a: a, attrs)
        return group2

    attrs = attrs0
    for mode, k0, k1 in segments:
        if two_level:
            attrs = jax.lax.fori_loop(k0 // GROUP, -(-k1 // GROUP),
                                      group2_for(mode, k0, k1), attrs)
        else:
            attrs = jax.lax.fori_loop(k0, k1, cluster2_for(mode), attrs)
    (cnx, cny, cnz, cfr, cu, cv, cm, csp) = attrs[:8]

    flip = jnp.where(cfr > 0.5, 1.0, -1.0)
    return (bt, bi, cnx * flip, cny * flip, cnz * flip, cfr, cu, cv, cm,
            csp) + attrs[8:]


def _kernel(tbl_ref, ctbl_ref, gtbl_ref, ox, oy, oz, dx, dy, dz, tm,
            t_out, i_out, nx_out, ny_out, nz_out, fr_out, u_out, v_out,
            m_out, *, n_prims: int, t_min: float, has_motion: bool,
            clustered: bool = True, has_box: bool = False, segments=None,
            kinds=None, two_level: bool = False):
    (bt, bi, nx, ny, nz, cfr, cu, cv, cm, csp) = prim_loop(
        tbl_ref, ox[...], oy[...], oz[...], dx[...], dy[...], dz[...],
        tm[...] if has_motion else None, n_prims=n_prims, t_min=t_min,
        has_motion=has_motion, ctbl_ref=ctbl_ref if clustered else None,
        has_box=has_box, segments=segments, kinds=kinds,
        gtbl_ref=gtbl_ref if two_level else None)
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
    static_argnames=("n_prims", "t_min", "has_motion", "has_box",
                     "segments", "kinds", "interpret"))
def pallas_nearest_record(tbl, ctbl, ox, oy, oz, dx, dy, dz, tm, *,
                          n_prims: int, t_min: float, has_motion: bool,
                          has_box: bool = False, segments=None,
                          kinds=None, interpret: bool = False):
    """Run the dense megakernel.  Ray components are [G, 128] arrays;
    ``ctbl`` is the pack_clusters table (used above CLUSTER_MIN_PRIMS),
    or None to force the flat loop (a dummy table is substituted).

    Returns (t, idx, nx, ny, nz, front, u, v, mat), all [G, 128].
    """
    g = ox.shape[0]
    clustered = ctbl is not None and n_prims >= CLUSTER_MIN_PRIMS
    if ctbl is None:
        ctbl = jnp.zeros((1, 8), jnp.float32)
    # two-level consensus above GROUP_MIN_CLUSTERS clusters: group AABBs
    # skip GROUP clusters' slab tests + conds at once (mesh-scale scenes)
    two_level = clustered and -(-n_prims // CLUSTER) >= GROUP_MIN_CLUSTERS
    gtbl = pack_cluster_groups(ctbl) if two_level \
        else jnp.zeros((1, 8), jnp.float32)
    bg = min(BLOCK_G_CLUSTERED if clustered else BLOCK_G, g)
    grid = (pl.cdiv(g, bg),)
    # with num_scalar_prefetch=2, index maps receive (grid_idx, *scalar_refs)
    ray_spec = pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((bg, LANES), lambda i, *_: (i, 0),
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
                               has_motion=has_motion, clustered=clustered,
                               has_box=has_box,
                               segments=segments if clustered else None,
                               kinds=kinds, two_level=two_level)
    if n_prims <= MAX_SMEM_PRIMS:
        # small scene: per-primitive scalars prefetched to SMEM
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[ray_spec] * 7,
            out_specs=out_specs,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(tbl, ctbl, gtbl, ox, oy, oz, dx, dy, dz, tm)

    # large scene (meshes): prim table lives whole in VMEM; the (much
    # smaller) cluster/group tables stay scalar-prefetched in SMEM
    def kernel_vmem(ctbl_ref, gtbl_ref, tbl_ref, *rest):
        kernel(tbl_ref, ctbl_ref, gtbl_ref, *rest)

    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[tbl_spec] + [ray_spec] * 7,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel_vmem,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ctbl, gtbl, tbl, ox, oy, oz, dx, dy, dz, tm)
