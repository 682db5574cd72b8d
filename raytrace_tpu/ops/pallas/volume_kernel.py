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


# ---------------------------------------------------------------------------
# Broadcast crossing kernel: prims on sublanes, rays on lanes.
#
# The scalar fori_loop above costs ~10 ms per 131k-lane iteration on
# pawn's 1200-tri mesh boundary (one [1] scalar row per loop step); this
# variant restructures the scan exactly like the all-pairs intersect
# kernel (allpairs_kernel.py): one iteration computes BOTH crossing
# roots of a whole [L, 1] prim chunk against a [1, W] ray row as
# [L, W] vector tiles, then reduces to the row's carried
# (first, front-of-first, strictly-second) triple.  Tie-breaking matches
# _merge exactly: earliest prim index wins the front flag, the enter
# root beats the exit root of the same prim, duplicate crossings
# (shared mesh edges) collapse via the strict > in the second-min.
# ---------------------------------------------------------------------------

import os as _os

# 256 (not 512): at chunk 512 the ~24 live [CHUNK, W] intermediates of
# _crossing_cand cap the row relabel at W=256 (14 MB VMEM budget);
# halving the chunk doubles the chunk count but unlocks W=512 — half
# the (row x chunk) cond/slab overhead AND tighter chunk AABBs, measured
# pawn volumes 7.0 -> 4.9 ms/iter at 131k lanes (tools/profile_pawn.py)
BCAST_CHUNK = int(_os.environ.get("RT_VOL_CHUNK", "256"))
BCAST_MIN_ROWS = 64     # below this the scalar loop's overhead is noise


def _crossing_cand(col, ox, oy, oz, dx, dy, dz, tm, inv, tmn,
                   has_motion: bool, has_box: bool):
    """[L, W] crossing candidates of one prim chunk: returns
    ``(c1, cf1, c2)`` — enter/plane root + its front flag, exit root."""
    inf = jnp.float32(INF)
    kindc = col(16)
    if has_motion:
        mvx, mvy, mvz = col(27), col(28), col(29)
        sx = col(24) + tm * mvx
        sy = col(25) + tm * mvy
        sz = col(26) + tm * mvz

    # sphere: both roots
    cx, cy, cz = col(0), col(1), col(2)
    if has_motion:
        cx, cy, cz = cx + sx, cy + sy, cz + sz
    ocx = cx - ox
    ocy = cy - oy
    ocz = cz - oz
    h = ocx * dx + ocy * dy + ocz * dz
    disc = h * h - (ocx * ocx + ocy * ocy + ocz * ocz - col(3))
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    ok_s = (disc >= 0.0) & (kindc == 0.0)
    s1 = h - sq
    s2 = h + sq

    # plane (parallelogram/triangle): single root + membership
    nx, ny, nz = col(4), col(5), col(6)
    wax, way, waz = col(7), col(8), col(9)
    wbx, wby, wbz = col(10), col(11), col(12)
    qn, qwa, qwb = col(13), col(14), col(15)
    if has_motion:
        qn = qn + sx * nx + sy * ny + sz * nz
        qwa = qwa + sx * wax + sy * way + sz * waz
        qwb = qwb + sx * wbx + sy * wby + sz * wbz
    den = nx * dx + ny * dy + nz * dz
    den_ok = jnp.abs(den) > 1e-8
    t_p = (qn - (nx * ox + ny * oy + nz * oz)) / jnp.where(den_ok, den, 1.0)
    a = (wax * ox + way * oy + waz * oz) - qwa \
        + t_p * (wax * dx + way * dy + waz * dz)
    b = (wbx * ox + wby * oy + wbz * oz) - qwb \
        + t_p * (wbx * dx + wby * dy + wbz * dz)
    is_tri = kindc == 2.0
    bound = jnp.where(is_tri, a + b, jnp.maximum(a, b))
    ok_p = (den_ok & (a >= 0.0) & (b >= 0.0) & (bound <= 1.0)
            & (kindc > 0.5) & (kindc < 2.5))

    c1 = jnp.where(kindc == 0.0,
                   jnp.where(ok_s & (s1 > tmn), s1, inf),
                   jnp.where(ok_p & (t_p > tmn), t_p, inf))
    cf1 = jnp.where(kindc == 0.0, 1.0, jnp.where(den < 0.0, 1.0, 0.0))
    c2 = jnp.where(ok_s & (s2 > tmn), s2, inf)

    if has_box:
        ivx, ivy, ivz = inv
        lox, loy, loz = col(0), col(1), col(2)
        hix, hiy, hiz = col(7), col(8), col(9)
        if has_motion:
            lox, loy, loz = lox + sx, loy + sy, loz + sz
            hix, hiy, hiz = hix + sx, hiy + sy, hiz + sz
        t0x = (lox - ox) * ivx
        t1x = (hix - ox) * ivx
        t0y = (loy - oy) * ivy
        t1y = (hiy - oy) * ivy
        t0z = (loz - oz) * ivz
        t1z = (hiz - oz) * ivz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        ok_b = (tn <= tf) & (kindc == 3.0)
        c1 = jnp.where(kindc == 3.0,
                       jnp.where(ok_b & (tn > tmn), tn, inf), c1)
        cf1 = jnp.where(kindc == 3.0, 1.0, cf1)
        c2 = jnp.where(kindc == 3.0,
                       jnp.where(ok_b & (tf > tmn), tf, inf), c2)
    return c1, cf1, c2


def _bcast_kernel(tbl_ref, cbox_ref, sbox_ref, ox_ref, oy_ref, oz_ref,
                  dx_ref, dy_ref, dz_ref, tm_ref, *outs, slices: tuple,
                  t_min: float, has_motion: bool, has_box: bool, rg: int,
                  w: int, subc: bool = False):
    inf = jnp.float32(INF)
    tmn = jnp.float32(t_min)

    # chunk plan per volume: sublane-aligned starts, masked to the slice
    plans = _chunk_plans(slices)
    subs = _sub_plans(slices) if subc else None

    def row(ref, g):
        return ref[pl.ds(g, 1), :]

    def row_body(g, _):
        ox, oy, oz = row(ox_ref, g), row(oy_ref, g), row(oz_ref, g)
        dx, dy, dz = row(dx_ref, g), row(dy_ref, g), row(dz_ref, g)
        tm = row(tm_ref, g) if has_motion else None
        safe = lambda dd: jnp.where(jnp.abs(dd) < 1e-20,
                                    jnp.where(dd < 0, -1e-20, 1e-20), dd)
        inv = (1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz))

        def box_test(box_ref, k, b2):
            t0x = (box_ref[k, 0] - ox) * inv[0]
            t1x = (box_ref[k, 3] - ox) * inv[0]
            t0y = (box_ref[k, 1] - oy) * inv[1]
            t1y = (box_ref[k, 4] - oy) * inv[1]
            t0z = (box_ref[k, 2] - oz) * inv[2]
            t1z = (box_ref[k, 5] - oz) * inv[2]
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), tmn))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), b2))
            return tn, tf

        for v, (start, count) in enumerate(slices):
            b1 = jnp.full((1, w), inf, jnp.float32)
            f1 = jnp.zeros((1, w), jnp.float32)
            b2 = jnp.full((1, w), inf, jnp.float32)
            for ci, (p0, ln) in enumerate(plans[v]):

                def visit(carry, p0=p0, ln=ln):
                    b1, f1, b2 = carry
                    col = lambda c: tbl_ref[pl.ds(p0, ln), pl.ds(c, 1)]
                    c1, cf1, c2 = _crossing_cand(
                        col, ox, oy, oz, dx, dy, dz, tm,
                        inv if has_box else None, tmn, has_motion,
                        has_box)
                    piota = (jnp.float32(p0) + jax.lax.broadcasted_iota(
                        jnp.int32, (ln, 1), 0).astype(jnp.float32))
                    in_sl = (piota >= jnp.float32(start)) \
                        & (piota < jnp.float32(start + count))
                    c1 = jnp.where(in_sl, c1, inf)
                    c2 = jnp.where(in_sl, c2, inf)
                    # tile first/front/second with _merge's tie rules:
                    # earliest prim wins the front flag; the enter root
                    # beats the exit root of the same prim
                    t1t = jnp.minimum(jnp.min(c1, axis=0, keepdims=True),
                                      jnp.min(c2, axis=0, keepdims=True))
                    p1 = jnp.min(jnp.where(c1 == t1t, piota, inf), axis=0,
                                 keepdims=True)
                    p2 = jnp.min(jnp.where(c2 == t1t, piota, inf), axis=0,
                                 keepdims=True)
                    fc1 = jnp.max(
                        jnp.where((c1 == t1t) & (piota == p1), cf1, 0.0),
                        axis=0, keepdims=True)
                    f1t = jnp.where(p1 <= p2, fc1, 0.0)
                    gt1 = jnp.where(c1 > t1t, c1, inf)
                    gt2 = jnp.where(c2 > t1t, c2, inf)
                    t2t = jnp.minimum(jnp.min(gt1, axis=0, keepdims=True),
                                      jnp.min(gt2, axis=0, keepdims=True))
                    # merge into the carried triple (strict <: earlier
                    # chunk keeps ties, exactly like _merge)
                    nb1 = jnp.minimum(b1, t1t)
                    take = t1t < b1
                    f1 = jnp.where(take, f1t, f1)
                    gtv = lambda x: jnp.where(x > nb1, x, inf)
                    b2 = jnp.minimum(jnp.minimum(gtv(b1), gtv(b2)),
                                     jnp.minimum(gtv(t1t), gtv(t2t)))
                    return nb1, f1, b2

                # chunk-AABB consensus: a chunk whose slab entry lies
                # beyond every lane's current second crossing (or whose
                # exit is before t_min) cannot change the triple —
                # lax.cond genuinely skips it (CLAUDE.md).  Rays outside
                # the volume skip the whole sweep; rays inside skip the
                # chunks behind them and beyond their two crossings.
                if subc and ln > VOL_SUB and ln % VOL_SUB == 0:
                    # second level: 64-row sub-pieces with their own
                    # (tighter) AABB conds — a ray through a mesh
                    # boundary only crosses triangles near its path, so
                    # a visited chunk rarely needs all its sub-sweeps
                    def visit_subs(carry, ci=ci, p0=p0, ln=ln):
                        sbase = _sub_base(subs, plans, v, ci)
                        for si in range(ln // VOL_SUB):
                            tn_s, tf_s = box_test(sbox_ref, sbase + si,
                                                  carry[2])
                            carry = jax.lax.cond(
                                jnp.any(tn_s <= tf_s),
                                lambda c, si=si: visit(
                                    c, p0=p0 + si * VOL_SUB, ln=VOL_SUB),
                                lambda c: c, carry)
                        return carry

                    body = visit_subs
                else:
                    body = visit
                tn, tf = box_test(cbox_ref, ci + _plan_base(plans, v), b2)
                b1, f1, b2 = jax.lax.cond(
                    jnp.any(tn <= tf), body, lambda c: c, (b1, f1, b2))
            gsl = (pl.ds(g, 1), slice(None))
            outs[3 * v][gsl] = b1
            outs[3 * v + 1][gsl] = f1
            outs[3 * v + 2][gsl] = b2
        return 0

    jax.lax.fori_loop(0, rg, row_body, 0)


def _chunk_plans(slices):
    """Per-volume (start, len) chunk plan: sublane-aligned BCAST_CHUNK
    pieces covering each slice (shared by kernel and AABB packing)."""
    plans = []
    for start, count in slices:
        chunks = []
        p = (start // 8) * 8
        end = start + count
        while p < end:
            ln = min(BCAST_CHUNK, -(-(end - p) // 8) * 8)
            chunks.append((p, ln))
            p += ln
        plans.append(tuple(chunks))
    return tuple(plans)


def _plan_base(plans, v: int) -> int:
    return sum(len(p) for p in plans[:v])


VOL_SUB = 64   # second consensus level: rows per sub-piece AABB


def _sub_plans(slices):
    """Per-(volume, chunk) tuple of (start, VOL_SUB) sub-pieces; chunks
    too small (or unaligned) contribute none."""
    out = []
    for plan in _chunk_plans(slices):
        subs = []
        for p0, ln in plan:
            if ln > VOL_SUB and ln % VOL_SUB == 0:
                subs.append(tuple((p0 + si * VOL_SUB, VOL_SUB)
                                  for si in range(ln // VOL_SUB)))
            else:
                subs.append(())
        out.append(tuple(subs))
    return tuple(out)


def _sub_base(subs, plans, v: int, ci: int) -> int:
    base = sum(len(s) for vv in range(v) for s in subs[vv])
    return base + sum(len(s) for s in subs[v][:ci])


def _prim_lo_hi(prims):
    """Per-prim AABBs (pack_clusters' box math, intersect_kernel.py:
    119-162); pad rows get inverted boxes that never pass a slab."""
    from ...scene.types import PRIM_BOX, PRIM_SPHERE
    kind = prims.kind
    p0, e1, e2 = prims.p0, prims.e1, prims.e2
    is_sphere = (kind == PRIM_SPHERE)[:, None]
    r = jnp.abs(e1[:, 0:1])
    slo = p0 - r
    shi = p0 + r
    c0, c1 = p0, p0 + e1
    c2, c3 = p0 + e2, p0 + e1 + e2
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
    return lo, hi


def _reduce_boxes(prims, slices, pieces):
    lo, hi = _prim_lo_hi(prims)
    n = prims.kind.shape[0]
    rows = []
    for v, plan in enumerate(pieces):
        start, count = slices[v]
        for p, ln in plan:
            a = max(p, start)
            b = min(p + ln, start + count, n)
            if b <= a:
                rows.append(jnp.concatenate([
                    jnp.full((3,), jnp.inf, jnp.float32),
                    jnp.full((3,), -jnp.inf, jnp.float32),
                    jnp.zeros((2,), jnp.float32)]))
                continue
            rows.append(jnp.concatenate([
                jnp.min(lo[a:b], axis=0), jnp.max(hi[a:b], axis=0),
                jnp.zeros((2,), jnp.float32)]))
    return jnp.stack(rows)


def pack_chunk_boxes(prims, slices):
    """[n_chunks, 8] chunk AABBs aligned with :func:`_chunk_plans` —
    per-prim boxes reduced over each BCAST_CHUNK piece."""
    return _reduce_boxes(prims, slices, _chunk_plans(slices))


def pack_sub_boxes(prims, slices):
    """[n_subs, 8] VOL_SUB-granularity AABBs aligned with
    :func:`_sub_plans` (the kernel's second consensus level); None when
    no chunk is big enough to split."""
    subs = _sub_plans(slices)
    pieces = tuple(tuple(s for chunk in plan for s in chunk)
                   for plan in subs)
    if not any(pieces):
        return None
    return _reduce_boxes(prims, slices, pieces)


@functools.partial(
    jax.jit,
    static_argnames=("slices", "t_min", "has_motion", "has_box",
                     "interpret"))
def pallas_volume_crossings_bcast(vtbl, cbox, ox, oy, oz, dx, dy, dz,
                                  tm, *, slices: tuple, t_min: float,
                                  has_motion: bool, has_box: bool = False,
                                  sbox=None, interpret: bool = False):
    """Broadcast variant of :func:`pallas_volume_crossings` (same
    contract).  Rays regroup into [g, W] rows (W up to 512) so each
    chunk sweep amortizes over more lanes, exactly like
    allpairs_nearest_record.  ``cbox`` (pack_chunk_boxes) drives the
    per-(row, chunk) slab consensus: rays outside a chunk's AABB — or
    whose two crossings already bound it out — skip its whole sweep.
    ``sbox`` (pack_sub_boxes) adds a second 64-row consensus level
    inside visited chunks."""
    import os as _os2
    g = ox.shape[0]
    subc = sbox is not None and not _os2.environ.get("RT_NO_VOL_SUBC")
    if sbox is None:
        sbox = jnp.zeros((1, 8), jnp.float32)
    # pad the table to a sublane multiple; pad rows kind=-1 never match
    rows = vtbl.shape[0]
    rows_pad = -(-rows // 8) * 8
    if rows_pad != rows:
        pad = jnp.zeros((rows_pad - rows, vtbl.shape[1]),
                        jnp.float32).at[:, 16].set(-1.0)
        vtbl = jnp.concatenate([vtbl, pad])

    # ~24 live [CHUNK, W] f32 intermediates peak in _crossing_cand
    # (sphere + plane + box candidate math + reductions); measured OOM at
    # the 12-buffer estimate (20.3 MB scoped vs the 16 MB limit at W=512)
    w_cap = 512
    tbl_vmem = vtbl.shape[0] * vtbl.shape[1] * 4
    while w_cap > LANES and (tbl_vmem
                             + BCAST_CHUNK * w_cap * 4 * 24) > 14_000_000:
        w_cap //= 2
    # pad the row count to the relabel multiple (an odd G pins W at 128
    # — the pawn e2e shape, 2813 rows; see allpairs_kernel.py): pad
    # rays park far away pointing +x and their outputs are sliced off
    g_orig = g
    pad_rows = (-g) % (w_cap // LANES)
    if pad_rows:
        def _pad(a, fill):
            return jnp.concatenate(
                [a, jnp.full((pad_rows, LANES), fill, a.dtype)])
        ox, oy, oz = _pad(ox, 3e18), _pad(oy, 3e18), _pad(oz, 3e18)
        dx, dy, dz = _pad(dx, 1.0), _pad(dy, 0.0), _pad(dz, 0.0)
        tm = _pad(tm, 0.0)
        g += pad_rows
    w = LANES
    while w < w_cap and g % 2 == 0 and g >= 2:
        w *= 2
        g //= 2
    resh = lambda x: x.reshape(g, w)
    ox, oy, oz = resh(ox), resh(oy), resh(oz)
    dx, dy, dz, tm = resh(dx), resh(dy), resh(dz), resh(tm)
    rg = min(max(BLOCK_G * LANES // w, 8), g)
    grid = (pl.cdiv(g, rg),)
    n_out = 3 * len(slices)
    ray_spec = pl.BlockSpec((rg, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((rg, w), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * n_out
    out_shape = [jax.ShapeDtypeStruct((g, w), jnp.float32)] * n_out
    kernel = functools.partial(_bcast_kernel, slices=slices, t_min=t_min,
                               has_motion=has_motion, has_box=has_box,
                               rg=rg, w=w, subc=subc)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [ray_spec] * 7,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(vtbl, cbox, sbox, ox, oy, oz, dx, dy, dz, tm)
    return [o.reshape(-1, LANES)[:g_orig] for o in outs]


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
