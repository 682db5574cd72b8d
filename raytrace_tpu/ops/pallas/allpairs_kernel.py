"""All-pairs broadcast intersect kernel: prims on sublanes, rays on lanes.

The flat/clustered loops in intersect_kernel.py iterate one primitive per
``fori_loop`` step; at mesh scale the per-iteration overhead (scalar
loads + loop control) dominates — the demo2 table (1536 rows) measures
~19x above its arithmetic bound.  This kernel restructures the scan so
one iteration intersects ONE RAY ROW [1, 128] against a whole PRIM CHUNK
[L, 1] via broadcasting, producing [L, 128] candidate tiles with pure
vector ops — no per-prim scalar traffic, no coherence dependence:

  for chunk in chunk_plan:          # static; one primitive kind each
      cols = tbl[p0:p0+L, c:c+1]    # [L, 1] column loads, ONCE per chunk
      for g in rows:                # fori_loop
          t_cand = kind_math(cols, ray_row_g)        # [L, 128]
          reduce min/argmin over sublanes -> best[g]  # [1, 128]

Winner attributes are reconstructed in a second per-row pass with an MXU
one-hot gather: onehot[P, 128] = (iota == best_i) matmul'd against the
whole [P, 36] table (precision HIGHEST keeps the gathered f32 columns
exact to ~2^-22), then the normal/uv/front math runs ONCE per lane
instead of once per (prim, lane) as in the clustered loop's phase 2.

Semantics and the packed-table layout are identical to
intersect_kernel.py (reference Geometry.hs:58-176): two-root sphere
selection on the open interval (t_min, inf), plane membership via scalar
triple products, native axis-aligned boxes, per-prim linear motion,
front-side normal flip, first-lowest-index tie-breaking.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene.types import (
    PRIM_BOX, PRIM_PARALLELOGRAM, PRIM_SPHERE, PRIM_TRIANGLE,
)
from .intersect_kernel import CLUSTER, N_COLS

import os

LANES = 128
BLOCK_RG = int(os.environ.get("RT_AP_RG", "64"))
                     # ray rows per grid program (64*128 = 8192 rays)
CHUNK = int(os.environ.get("RT_AP_CHUNK", "512"))
                     # prims per chunk ([512, 128] f32 tile = 256 KB)
WIDE_LANES = int(os.environ.get("RT_AP_W", "512"))
                     # target row width (rays per row iteration): fewer
                     # row iterations + reductions for the same math.
                     # demo2-table sweep (ms/90k lanes): 128 -> 4.8,
                     # 256 -> 3.96, 512 -> 3.50, 1024 -> 3.37 (plateau;
                     # 512 keeps [CHUNK, W] tiles at 1 MB)
MIN_PRIMS = 192      # below this the per-prim loops win (small tables)
CTILE = 64           # chunk boxes per batched-visibility tile: the
                     # per-row chunk slab tests run as ONE [CTILE, W]
                     # broadcast sweep instead of n_chunks [1, W] tests
                     # (a [1, W] op wastes 7/8 of each vreg's sublanes)
MAX_PRIMS = int(os.environ.get("RT_AP_MAX", "65536"))
                     # with chunk-AABB row skipping the broadcast sweep
                     # holds up to the dense-table cap (measured: see
                     # tools/bench_bigmesh.py); env-tunable for A/B runs
_SKIP_ATTRS = bool(os.environ.get("RT_AP_SKIP_ATTRS"))   # profiling only


def chunk_plan(segments, n_prims: int, chunk: int | None = None):
    """Static (kind, row0, length) chunks from compile_scene's
    kind_segments (cluster units).  Rows within a segment are split into
    <= ``chunk`` (default CHUNK) pieces; segment rows are CLUSTER-aligned
    so every length is a sublane multiple."""
    chunk = CHUNK if chunk is None else chunk
    plan = []
    for gkind, k0, k1 in segments:
        row0 = k0 * CLUSTER
        row1 = min(k1 * CLUSTER, n_prims)
        p = row0
        while p < row1:
            ln = min(chunk, row1 - p)
            plan.append((int(gkind), p, ln))
            p += ln
    return tuple(plan)


def _row(ref, g):
    return ref[pl.ds(g, 1), :]


def chunk_boxes(ctbl, plan):
    """[n_chunks, 8] chunk AABBs from the pack_clusters table (chunks are
    CLUSTER-aligned by construction, so a chunk box is a reduce over its
    cluster rows).  Cols 6-7 carry the chunk's true row bounds
    [p0, p0+ln) — the batched phase-2 winner test reads them as
    broadcast columns."""
    boxes = []
    for _, p0, ln in plan:
        k0 = p0 // CLUSTER
        k1 = (p0 + ln) // CLUSTER
        rows = ctbl[k0:k1]
        boxes.append(jnp.concatenate(
            [rows[:, 0:3].min(axis=0), rows[:, 3:6].max(axis=0),
             jnp.asarray([p0, p0 + ln], jnp.float32)]))
    return jnp.stack(boxes)




def _winner_attrs(c, bt, hit, ox, oy, oz, dx, dy, dz, tm, *, kinds,
                  has_motion: bool):
    """Shared winner-attribute math from a gathered table row accessor
    ``c(j) -> [1, W]`` (both the static and dynamic kernels end phase 2
    here).  Returns (n_x, n_y, n_z, fr, uu, vv, sphf) pre-flip."""
    want_sphere = PRIM_SPHERE in kinds
    want_plane = PRIM_PARALLELOGRAM in kinds
    want_box = PRIM_BOX in kinds
    t_safe = jnp.where(hit, bt, 1.0)
    hx = ox + t_safe * dx
    hy = oy + t_safe * dy
    hz = oz + t_safe * dz
    if has_motion:
        sx = c(24) + tm * c(27)
        sy = c(25) + tm * c(28)
        sz = c(26) + tm * c(29)
    else:
        sx = sy = sz = jnp.zeros_like(bt)

    kind = c(16)
    zero = jnp.zeros_like(bt)
    n_x = zero
    n_y = zero
    n_z = jnp.ones_like(bt)
    fr = zero
    uu = zero
    vv = zero
    sphf = zero

    if want_sphere:
        inv_r = jax.lax.rsqrt(jnp.maximum(c(3), 1e-30)) * jnp.sign(c(30))
        cex = c(0) + sx
        cey = c(1) + sy
        cez = c(2) + sz
        snx = (hx - cex) * inv_r
        sny = (hy - cey) * inv_r
        snz = (hz - cez) * inv_r
        s_fr = jnp.where(dx * snx + dy * sny + dz * snz <= 0.0, 1.0, 0.0)
        is_s = kind == 0.0
        n_x = jnp.where(is_s, snx, n_x)
        n_y = jnp.where(is_s, sny, n_y)
        n_z = jnp.where(is_s, snz, n_z)
        fr = jnp.where(is_s, s_fr, fr)
        sphf = jnp.where(is_s, 1.0, sphf)
        # sphere uv reconstructed by the caller (atan2/acos)

    if want_plane:
        pnx, pny, pnz = c(4), c(5), c(6)
        den = dx * pnx + dy * pny + dz * pnz
        p_fr = jnp.where(den < 0.0, 1.0, 0.0)
        wax, way, waz = c(7), c(8), c(9)
        wbx, wby, wbz = c(10), c(11), c(12)
        a = (hx * wax + hy * way + hz * waz) - c(14) \
            - (sx * wax + sy * way + sz * waz)
        b = (hx * wbx + hy * wby + hz * wbz) - c(15) \
            - (sx * wbx + sy * wby + sz * wbz)
        is_tri = kind == 2.0
        w0 = 1.0 - a - b
        puu = jnp.where(is_tri, w0 * c(18) + a * c(20) + b * c(22), a)
        pvv = jnp.where(is_tri, w0 * c(19) + a * c(21) + b * c(23), b)
        is_p = (kind > 0.5) & (kind < 2.5)
        n_x = jnp.where(is_p, pnx, n_x)
        n_y = jnp.where(is_p, pny, n_y)
        n_z = jnp.where(is_p, pnz, n_z)
        fr = jnp.where(is_p, p_fr, fr)
        uu = jnp.where(is_p, puu, uu)
        vv = jnp.where(is_p, pvv, vv)

    if want_box:
        from .intersect_kernel import _box_attrs
        b_nx, b_ny, b_nz, b_fr, b_uu, b_vv = _box_attrs(
            c(0) + sx, c(1) + sy, c(2) + sz,
            c(7) + sx, c(8) + sy, c(9) + sz,
            hx, hy, hz, dx, dy, dz)
        is_b = kind == 3.0
        n_x = jnp.where(is_b, b_nx, n_x)
        n_y = jnp.where(is_b, b_ny, n_y)
        n_z = jnp.where(is_b, b_nz, n_z)
        fr = jnp.where(is_b, b_fr, fr)
        uu = jnp.where(is_b, b_uu, uu)
        vv = jnp.where(is_b, b_vv, vv)
    return n_x, n_y, n_z, fr, uu, vv, sphf


def _kernel(tbl_ref, cbox_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
            dz_ref, tm_ref, t_out, i_out, nx_out, ny_out, nz_out, fr_out,
            u_out, v_out, m_out, bt_s, bi_s, *, plan, n_prims: int,
            t_min: float, has_motion: bool, rg: int, w: int,
            skip: bool):
    inf = jnp.float32(jnp.inf)
    tmn = jnp.float32(t_min)
    bt_s[...] = jnp.full((rg, w), inf, jnp.float32)
    bi_s[...] = jnp.full((rg, w), -1.0, jnp.float32)

    col = lambda p0, ln, c: tbl_ref[pl.ds(p0, ln), pl.ds(c, 1)]  # [L, 1]

    # ---- phase 1: per-chunk candidate sweep, running best per row ----
    for chunk_i, (gkind, p0, ln) in enumerate(plan):
        kindc = col(p0, ln, 16)
        piota = (jnp.float32(p0) + jax.lax.broadcasted_iota(
            jnp.int32, (ln, 1), 0).astype(jnp.float32))
        if has_motion:
            mvx, mvy, mvz = col(p0, ln, 27), col(p0, ln, 28), col(p0, ln, 29)

        if gkind == PRIM_SPHERE:
            # mv0 folds into the center; everything else is computed in
            # the direct oc = c - o form — all ops are [L, 128]-sized
            # regardless of factoring, so the minimum-op form wins
            cx, cy, cz = col(p0, ln, 0), col(p0, ln, 1), col(p0, ln, 2)
            if has_motion:
                cx = cx + col(p0, ln, 24)
                cy = cy + col(p0, ln, 25)
                cz = cz + col(p0, ln, 26)
            r2 = col(p0, ln, 3)
            ok0 = kindc == 0.0

            def cand(ox, oy, oz, dx, dy, dz, tm):
                if has_motion:
                    ocx = cx + tm * mvx - ox              # [L, 128]
                    ocy = cy + tm * mvy - oy
                    ocz = cz + tm * mvz - oz
                else:
                    ocx = cx - ox
                    ocy = cy - oy
                    ocz = cz - oz
                h = ocx * dx + ocy * dy + ocz * dz
                disc = h * h - (ocx * ocx + ocy * ocy + ocz * ocz - r2)
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                r1 = h - sq
                r2_ = h + sq
                t = jnp.where(r1 > tmn, r1, jnp.where(r2_ > tmn, r2_, inf))
                return jnp.where((disc >= 0.0) & ok0, t, inf)

        elif gkind == PRIM_PARALLELOGRAM:  # planar segment: para + tri
            nx, ny, nz = col(p0, ln, 4), col(p0, ln, 5), col(p0, ln, 6)
            wax, way, waz = col(p0, ln, 7), col(p0, ln, 8), col(p0, ln, 9)
            wbx, wby, wbz = (col(p0, ln, 10), col(p0, ln, 11),
                             col(p0, ln, 12))
            qn, qwa, qwb = col(p0, ln, 13), col(p0, ln, 14), col(p0, ln, 15)
            if has_motion:
                m0x, m0y, m0z = (col(p0, ln, 24), col(p0, ln, 25),
                                 col(p0, ln, 26))
                qn = qn + m0x * nx + m0y * ny + m0z * nz
                qwa = qwa + m0x * wax + m0y * way + m0z * waz
                qwb = qwb + m0x * wbx + m0y * wby + m0z * wbz
                dn = mvx * nx + mvy * ny + mvz * nz
                dwa = mvx * wax + mvy * way + mvz * waz
                dwb = mvx * wbx + mvy * wby + mvz * wbz
            is_tri = kindc == 2.0
            okp = (kindc > 0.5) & (kindc < 2.5)

            def cand(ox, oy, oz, dx, dy, dz, tm):
                qn_e, qwa_e, qwb_e = qn, qwa, qwb
                if has_motion:
                    qn_e = qn + tm * dn
                    qwa_e = qwa + tm * dwa
                    qwb_e = qwb + tm * dwb
                den = nx * dx + ny * dy + nz * dz          # [L, 128]
                den_ok = jnp.abs(den) > 1e-8
                t = (qn_e - (nx * ox + ny * oy + nz * oz)) / jnp.where(
                    den_ok, den, 1.0)
                a = (wax * ox + way * oy + waz * oz) - qwa_e \
                    + t * (wax * dx + way * dy + waz * dz)
                b = (wbx * ox + wby * oy + wbz * oz) - qwb_e \
                    + t * (wbx * dx + wby * dy + wbz * dz)
                bound = jnp.where(is_tri, a + b, jnp.maximum(a, b))
                ok = (den_ok & (a >= 0.0) & (b >= 0.0) & (bound <= 1.0)
                      & (t > tmn) & okp)
                return jnp.where(ok, t, inf)

        else:  # PRIM_BOX: lo in cols 0-2, hi in the w_a slots 7-9
            lox, loy, loz = col(p0, ln, 0), col(p0, ln, 1), col(p0, ln, 2)
            hix, hiy, hiz = col(p0, ln, 7), col(p0, ln, 8), col(p0, ln, 9)
            if has_motion:
                m0x, m0y, m0z = (col(p0, ln, 24), col(p0, ln, 25),
                                 col(p0, ln, 26))
                lox, loy, loz = lox + m0x, loy + m0y, loz + m0z
                hix, hiy, hiz = hix + m0x, hiy + m0y, hiz + m0z
            okb = kindc == 3.0

            def cand(ox, oy, oz, dx, dy, dz, tm):
                safe = lambda d: jnp.where(
                    jnp.abs(d) < 1e-20,
                    jnp.where(d < 0, -1e-20, 1e-20), d)
                ivx, ivy, ivz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)
                lx, ly, lz, hx, hy, hz = lox, loy, loz, hix, hiy, hiz
                if has_motion:
                    sx, sy, sz = tm * mvx, tm * mvy, tm * mvz
                    lx, ly, lz = lx + sx, ly + sy, lz + sz
                    hx, hy, hz = hx + sx, hy + sy, hz + sz
                t0x = (lx - ox) * ivx
                t1x = (hx - ox) * ivx
                t0y = (ly - oy) * ivy
                t1y = (hy - oy) * ivy
                t0z = (lz - oz) * ivz
                t1z = (hz - oz) * ivz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                t = jnp.where(tn > tmn, tn, jnp.where(tf > tmn, tf, inf))
                return jnp.where((tn <= tf) & okb, t, inf)

        def row_body(g, _, cand=cand, piota=piota, ci=chunk_i):
            ox, oy, oz = _row(ox_ref, g), _row(oy_ref, g), _row(oz_ref, g)
            dx, dy, dz = _row(dx_ref, g), _row(dy_ref, g), _row(dz_ref, g)
            tm = _row(tm_ref, g) if has_motion else None

            def eval_chunk():
                t_c = cand(ox, oy, oz, dx, dy, dz, tm)     # [L, W]
                tmin = jnp.min(t_c, axis=0, keepdims=True)  # [1, W]
                pi = jnp.min(jnp.where(t_c == tmin, piota, inf), axis=0,
                             keepdims=True)
                bt = bt_s[pl.ds(g, 1), :]
                better = tmin < bt                  # strict: earlier chunk
                bt_s[pl.ds(g, 1), :] = jnp.where(better, tmin, bt)
                bi = bi_s[pl.ds(g, 1), :]
                bi_s[pl.ds(g, 1), :] = jnp.where(
                    better, jnp.where(tmin < inf, pi, -1.0), bi)

            if not skip:
                eval_chunk()
                return 0
            # chunk-AABB row consensus: slab-test this chunk's box against
            # the row's W rays (t clamped by each lane's current best) and
            # skip the whole [L, W] candidate sweep when no lane can hit —
            # the hierarchy level that keeps mesh-scale tables from paying
            # O(n_prims) per ray (cluster consensus at row granularity)
            safe = lambda dd: jnp.where(jnp.abs(dd) < 1e-20,
                                        jnp.where(dd < 0, -1e-20, 1e-20),
                                        dd)
            ivx, ivy, ivz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)
            t0x = (cbox_ref[ci, 0] - ox) * ivx
            t1x = (cbox_ref[ci, 3] - ox) * ivx
            t0y = (cbox_ref[ci, 1] - oy) * ivy
            t1y = (cbox_ref[ci, 4] - oy) * ivy
            t0z = (cbox_ref[ci, 2] - oz) * ivz
            t1z = (cbox_ref[ci, 5] - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), tmn))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z),
                                         bt_s[pl.ds(g, 1), :]))
            pl.when(jnp.any(tn <= tf))(eval_chunk)
            return 0

        jax.lax.fori_loop(0, rg, row_body, 0)

    # ---- phase 2: winner attributes via MXU one-hot gather ----
    kinds = tuple(sorted({k for k, _, _ in plan}))

    def attr_body(g, _):
        bt = bt_s[pl.ds(g, 1), :]
        bi = bi_s[pl.ds(g, 1), :]
        hit = bt < inf
        if _SKIP_ATTRS:        # profiling: phase-1 cost in isolation
            gsl = (pl.ds(g, 1), slice(None))
            t_out[gsl] = bt
            i_out[gsl] = bi.astype(jnp.int32)
            for ref in (nx_out, ny_out, nz_out, u_out, v_out):
                ref[gsl] = bt * 0.0
            for ref in (fr_out, m_out):
                ref[gsl] = bi.astype(jnp.int32) * 0
            return 0
        # one-hot gather of the winner's table row, accumulated over
        # CHUNK-row pieces so the [chunk, W] one-hot stays VMEM-small
        # even for mesh-scale tables (bunny @ W=512: 1 MB vs 10 MB).
        # With ``skip``, chunks owning none of this row's winners skip
        # their matmul entirely (winners cluster spatially, so most of a
        # mesh-scale table never enters phase 2).
        def add_chunk(gt, p0=None, ln=None):
            piota = (jnp.float32(p0) + jax.lax.broadcasted_iota(
                jnp.int32, (ln, 1), 0).astype(jnp.float32))
            oh = (piota == bi).astype(jnp.float32)         # [L, W]
            g_c = jax.lax.dot_general(
                tbl_ref[pl.ds(p0, ln), :], oh, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # [36, W]
            return gt + g_c

        gt = jnp.zeros((tbl_ref.shape[1], bi.shape[1]), jnp.float32)
        for _, p0, ln in plan:
            add = functools.partial(add_chunk, p0=p0, ln=ln)
            if skip:
                in_c = (bi >= jnp.float32(p0)) & (bi < jnp.float32(p0 + ln))
                gt = jax.lax.cond(jnp.any(in_c), add, lambda x: x, gt)
            else:
                gt = add(gt)
        c = lambda j: gt[j:j + 1, :]                       # [1, W]

        ox, oy, oz = _row(ox_ref, g), _row(oy_ref, g), _row(oz_ref, g)
        dx, dy, dz = _row(dx_ref, g), _row(dy_ref, g), _row(dz_ref, g)
        tm = _row(tm_ref, g) if has_motion else None
        n_x, n_y, n_z, fr, uu, vv, sphf = _winner_attrs(
            c, bt, hit, ox, oy, oz, dx, dy, dz, tm, kinds=kinds,
            has_motion=has_motion)

        flip = jnp.where(fr > 0.5, 1.0, -1.0)
        gsl = (pl.ds(g, 1), slice(None))
        t_out[gsl] = bt
        i_out[gsl] = bi.astype(jnp.int32)
        nx_out[gsl] = n_x * flip
        ny_out[gsl] = n_y * flip
        nz_out[gsl] = n_z * flip
        fr_out[gsl] = ((fr > 0.5).astype(jnp.int32)
                       + 2 * (sphf > 0.5).astype(jnp.int32))
        u_out[gsl] = uu
        v_out[gsl] = vv
        m_out[gsl] = c(17).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, rg, attr_body, 0)



def broadcast_cand(col, gkind, ox, oy, oz, dx, dy, dz, tm, inv,
                   tmn, has_motion):
    """Shared broadcast candidate math: primitives of one kind on
    sublanes ([L, 1] column loads via ``col``), rays on lanes
    ([1, W]); returns the [L, W] candidate-t tile.  ``gkind=None``
    compiles every kind's math and combines (unsegmented tables).
    Used by the all-pairs dynamic kernel and the visit-list broadcast
    kernel."""
    inf = jnp.float32(jnp.inf)
    ivx, ivy, ivz = inv
    kindc = col(16)
    if has_motion:
        mvx, mvy, mvz = col(27), col(28), col(29)
    cands = []
    if gkind in (PRIM_SPHERE, None):
        cx, cy, cz = col(0), col(1), col(2)
        if has_motion:
            cx = cx + col(24) + tm * mvx
            cy = cy + col(25) + tm * mvy
            cz = cz + col(26) + tm * mvz
        ocx = cx - ox
        ocy = cy - oy
        ocz = cz - oz
        h = ocx * dx + ocy * dy + ocz * dz
        disc = h * h - (ocx * ocx + ocy * ocy + ocz * ocz - col(3))
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = h - sq
        r2_ = h + sq
        t = jnp.where(r1 > tmn, r1,
                      jnp.where(r2_ > tmn, r2_, inf))
        cands.append(jnp.where((disc >= 0.0) & (kindc == 0.0), t, inf))
    if gkind in (PRIM_PARALLELOGRAM, None):
        nx, ny, nz = col(4), col(5), col(6)
        wax, way, waz = col(7), col(8), col(9)
        wbx, wby, wbz = col(10), col(11), col(12)
        qn, qwa, qwb = col(13), col(14), col(15)
        if has_motion:
            m0x = col(24) + tm * mvx
            m0y = col(25) + tm * mvy
            m0z = col(26) + tm * mvz
            qn = qn + m0x * nx + m0y * ny + m0z * nz
            qwa = qwa + m0x * wax + m0y * way + m0z * waz
            qwb = qwb + m0x * wbx + m0y * wby + m0z * wbz
        is_tri = kindc == 2.0
        den = nx * dx + ny * dy + nz * dz
        den_ok = jnp.abs(den) > 1e-8
        t = (qn - (nx * ox + ny * oy + nz * oz)) / jnp.where(
            den_ok, den, 1.0)
        a = (wax * ox + way * oy + waz * oz) - qwa \
            + t * (wax * dx + way * dy + waz * dz)
        b = (wbx * ox + wby * oy + wbz * oz) - qwb \
            + t * (wbx * dx + wby * dy + wbz * dz)
        bound = jnp.where(is_tri, a + b, jnp.maximum(a, b))
        ok = (den_ok & (a >= 0.0) & (b >= 0.0) & (bound <= 1.0)
              & (t > tmn) & (kindc > 0.5) & (kindc < 2.5))
        cands.append(jnp.where(ok, t, inf))
    if gkind in (PRIM_BOX, None):
        lox, loy, loz = col(0), col(1), col(2)
        hix, hiy, hiz = col(7), col(8), col(9)
        if has_motion:
            sx = col(24) + tm * mvx
            sy = col(25) + tm * mvy
            sz = col(26) + tm * mvz
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
        t = jnp.where(tn > tmn, tn, jnp.where(tf > tmn, tf, inf))
        cands.append(jnp.where((tn <= tf) & (kindc == 3.0), t, inf))
    out = cands[0]
    for c_ in cands[1:]:
        out = jnp.minimum(out, c_)
    return out


def row_phases(tbl_ref, cbox_ref, clbox_ref, ox, oy, oz, dx, dy, dz, tm,
               *, seg_plan, t_min: float, has_motion: bool,
               subc: bool, stream: bool = False, scratch=(),
               vis_ref=None, list_ref=None):
    """Phases 1+2 of the dynamic all-pairs sweep for ONE ray row.

    ``ox..tm`` are [1, W] values; returns ``(bt, bi, gt)`` — the row's
    best t / winner index ([1, W]) and the winner's gathered table
    columns ([n_cols, W], every packed column).  Shared by the
    standalone dynamic kernel (:func:`_dyn_kernel`) and the fused
    iteration megakernel's mesh-scale intersect stage
    (ops/pallas/iter_kernel.py) — per-(chunk, row) AABB skipping plus
    the 64-prim sub-cluster consensus level when ``subc``.

    ``vis_ref`` ([c_pad, 1] VMEM scratch) enables the BATCHED
    visibility prepass: the per-chunk slab tests run as [CTILE, W]
    broadcast sweeps (chunk boxes on sublanes) instead of n_chunks
    [1, W] tests that each waste 7/8 of the VPU's sublanes; the chunk
    loop then reads one cached flag per chunk.  The batched form drops
    the running-best tf clamp (conservative superset of visited chunks
    — the best-t rejection almost never fires at W-wide rows, measured
    round 4).

    ``list_ref`` ([c_pad] SMEM i32 scratch, requires ``vis_ref``)
    additionally COMPACTS each segment's visited-chunk indices with a
    scalar pass, so the sweep loops run branch-free over exactly the
    visited (phase 1) / winner-owning (phase 2) chunks — at mesh scale
    the per-chunk ``lax.cond`` chain itself is a dominant fixed cost."""
    inf = jnp.float32(jnp.inf)
    tmn = jnp.float32(t_min)
    w = ox.shape[1]
    safe = lambda dd: jnp.where(jnp.abs(dd) < 1e-20,
                                jnp.where(dd < 0, -1e-20, 1e-20), dd)
    ivx, ivy, ivz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)

    bt0 = jnp.full((1, w), inf, jnp.float32)
    bi0 = jnp.full((1, w), -1.0, jnp.float32)

    def batch_vis(phase2: bool):
        """Fill vis_ref[c, 0] with this row's per-chunk flag: phase 1 =
        min slab-entry t over overlapping lanes (3e38 when none — the
        value doubles as the behind-the-best rejection bound), phase 2
        = winner-in-chunk count."""
        n_vis = (vis_ref.shape[0] // CTILE) * CTILE
        for c0 in range(0, n_vis, CTILE):
            colb = lambda c: cbox_ref[pl.ds(c0, CTILE), pl.ds(c, 1)]
            if phase2:
                lo = colb(6)
                hi = colb(7)
                flag = (bi >= lo) & (bi < hi)          # [CTILE, W]
                vis_ref[pl.ds(c0, CTILE), :] = jnp.sum(
                    flag.astype(jnp.float32), axis=1, keepdims=True)
            else:
                t0x = (colb(0) - ox) * ivx
                t1x = (colb(3) - ox) * ivx
                t0y = (colb(1) - oy) * ivy
                t1y = (colb(4) - oy) * ivy
                t0z = (colb(2) - oz) * ivz
                t1z = (colb(5) - oz) * ivz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.maximum(jnp.minimum(t0z, t1z),
                                             tmn))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                vis_ref[pl.ds(c0, CTILE), :] = jnp.min(
                    jnp.where(tn <= tf, tn, jnp.float32(3e38)),
                    axis=1, keepdims=True)

    if stream:
        # HBM table: pull the chunk into VMEM scratch on demand.
        # ~0.3 us transfer + ~1 us latency per visited (row, chunk)
        # vs the ~8 us [CHUNK, W] sweep it feeds.
        sc_ref, sem = scratch

        def fetch(p0):
            dma = pltpu.make_async_copy(
                tbl_ref.at[pl.ds(p0, CHUNK), :], sc_ref, sem)
            dma.start()
            dma.wait()

        def cols(p0):
            return lambda c: sc_ref[:, pl.ds(c, 1)]

        def cols_sub(p0, s):
            return lambda c: sc_ref[pl.ds(s * CLUSTER, CLUSTER),
                                    pl.ds(c, 1)]
    else:
        def fetch(p0):
            pass

        def cols(p0):
            return lambda c: tbl_ref[pl.ds(p0, CHUNK), pl.ds(c, 1)]

        def cols_sub(p0, s):
            return lambda c: tbl_ref[pl.ds(p0 + s * CLUSTER, CLUSTER),
                                     pl.ds(c, 1)]

    def cand_for(gkind, p0):
        return broadcast_cand(
            cols(p0), gkind, ox, oy, oz, dx, dy, dz, tm,
            (ivx, ivy, ivz), tmn, has_motion)

    def slab_of(box_ref, k, bt):
        t0x = (box_ref[k, 0] - ox) * ivx
        t1x = (box_ref[k, 3] - ox) * ivx
        t0y = (box_ref[k, 1] - oy) * ivy
        t1y = (box_ref[k, 4] - oy) * ivy
        t0z = (box_ref[k, 2] - oz) * ivz
        t1z = (box_ref[k, 5] - oz) * ivz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), tmn))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), bt))
        return tn, tf

    def merge_best(t_c, base_f, ln, bt, bi):
        piota = (base_f + jax.lax.broadcasted_iota(
            jnp.int32, (ln, 1), 0).astype(jnp.float32))
        tmin = jnp.min(t_c, axis=0, keepdims=True)
        pi = jnp.min(jnp.where(t_c == tmin, piota, inf),
                     axis=0, keepdims=True)
        better = tmin < bt
        return (jnp.where(better, tmin, bt),
                jnp.where(better,
                          jnp.where(tmin < inf, pi, -1.0), bi))

    def vis_set(c, phase2: bool):
        """Visited test on the cached per-chunk value: phase 1 stores
        the row's min slab-entry t (3e38 = no overlap), phase 2 a
        winner count."""
        v = vis_ref[pl.ds(c, 1), :]
        return jnp.any(v > 0.5) if phase2 \
            else jnp.any(v < jnp.float32(1e37))

    def compact(n_chunks, cbase, phase2: bool):
        """Scalar pass: indices of set vis flags for this segment into
        list_ref; returns the count."""
        def cbody(k, cnt):
            flag = vis_set(cbase + k, phase2)

            @pl.when(flag)
            def _():
                list_ref[cnt] = k

            return cnt + jnp.where(flag, jnp.int32(1), jnp.int32(0))
        return jax.lax.fori_loop(0, n_chunks, cbody, jnp.int32(0))

    # ---- phase 1 ----
    if vis_ref is not None:
        batch_vis(phase2=False)
    carry = (bt0, bi0)
    for gkind, row0, row1, n_chunks, cbase in seg_plan:
        def eval_chunk_at(k, c3, gkind=gkind, row0=row0):
            bt, bi = c3
            p0 = row0 + k * CHUNK
            fetch(p0)
            if not subc:
                t_c = cand_for(gkind, p0)          # [CHUNK, W]
                return merge_best(t_c, p0.astype(jnp.float32),
                                  CHUNK, bt, bi)
            # second consensus level: 64-prim sub-clusters
            # (pack_clusters granularity) — a visited chunk
            # usually needs only a few of its 8 sub-sweeps, and
            # the tighter AABBs reject what the chunk box can't.
            # The NSUB slab tests run as ONE [NSUB, W] broadcast
            # (sub-boxes on sublanes; static per-sub row slices
            # feed the conds) — 8x the sublane utilization of
            # per-sub [1, W] tests.
            NSUB = CHUNK // CLUSTER
            k0c = p0 // CLUSTER
            colc = lambda c: clbox_ref[pl.ds(k0c, NSUB),
                                       pl.ds(c, 1)]
            t0x = (colc(0) - ox) * ivx
            t1x = (colc(3) - ox) * ivx
            t0y = (colc(1) - oy) * ivy
            t1y = (colc(4) - oy) * ivy
            t0z = (colc(2) - oz) * ivz
            t1z = (colc(5) - oz) * ivz
            tn_all = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x),
                            jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmn))
            tf_all = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x),
                            jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt))
            sub_hit = tn_all <= tf_all             # [NSUB, W]
            for s in range(NSUB):

                def eval_sub(c4, s=s):
                    bt, bi = c4
                    t_c = broadcast_cand(
                        cols_sub(p0, s), gkind, ox, oy, oz,
                        dx, dy, dz, tm, (ivx, ivy, ivz), tmn,
                        has_motion)                # [64, W]
                    base_f = (p0 + s * CLUSTER) \
                        .astype(jnp.float32)
                    return merge_best(t_c, base_f, CLUSTER,
                                      bt, bi)

                c3 = jax.lax.cond(jnp.any(sub_hit[s:s + 1, :]),
                                  eval_sub, lambda c4: c4, c3)
            return c3

        if list_ref is not None:
            # branch-free: sweep exactly the visited chunks
            cnt = compact(n_chunks, cbase, False)

            # (a behind-the-best rejection against the prepass entry-t,
            # bounded by the global scene box for miss lanes, was
            # measured here and LOST: 200k 0.81 vs 0.83 M — at 1024-lane
            # rows some lane always keeps a chunk alive)
            def sweep(i, c2, f=eval_chunk_at):
                return f(list_ref[i], c2)
            carry = jax.lax.fori_loop(0, cnt, sweep, carry)
        else:
            def chunk_body(k, c2, cbase=cbase, f=eval_chunk_at):
                bt, bi = c2
                if vis_ref is not None:
                    take = vis_set(cbase + k, False)
                else:
                    tn, tf = slab_of(cbox_ref, cbase + k, bt)
                    take = jnp.any(tn <= tf)
                return jax.lax.cond(take, lambda c3, k=k: f(k, c3),
                                    lambda c3: c3, c2)
            carry = jax.lax.fori_loop(0, n_chunks, chunk_body, carry)
    bt, bi = carry

    # ---- phase 2: winner one-hot gather, winner chunks only ----
    if vis_ref is not None:
        batch_vis(phase2=True)
    gt = jnp.zeros((N_COLS, w), jnp.float32)
    for gkind, row0, row1, n_chunks, cbase in seg_plan:
        row1f = jnp.float32(row1)

        def add_at(k, gt, row0=row0, row1f=row1f):
            p0 = row0 + k * CHUNK
            p0f = p0.astype(jnp.float32)
            fetch(p0)
            piota = (p0f + jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, 1), 0).astype(jnp.float32))
            # clamp to the segment: overrun rows belong to the
            # NEXT segment's chunks (no double gather)
            oh = ((piota == bi)
                  & (piota < row1f)).astype(jnp.float32)
            # streamed scratch is [CHUNK, 128]; slice the RESULT
            # to N_COLS (a 36-wide lane slice of the operand is
            # not tile-aligned)
            rows = scratch[0][...] if stream \
                else tbl_ref[pl.ds(p0, CHUNK), :]
            g_c = jax.lax.dot_general(
                rows, oh, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            if stream:
                g_c = g_c[:N_COLS]
            return gt + g_c

        if list_ref is not None:
            cnt2 = compact(n_chunks, cbase, True)

            def sweep2(i, gt, f=add_at):
                return f(list_ref[i], gt)
            gt = jax.lax.fori_loop(0, cnt2, sweep2, gt)
        else:
            def chunk2(k, gt, row0=row0, row1f=row1f, cbase=cbase,
                       f=add_at):
                if vis_ref is not None:
                    in_c = vis_set(cbase + k, True)
                else:
                    p0f = (row0 + k * CHUNK).astype(jnp.float32)
                    in_c = (bi >= p0f) & (bi < jnp.minimum(
                        p0f + CHUNK, row1f))
                return jax.lax.cond(jnp.any(in_c),
                                    lambda x, k=k: f(k, x),
                                    lambda x: x, gt)
            gt = jax.lax.fori_loop(0, n_chunks, chunk2, gt)
    return bt, bi, gt


def _dyn_kernel(tbl_ref, cbox_ref, clbox_ref, ox_ref, oy_ref, oz_ref,
                dx_ref, dy_ref, dz_ref, tm_ref, t_out, i_out, nx_out,
                ny_out, nz_out, fr_out, u_out, v_out, m_out, *scratch,
                seg_plan, n_prims: int, t_min: float, has_motion: bool,
                rg: int, w: int, stream: bool = False,
                subc: bool = False, batch: bool = False,
                chunk_list: bool = False):
    """Dynamic-chunk variant for mesh-scale tables.

    The static kernel unrolls one code section per chunk — at 100 chunks
    (a 50k-row table) Mosaic compile time explodes (>25 min observed).
    Here the chunk loop is a ``fori_loop`` with DYNAMIC table slices, so
    compile size is O(#kinds), and each (chunk, row) pair is guarded by
    a chunk-AABB slab cond at row granularity: mesh-scale scenes skip
    most of the table per 512-ray row.

    ``seg_plan`` is a static tuple of ``(kind, row0, row1, n_chunks,
    cbox_base)`` — one entry per kind segment.  The table is padded to a
    CHUNK multiple (pad rows kind = -1); chunk overruns into the next
    segment are masked by each kind's own kind-column test, and phase
    2's one-hot is clamped to the segment (``piota < row1``) so rows in
    an overrun region are never double-gathered.
    """
    inf = jnp.float32(jnp.inf)

    def row_body(g, _):
        ox, oy, oz = _row(ox_ref, g), _row(oy_ref, g), _row(oz_ref, g)
        dx, dy, dz = _row(dx_ref, g), _row(dy_ref, g), _row(dz_ref, g)
        tm = _row(tm_ref, g) if has_motion else None

        si = 2 if stream else 0
        bt, bi, gt = row_phases(
            tbl_ref, cbox_ref, clbox_ref, ox, oy, oz, dx, dy, dz, tm,
            seg_plan=seg_plan, t_min=t_min, has_motion=has_motion,
            subc=subc, stream=stream, scratch=scratch[:2],
            vis_ref=scratch[si] if batch else None,
            list_ref=scratch[si + 1] if chunk_list else None)
        hit = bt < inf
        c = lambda j: gt[j:j + 1, :]
        kinds = tuple(sorted({sp[0] for sp in seg_plan}))
        n_x, n_y, n_z, fr, uu, vv, sphf = _winner_attrs(
            c, bt, hit, ox, oy, oz, dx, dy, dz, tm, kinds=kinds,
            has_motion=has_motion)
        flip = jnp.where(fr > 0.5, 1.0, -1.0)
        gsl = (pl.ds(g, 1), slice(None))
        t_out[gsl] = bt
        i_out[gsl] = bi.astype(jnp.int32)
        nx_out[gsl] = n_x * flip
        ny_out[gsl] = n_y * flip
        nz_out[gsl] = n_z * flip
        fr_out[gsl] = ((fr > 0.5).astype(jnp.int32)
                       + 2 * (sphf > 0.5).astype(jnp.int32))
        u_out[gsl] = uu
        v_out[gsl] = vv
        m_out[gsl] = c(17).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, rg, row_body, 0)


# static-unroll compile cost explodes past this many chunks; the dynamic
# kernel takes over (it also brings per-row chunk skipping, which small
# mostly-visited tables don't want)
DYN_MIN_CHUNKS = int(os.environ.get("RT_AP_DYN_CHUNKS", "8"))


def dyn_tables(tbl, ctbl, segments, n_prims: int, stream: bool = False):
    """(padded tbl, cbox, padded clbox, seg_plan) for the dynamic-chunk
    sweep — shared by :func:`allpairs_nearest_record` and the fused
    iteration kernel's mesh-scale intersect stage (iter_kernel.py).

    Dynamic chunk slices may overrun the true rows, so the table is
    padded to each segment's chunk extent with kind = -1 rows (never
    match); cluster boxes are padded with inverted AABBs (never pass a
    slab test)."""
    plan = chunk_plan(segments, n_prims)
    seg_plan = []
    cbase = 0
    rows_needed = tbl.shape[0]
    for gkind, k0, k1 in segments:
        row0 = k0 * CLUSTER
        row1 = min(k1 * CLUSTER, n_prims)
        n_chunks = -(-(row1 - row0) // CHUNK)
        seg_plan.append((int(gkind), row0, row1, n_chunks, cbase))
        cbase += n_chunks
        # a segment whose start is not CHUNK-aligned reads past the
        # nominal table end in its last chunk — pad to the true chunk
        # extent (OOB reads returned garbage rows whose kind column
        # could alias a real kind)
        rows_needed = max(rows_needed, row0 + n_chunks * CHUNK)
    seg_plan = tuple(seg_plan)
    if rows_needed > tbl.shape[0] or (stream and tbl.shape[1] != 128):
        # streamed tables also pad the minor dim to 128 (Mosaic HBM
        # DMA slices must be 128-aligned along lanes)
        cols = 128 if stream else tbl.shape[1]
        out = jnp.zeros((rows_needed, cols),
                        jnp.float32).at[:, 16].set(-1.0)
        tbl = out.at[:tbl.shape[0], :tbl.shape[1]].set(tbl)
    cbox = chunk_boxes(ctbl, plan) if ctbl is not None \
        else jnp.zeros((1, 8), jnp.float32)
    # pad chunk-box rows to a CTILE multiple for the batched visibility
    # prepass; pad rows are inverted boxes (never visited) with empty
    # row bounds (cols 6-7 = 0, never own a winner: miss lanes are -1)
    c_pad = (-cbox.shape[0]) % CTILE
    if ctbl is not None and c_pad:
        pad = jnp.zeros((c_pad, 8), jnp.float32)
        pad = pad.at[:, 0:3].set(jnp.inf).at[:, 3:6].set(-jnp.inf)
        cbox = jnp.concatenate([cbox, pad])
    clbox = ctbl if ctbl is not None else jnp.zeros((1, 8), jnp.float32)
    need = rows_needed // CLUSTER
    if ctbl is not None and clbox.shape[0] < need:
        pad = jnp.zeros((need - clbox.shape[0], clbox.shape[1]),
                        jnp.float32)
        # pad clusters: inverted boxes never pass a slab test
        pad = pad.at[:, 0:3].set(jnp.inf).at[:, 3:6].set(-jnp.inf)
        clbox = jnp.concatenate([clbox, pad])
    return tbl, cbox, clbox, seg_plan


@functools.partial(
    jax.jit,
    static_argnames=("n_prims", "t_min", "has_motion", "segments",
                     "interpret"))
def allpairs_nearest_record(tbl, ox, oy, oz, dx, dy, dz, tm, *,
                            n_prims: int, t_min: float, has_motion: bool,
                            segments, ctbl=None, interpret: bool = False):
    """All-pairs nearest hit.  Same contract as
    intersect_kernel.pallas_nearest_record: [G, 128] ray components in,
    (t, idx, nx, ny, nz, front|sphere<<1, u, v, mat) out.  Requires a
    kind-segmented table (compile_scene pads each segment to CLUSTER
    rows, so chunk lengths stay sublane-aligned).

    ``ctbl`` (pack_clusters AABBs) enables per-(chunk, row) AABB skipping
    — the consensus hierarchy that makes mesh-scale tables affordable."""
    g = ox.shape[0]
    plan = chunk_plan(segments, n_prims)
    # dynamic-chunk kernel past DYN_MIN_CHUNKS: O(#kinds) compile size
    # (the static unroll took >25 min of Mosaic compile at 100 chunks)
    # and per-(chunk, row) AABB skipping.  Small mostly-visited tables
    # (demo2: 4 chunks, +1.5 ms/iter of pure cond overhead measured)
    # keep the static unrolled kernel.  Past MAX_PRIMS the table leaves
    # VMEM entirely and chunks stream from HBM on demand — no table
    # size cap.
    stream = n_prims > MAX_PRIMS
    dyn = stream or (ctbl is not None and len(plan) >= DYN_MIN_CHUNKS)
    if dyn:
        tbl, cbox, clbox, seg_plan = dyn_tables(
            tbl, ctbl, segments, n_prims, stream=stream)
    else:
        # chunk-AABB row skipping DEFAULT-ON for the static kernel since
        # round 5: pawn e2e 8.49 -> 7.83 s, demo2 5.81 -> 5.12 s (the
        # round-4 "+1.5 ms/iter" measurement predates the W-relabel lane
        # padding).  RT_AP_NO_STATIC_SKIP=1 restores the full sweep.
        # RT_AP_STATIC_CHUNK re-chunks the skip plan at a finer
        # granularity for A/B runs — measured LOSING at 128/64 rows on
        # both pawn (7.83 -> 7.89/8.38 s) and demo2 (5.14 -> 5.75/7.04
        # s): these scenes' visited fraction at 512-lane-row consensus
        # is already high, so tighter boxes only add cond tax.
        static_skip = (ctbl is not None
                       and not os.environ.get("RT_AP_NO_STATIC_SKIP"))
        if static_skip:
            sc = int(os.environ.get("RT_AP_STATIC_CHUNK", str(CHUNK)))
            if sc != CHUNK:
                plan = chunk_plan(segments, n_prims, chunk=sc)
            cbox = chunk_boxes(ctbl, plan)
        else:
            cbox = jnp.zeros((1, 8), jnp.float32)
    # second consensus level inside visited chunks (dyn kernel): 64-prim
    # sub-cluster AABB conds (pack_clusters granularity) — visited
    # chunks usually need only a few of their 8 sub-sweeps (bigmesh
    # intersect 96 -> 88 ms per 2^18 primary rays)
    subc = (dyn and ctbl is not None and CHUNK % CLUSTER == 0
            and not os.environ.get("RT_AP_NO_SUBC"))
    # Row width: regroup the [G, 128] components into [G', W] rows so one
    # row iteration intersects W rays (fewer iterations + reductions for
    # the same arithmetic).  Pure relabeling — every lane is independent.
    # Mesh-scale tables shrink W so the whole-table VMEM residency plus
    # ~12 live [CHUNK, W] phase-1 intermediates stay under the ~16 MB
    # scoped-vmem limit (50944 rows at W=512 measured 25.5 MB: OOM);
    # with sub-cluster sweeps the live intermediates are [CLUSTER, W],
    # so wider rows fit (fewer rows = fewer cond/slab fixed costs).
    w_cap = max(WIDE_LANES, 1024) if subc else WIDE_LANES
    tbl_vmem = 0 if (dyn and stream) else tbl.shape[0] * N_COLS * 4
    sweep_rows = CLUSTER if subc else CHUNK
    while w_cap > LANES and (tbl_vmem
                             + sweep_rows * w_cap * 4 * 12) > 14_000_000:
        w_cap //= 2
    # pad the lane-row count to the relabel multiple: an odd G (e.g.
    # 360064 lanes = 2813 rows) would otherwise pin W at 128 — measured
    # 4x the per-row fixed costs on the pawn e2e shape.  Pad rays park
    # far away pointing +x; their outputs are sliced off.
    g_orig = g
    mult = w_cap // LANES
    pad_rows = (-g) % mult
    if pad_rows:
        def pad(a, fill):
            return jnp.concatenate(
                [a, jnp.full((pad_rows, LANES), fill, a.dtype)])
        ox, oy, oz = pad(ox, 3e18), pad(oy, 3e18), pad(oz, 3e18)
        dx, dy, dz = pad(dx, 1.0), pad(dy, 0.0), pad(dz, 0.0)
        tm = pad(tm, 0.0)
        g += pad_rows
    w = LANES
    while w < w_cap and g % 2 == 0 and g >= 2:
        w *= 2
        g //= 2
    resh = lambda x: x.reshape(g, w)
    ox, oy, oz = resh(ox), resh(oy), resh(oz)
    dx, dy, dz, tm = resh(dx), resh(dy), resh(dz), resh(tm)
    rg = min(max(BLOCK_RG * LANES // w, 8), g)
    grid = (pl.cdiv(g, rg),)
    ray_spec = pl.BlockSpec((rg, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((rg, w), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 9
    f32 = jnp.float32
    i32 = jnp.int32
    out_shape = [
        jax.ShapeDtypeStruct((g, w), f32),   # t
        jax.ShapeDtypeStruct((g, w), i32),   # idx
        jax.ShapeDtypeStruct((g, w), f32),   # nx
        jax.ShapeDtypeStruct((g, w), f32),   # ny
        jax.ShapeDtypeStruct((g, w), f32),   # nz
        jax.ShapeDtypeStruct((g, w), i32),   # front | sphere<<1
        jax.ShapeDtypeStruct((g, w), f32),   # u
        jax.ShapeDtypeStruct((g, w), f32),   # v
        jax.ShapeDtypeStruct((g, w), i32),   # mat
    ]
    if dyn:
        # batched visibility prepass whenever chunk boxes exist (A/B:
        # RT_AP_NO_BATCHVIS restores the per-chunk [1, W] slab tests);
        # compacted visited-chunk lists replace the per-chunk cond
        # chain on top of it (A/B: RT_AP_NO_CHUNKLIST)
        batch = (ctbl is not None
                 and not os.environ.get("RT_AP_NO_BATCHVIS"))
        chunk_list = batch and not os.environ.get("RT_AP_NO_CHUNKLIST")
        kernel = functools.partial(_dyn_kernel, seg_plan=seg_plan,
                                   n_prims=n_prims, t_min=t_min,
                                   has_motion=has_motion, rg=rg, w=w,
                                   stream=stream, subc=subc, batch=batch,
                                   chunk_list=chunk_list)
        scratch = [pltpu.VMEM((CHUNK, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA(())] if stream else []
        if batch:
            scratch = scratch + [pltpu.VMEM((cbox.shape[0], 1),
                                            jnp.float32)]
        if chunk_list:
            scratch = scratch + [pltpu.SMEM((cbox.shape[0],),
                                            jnp.int32)]
        tbl_spec = pl.BlockSpec(memory_space=pltpu.HBM) if stream \
            else pl.BlockSpec(memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tbl_spec]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [ray_spec] * 7,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(tbl, cbox, clbox, ox, oy, oz, dx, dy, dz, tm)
        return tuple(o.reshape(-1, LANES)[:g_orig] for o in outs)
    kernel = functools.partial(
        _kernel, plan=plan, n_prims=n_prims, t_min=t_min,
        has_motion=has_motion, rg=rg, w=w, skip=static_skip)
    scratch = [pltpu.VMEM((rg, w), f32), pltpu.VMEM((rg, w), f32)]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [ray_spec] * 7,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(tbl, cbox, ox, oy, oz, dx, dy, dz, tm)
    return tuple(o.reshape(-1, LANES)[:g_orig] for o in outs)
