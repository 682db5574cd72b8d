"""Wavefront path-tracing integrator.

The reference integrator is a lazy recursion per ray (``rayColor``,
Ray.hs:174-224).  The TPU-native design (SURVEY.md §3.2, BASELINE
north-star) converts it to an *iterative wavefront*: a buffer of live rays
advances through bounded bounce iterations carrying
``(radiance, throughput, alive)`` — each recursion level
``emitted + weight * child`` becomes ``radiance += throughput * emitted;
throughput *= weight``.  All material logic is evaluated branchlessly with
masked selects over integer material tags; there is no per-ray control
flow anywhere.

Two drivers share one bounce body:

* :func:`trace` — fixed ray batch, ``while_loop`` until all paths die
  (or a bounded ``scan`` in differentiable mode).
* :func:`trace_wavefront` — *persistent* wavefront with ray regeneration:
  dead lanes are refilled with fresh (pixel, sample) work from a global
  queue every iteration, so vector-lane occupancy stays ~100% regardless
  of path-length variance — the TPU answer to "ray compaction"
  (SURVEY.md §5 long-context).  Finished paths scatter-add into the image
  accumulator at death.

Randomness: each lane derives one key per bounce, and all the bounce's
draws come from a single vectorized uniform block (counter-hash keyed on
(pixel, sample, depth, column)); sampling transforms are branchless
(core/rng.py).

Importance-sampled redirection with MIS mixture pdfs follows
Ray.hs:112-151 and 187-224 exactly: CDF target selection, mixture pdf
``remProb * pdf_base + sum probs_i * t_i^2 / |cross_i . dir|``, and the
reference's pdf<=0 path kill (Ray.hs:198).

Differentiability: sampled directions and discrete choices are detached;
the mixture-pdf *denominator* is wrapped in ``stop_gradient`` so gradients
flow through BRDF/throughput factors only (reparameterized/detached
sampling per the BASELINE north-star).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.vecmath import DTYPE, normalize, reflect, refract, vdot, vdot0
from ..materials.materials import (
    MAT_ANISOTROPIC, MAT_DIELECTRIC, MAT_ISOTROPIC, MAT_LAMBERTIAN,
    MAT_LIGHT, MAT_LOMMEL, MAT_METAL, MAT_MIRROR, MAT_PITCH_BLACK,
    MAT_TRANSPARENT,
)
from ..ops.intersect import INF, make_hit_record, nearest_hit_t
from ..scene.types import Scene
from ..textures.textures import eval_texture
from .camera import (
    CameraSettings, camera_frame, generate_ray_components,
    generate_rays_from_uniforms,
)
from .volumes import volume_candidates

# uniform-block column layout for one bounce
_U_SPEC0 = 0      # metal fuzz unit vector (z)
_U_SPEC1 = 1      # metal fuzz unit vector (phi)
_U_DIELECTRIC = 2
_U_DIR0 = 3       # diffuse unit vector (z)
_U_DIR1 = 4       # diffuse unit vector (phi)
_U_CHOICE = 5     # redirect target CDF draw
_U_TGT_I = 6
_U_TGT_J = 7
_N_BASE_U = 8     # + one column per volume

LANE_ALIGN = 128  # lane-pool alignment (TPU lane width)


def n_bounce_uniforms(scene: Scene) -> int:
    nv = scene.volumes.n_volumes if scene.volumes is not None else 0
    return _N_BASE_U + nv


def _n_scan_prims(prims) -> int:
    """Loop bound for the dense prim scans: unsegmented tables have all
    pad rows trailing, so the true count skips them (Cornell: 18 real
    rows in a 24-row table = 25% less scan work); kind-segmented tables
    pad inside each segment and must scan the full table."""
    if prims.kind_segments is None and 0 < prims.n < prims.kind.shape[0]:
        return prims.n
    return prims.kind.shape[0]


def _eval_redirect_pdf(s: CameraSettings, point, direction):
    """Sum of per-target pdf terms for a direction: ``t^2 / |cross . dir|``
    if the ray from ``point`` hits the target parallelogram, else 0
    (Ray.hs:199-204).  Targets are few and static — vectorized over them.
    """
    if s.n_redirect == 0:
        return jnp.zeros(point.shape[0], DTYPE)
    q = s.redirect_q            # [T,3]
    u = s.redirect_u
    v = s.redirect_v
    cp = jnp.cross(u, v)        # [T,3]
    cp_sq = jnp.maximum(vdot0(cp, cp), 1e-30)
    n_unit = cp * jax.lax.rsqrt(cp_sq)[:, None]
    n_s = cp / cp_sq[:, None]
    w_a = jnp.cross(v, n_s)
    w_b = jnp.cross(n_s, u)

    # private parallelogram intersector (Ray.hs:112-118), interval (0, inf)
    denom = direction @ n_unit.T                              # [R,T]
    denom_safe = jnp.where(jnp.abs(denom) > 1e-8, denom, 1.0)
    t = ((q * n_unit).sum(-1)[None, :] - point @ n_unit.T) / denom_safe
    p_rel_dot = lambda w: (point @ w.T - (q * w).sum(-1)[None, :]
                           + t * (direction @ w.T))
    a = p_rel_dot(w_a)
    b = p_rel_dot(w_b)
    hit = ((jnp.abs(denom) > 1e-8) & (t > 0.0)
           & (0.0 <= a) & (a <= 1.0) & (0.0 <= b) & (b <= 1.0))
    cross_dot = jnp.abs(direction @ cp.T)
    pdf_each = jnp.where(hit, t * t / jnp.maximum(cross_dot, 1e-12), 0.0)
    return pdf_each @ s.redirect_prob


def _henyey_greenstein(g, mu):
    """HG phase (x albedo x 4 pi in the reference contract, Material.hs:124-129)."""
    g2 = g * g
    return (1.0 - g2) / jnp.power(jnp.maximum(1.0 + g2 - 2.0 * g * mu, 1e-12), 1.5)


def _surface_hit(scene: Scene, s: CameraSettings, o, d, time,
                 use_pallas: bool, diff: bool = False):
    """Nearest surface hit + record fields, via the Pallas megakernel when
    enabled (TPU, dense scene) or the XLA path otherwise.

    ``diff=True`` routes through the custom-VJP wrapper (Pallas forward,
    winner-only analytic backward; ops/diff_intersect.py)."""
    r = o.shape[0]
    # Programs combining the clustered intersect loop with the *XLA*
    # volume crossing scan miscompile on the current TPU toolchain
    # (worker crash, pawn scene).  With volumes on the Pallas crossing
    # kernel (use_pallas & not diff — mirrors the volume-path choice in
    # bounce()) the XLA scan is gone and clustering is safe — and it is
    # the big lever for volume scenes with many prims (demo2: 3400).
    clustered = scene.volumes is None or (use_pallas and not diff)

    def _maybe_merge(res):
        # spheres under arbitrary affines live in their own tiny buffer,
        # intersected in XLA and merged here (all paths incl. diff —
        # plain differentiable ops, so ellipsoid params get gradients)
        if scene.ellipsoids is None:
            return res
        from ..ops.ellipsoid import merge_ellipsoid_hits
        return merge_ellipsoid_hits(scene.ellipsoids, o, d, time,
                                    float(s.t_min), *res)

    if diff:
        from ..ops.diff_intersect import make_diff_surface_hit
        p = scene.prims
        hit_fn = make_diff_surface_hit(p.has_motion, float(s.t_min),
                                       use_pallas, clustered=clustered,
                                       has_box=p.has_box,
                                       kind_segments=p.kind_segments,
                                       kinds=p.kinds_present,
                                       sphere_rots=p.sphere_rots)
        ints_f = (p.kind.astype(DTYPE), p.mat.astype(DTYPE))
        return _maybe_merge(hit_fn(
            (p.p0, p.e1, p.e2, p.uvs, p.mv0, p.mv1), ints_f, o, d, time))
    if use_pallas:
        from ..ops.pallas.allpairs_kernel import (
            MAX_PRIMS, MIN_PRIMS, allpairs_nearest_record,
        )
        from ..ops.pallas.intersect_kernel import (
            pack_clusters, pack_prims, pallas_nearest_record,
        )
        g = r // 128
        resh = lambda x: x.reshape(g, 128)
        tbl = pack_prims(scene.prims)
        # The all-pairs broadcast kernel is coherence-independent; the
        # production wavefronts are regenerating (lanes sit at mixed
        # path depths), where it beats the clustered consensus loop
        # (demo2 table: 5.4 vs 8.1 ms/90k semi-coherent lanes).  Its
        # per-ray cost is O(n_prims), so past MAX_PRIMS the two-level
        # clustered loop (which skips whole cluster groups) takes over.
        # no upper bound: past MAX_PRIMS the dynamic all-pairs kernel
        # streams chunks from HBM (table size unbounded)
        use_allpairs = (scene.prims.kind_segments is not None
                        and MIN_PRIMS <= _n_scan_prims(scene.prims))
        if use_allpairs:
            t, idx, nx, ny, nz, fr, uu, vv, mat = allpairs_nearest_record(
                tbl, resh(o[:, 0]), resh(o[:, 1]), resh(o[:, 2]),
                resh(d[:, 0]), resh(d[:, 1]), resh(d[:, 2]), resh(time),
                n_prims=_n_scan_prims(scene.prims), t_min=float(s.t_min),
                has_motion=scene.prims.has_motion,
                segments=scene.prims.kind_segments,
                ctbl=pack_clusters(scene.prims))
        else:
            ctbl = pack_clusters(scene.prims) if clustered else None
            t, idx, nx, ny, nz, fr, uu, vv, mat = pallas_nearest_record(
                tbl, ctbl, resh(o[:, 0]), resh(o[:, 1]), resh(o[:, 2]),
                resh(d[:, 0]), resh(d[:, 1]), resh(d[:, 2]), resh(time),
                n_prims=_n_scan_prims(scene.prims), t_min=float(s.t_min),
                has_motion=scene.prims.has_motion,
                has_box=scene.prims.has_box,
                segments=scene.prims.kind_segments,
                kinds=scene.prims.kinds_present)
        flat = lambda x: x.reshape(r)
        normal = jnp.stack([flat(nx), flat(ny), flat(nz)], axis=-1)
        flags = flat(fr)
        front = (flags & 1).astype(bool)
        is_sphere = (flags & 2).astype(bool)
        # sphere uv (Geometry.hs:100-104) from the outward normal — done
        # here because atan2/arccos have no Pallas TPU lowering.  Rotated
        # sphere instances evaluate UV in object space (Geometry.hs:382-391)
        from ..ops.intersect import apply_sphere_rotations
        outward = normal * jnp.where(front, 1.0, -1.0)[:, None]
        outward = apply_sphere_rotations(outward, flat(idx).astype(jnp.int32),
                                         scene.prims.sphere_rots)
        xz_ok = outward[:, 0] ** 2 + outward[:, 2] ** 2 > 1e-12
        sx = jnp.where(xz_ok, outward[:, 0], 0.0)
        sz = jnp.where(xz_ok, outward[:, 2], 1.0)
        su = jnp.arctan2(sx, sz) / (2.0 * jnp.pi) + 0.5
        sv = jnp.arccos(
            jnp.clip(-outward[:, 1], -1.0 + 1e-6, 1.0 - 1e-6)) / jnp.pi
        uv = jnp.stack([
            jnp.where(is_sphere, su, flat(uu)),
            jnp.where(is_sphere, sv, flat(vv)),
        ], axis=-1)
        return _maybe_merge(
            (flat(t), flat(idx), normal, front, uv, flat(mat)))
    tmin = jnp.full((r,), s.t_min, DTYPE)
    tmax = jnp.full((r,), INF, DTYPE)
    t_srf, idx = nearest_hit_t(scene.prims, scene.bvh, o, d, time, tmin, tmax)
    rec = make_hit_record(scene.prims, idx, o, d, time,
                          jnp.where(jnp.isfinite(t_srf), t_srf, 1.0))
    return _maybe_merge(
        (t_srf, idx, rec.normal, rec.front, rec.uv, rec.mat))


def fused_shade_eligible(scene: Scene, s: CameraSettings) -> bool:
    """Static check for the fused Pallas shade stage
    (ops/pallas/bounce_kernel.py:shade_megakernel): unrolled material
    loop stays small, redirect targets fit the SMEM table, and light
    emission (applied in-kernel) only needs const/checker albedo — rich
    textures on non-light materials are deferred to the XLA
    post-multiply."""
    import os
    from ..textures.textures import TEX_CHECKER, TEX_CONSTANT
    if os.environ.get("RT_NO_FUSED_SHADE"):
        return False
    m = scene.materials
    return (m.kind.shape[0] <= 24
            and s.n_redirect <= 8
            and set(m.light_tex_kinds) <= {TEX_CONSTANT, TEX_CHECKER})


def _fused_shade_bounce(scene: Scene, s: CameraSettings, o, d, uniforms,
                        radiance, throughput, alive,
                        t_srf, idx, normal, front, uv, mat_id, med,
                        interpret: bool = False):
    """Shade via one Pallas kernel from a precomputed hit record +
    optional medium candidates; rich-texture albedo multiplied after.
    Semantically identical to the XLA shade below (same math module:
    bounce_kernel._shade, validated lane-by-lane in
    tests/test_fused_shade.py)."""
    from ..ops.pallas.bounce_kernel import (
        N_U, pack_materials, pack_targets, shade_megakernel,
    )
    from ..textures.textures import TEX_CHECKER, TEX_CONSTANT, eval_texture

    r = o.shape[0]
    g = r // 128
    resh = lambda x: x.reshape(g, 128)
    f32 = lambda x: x.astype(DTYPE)
    mtbl = pack_materials(scene.materials, scene.textures)
    ttbl = pack_targets(s.redirect_prob, s.redirect_q, s.redirect_u,
                        s.redirect_v)
    zero = jnp.zeros((r,), DTYPE)
    # uv is precomputed (exact atan2 + object-space sphere rotations in
    # _surface_hit), so sphere_f = 0 keeps it as-is in the kernel
    hit = (resh(t_srf), resh(f32(idx)),
           resh(normal[:, 0]), resh(normal[:, 1]), resh(normal[:, 2]),
           resh(jnp.where(front, 1.0, 0.0).astype(DTYPE)),
           resh(uv[:, 0]), resh(uv[:, 1]), resh(f32(mat_id)), resh(zero))
    medium = (resh(med[0]), resh(f32(med[1]))) if med is not None else None
    lanes = (resh(o[:, 0]), resh(o[:, 1]), resh(o[:, 2]),
             resh(d[:, 0]), resh(d[:, 1]), resh(d[:, 2]),
             resh(throughput[:, 0]), resh(throughput[:, 1]),
             resh(throughput[:, 2]),
             resh(jnp.where(alive, 1.0, 0.0).astype(DTYPE)))
    uni = jnp.moveaxis(uniforms[:, :N_U], -1, 0).reshape(N_U, g, 128)
    outs = shade_megakernel(mtbl, ttbl, hit, medium, lanes, uni,
                            n_mats=scene.materials.kind.shape[0],
                            n_targets=int(s.n_redirect),
                            has_medium=medium is not None,
                            interpret=interpret)
    flat = lambda x: x.reshape(r)
    o2 = jnp.stack([flat(outs[0]), flat(outs[1]), flat(outs[2])], -1)
    d2 = jnp.stack([flat(outs[3]), flat(outs[4]), flat(outs[5])], -1)
    thr2 = jnp.stack([flat(outs[6]), flat(outs[7]), flat(outs[8])], -1)
    contrib = jnp.stack([flat(outs[9]), flat(outs[10]), flat(outs[11])],
                        -1)
    next_alive = flat(outs[12]) > 0.5
    miss = flat(outs[13]) > 0.5
    bg = s.background(o, d).astype(DTYPE)
    radiance = radiance + jnp.where(miss[:, None], throughput * bg, 0.0) \
        + contrib

    # rich-texture albedo post-multiply (the kernel shaded them at 1.0)
    rich_kinds = set(scene.textures.kinds_present) - {TEX_CONSTANT,
                                                      TEX_CHECKER}
    if rich_kinds:
        from ..core.vecmath import onehot_rows
        if med is not None:
            in_med = med[0] < t_srf      # identical to the in-kernel test
            mat_eff = jnp.where(in_med, med[1], mat_id)
            t_hit = jnp.minimum(med[0], t_srf)
            uv_eff = jnp.where(in_med[:, None], 0.0, uv)
        else:
            mat_eff, t_hit, uv_eff = mat_id, t_srf, uv
        n_mats = scene.materials.kind.shape[0]
        oh_m = onehot_rows(mat_eff, n_mats)
        tex_id = (oh_m @ scene.materials.tex.astype(DTYPE)) \
            .astype(jnp.int32)
        tkind = oh_m @ scene.textures.kind[scene.materials.tex] \
            .astype(DTYPE)
        rich = ~((tkind == TEX_CONSTANT) | (tkind == TEX_CHECKER))
        t_safe = jnp.where(jnp.isfinite(t_hit), t_hit, 1.0)
        point = o + t_safe[:, None] * d
        alb = eval_texture(scene.textures, tex_id, point, uv_eff,
                           onehot=scene.textures.kind.shape[0] <= 64,
                           marble_pallas=not interpret)
        thr2 = thr2 * jnp.where((rich & next_alive)[:, None], alb, 1.0)

    died_now = alive & ~next_alive
    return o2, d2, radiance, thr2, next_alive, died_now


def bounce(scene: Scene, s: CameraSettings, o, d, time, uniforms,
           radiance, throughput, alive, use_pallas: bool = False,
           diff: bool = False, hit_override=None):
    """Advance every live lane by one bounce.

    ``uniforms[R, n_bounce_uniforms]`` supplies all randomness.  Returns
    ``(o', d', radiance', throughput', alive', died_now)``.

    ``hit_override`` supplies a precomputed ``(t_srf, idx, normal, front,
    uv, mat_id)`` surface hit instead of running intersection — used by
    diff/mega_bounce.py's backward, which reconstructs the hit
    differentiably from the saved winner index.
    """
    r = o.shape[0]
    has_targets = s.n_redirect > 0
    if has_targets:
        rem_prob = 1.0 - jnp.sum(s.redirect_prob)
        cdf = jnp.cumsum(s.redirect_prob)

    # --- intersect: surfaces + media (global argmin; SURVEY.md §3.3) ---
    if hit_override is not None:
        t_srf, idx, normal, front, uv, mat_id = hit_override
    else:
        if not diff:
            # stale dead-lane rays poison block consensus/cull bounds
            # (see bounce_mega_soa); park them far outside the scene
            o = jnp.where(alive[:, None], o, jnp.float32(3e18))
        t_srf, idx, normal, front, uv, mat_id = _surface_hit(
            scene, s, o, d, time, use_pallas, diff=diff)

    if scene.volumes is not None:
        tmin = jnp.full((r,), s.t_min, DTYPE)
        nv = scene.volumes.n_volumes
        u_sc = uniforms[:, _N_BASE_U:_N_BASE_U + nv]
        vol_segs = None
        if use_pallas and not diff:
            from .volumes import volume_candidates_pallas
            t_vol, _ = volume_candidates_pallas(
                scene.volumes, o, d, time, tmin, u_sc, float(s.t_min))
        elif diff:
            t_vol, _, seg_entry, seg_exit, seg_has = volume_candidates(
                scene.volumes, o, d, time, tmin, u_sc, with_segments=True)
            vol_segs = (seg_entry, seg_exit, seg_has)
        else:
            t_vol, _ = volume_candidates(scene.volumes, o, d, time, tmin,
                                         u_sc)
        # winner volume's material via a static fold over the (few)
        # volumes — argmin + gather costs ~1 ms per 100k lanes on TPU
        t_med = jnp.full((r,), INF, DTYPE)
        vol_mat = jnp.zeros((r,), mat_id.dtype)
        vol_win = jnp.full((r,), -1, jnp.int32)
        for v in range(nv):
            better = t_vol[:, v] < t_med
            t_med = jnp.where(better, t_vol[:, v], t_med)
            vol_mat = jnp.where(better, scene.volumes.mat[v], vol_mat)
            vol_win = jnp.where(better, v, vol_win)
        in_medium = t_med < t_srf
        t_hit = jnp.where(in_medium, t_med, t_srf)
        if diff:
            # --- density gradients: score-function (likelihood-ratio)
            # weight, value exactly 1 (Geometry.hs:298-330 density is a
            # first-class scene parameter; the reparameterized position
            # gradient vanishes under detached sampling, so the event
            # probability carries the gradient instead).  Per volume:
            #   scattered here: pdf = rho * exp(-rho * s)
            #   passed through L of it: P = exp(-rho * L)
            # w = exp(logp - sg(logp)) == 1.0 multiplies throughput, so
            # d loss/d rho = E[loss * d logp/d rho] — the standard
            # unbiased estimator; u draws stay detached.
            # All lengths are DETACHED — only the densities are attached
            # in logp, so the weight's gradient is purely d logp/d rho
            # (geometry keeps its reparameterized path through t_hit).
            _sg = jax.lax.stop_gradient
            seg_entry, seg_exit, seg_has = vol_segs
            t_evt = _sg(jnp.where(jnp.isfinite(t_hit), t_hit,
                                  jnp.float32(3e18)))
            logp = jnp.zeros((r,), DTYPE)
            for v in range(nv):
                rho = scene.volumes.density[v]
                scat_v = in_medium & (vol_win == v) & alive
                entry_v = _sg(seg_entry[:, v])
                exit_v = _sg(seg_exit[:, v])
                has_v = seg_has[:, v] & alive
                # finite masked lengths: INF in an unselected where-branch
                # still poisons the VJP (0 * inf = NaN)
                seg_len = jnp.clip(jnp.minimum(t_evt, exit_v) - entry_v,
                                   0.0, None)
                seg_len = jnp.where(has_v & jnp.isfinite(seg_len),
                                    seg_len, 0.0)
                s_v = jnp.clip(_sg(t_med) - entry_v, 0.0, None)
                s_v = jnp.where(scat_v & jnp.isfinite(s_v), s_v, 0.0)
                lf = jnp.where(
                    scat_v, jnp.log(jnp.maximum(rho, 1e-20)) - rho * s_v,
                    jnp.where(has_v, -rho * seg_len, 0.0))
                logp = logp + lf
            w_score = jnp.exp(logp - _sg(logp))
            throughput = throughput * w_score[:, None]
    else:
        in_medium = jnp.zeros((r,), bool)
        t_hit = t_srf

    # --- fused Pallas shade (volumes / rich textures / any intersect
    # engine): one kernel replaces the ~40 XLA launches below; rich
    # textures are deferred to a post-multiply (demo2 ~11x -> target
    # reference-showcase parity, VERDICT r3 missing #2) ---
    if (hit_override is None and not diff and use_pallas
            and r % 128 == 0 and fused_shade_eligible(scene, s)):
        return _fused_shade_bounce(
            scene, s, o, d, uniforms, radiance, throughput, alive,
            t_srf, idx, normal, front, uv, mat_id,
            (t_med, vol_mat) if scene.volumes is not None else None)

    hit_any = jnp.isfinite(t_hit)

    # --- miss: background (Ray.hs:179) ---
    bg = s.background(o, d).astype(DTYPE)
    miss = alive & ~hit_any
    radiance = radiance + jnp.where(miss[:, None], throughput * bg, 0.0)

    # --- hit point; medium overrides (arbitrary normal/uv, Geometry.hs:320-326)
    t_safe = jnp.where(hit_any, t_hit, 1.0)  # keep grads NaN-free on miss
    point = o + t_safe[:, None] * d
    if scene.volumes is not None:
        med = in_medium[:, None]
        normal = jnp.where(med, -d, normal)
        front = jnp.where(in_medium, True, front)
        uv = jnp.where(med, 0.0, uv)
        mat_id = jnp.where(in_medium, vol_mat, mat_id)

    kind = scene.materials.kind[mat_id]
    tex_id = scene.materials.tex[mat_id]
    # One-hot gathers of the float tables: scatter-free backward AND ~20x
    # cheaper forward (a [100k] TPU gather costs ~1 ms even from a
    # 16-row table; the one-hot matmul runs on the MXU).  The [R, T]
    # one-hot only pays below ~64 rows — scenes interning hundreds of
    # distinct constant colors (demo1: 460 materials) would build
    # gigabyte one-hots, so large tables keep the direct gather in the
    # non-diff path (the diff path needs one-hot regardless: the
    # backward of a gather is a scatter, which is even slower).
    n_mats = scene.materials.kind.shape[0]
    use_onehot = diff or n_mats <= 64
    if use_onehot:
        from ..core.vecmath import gather_rows, onehot_rows
        oh_m = onehot_rows(mat_id, n_mats)
        param = gather_rows(oh_m, scene.materials.param)
    else:
        param = scene.materials.param[mat_id]
    tex_onehot = diff or scene.textures.kind.shape[0] <= 64
    albedo = eval_texture(scene.textures, tex_id, point, uv,
                          onehot=tex_onehot,
                          marble_pallas=use_pallas and not diff)

    live_hit = alive & hit_any

    # --- emitted (Ray.hs:181-183): only lightSource emits ---
    emitted = jnp.where((kind == MAT_LIGHT)[:, None], albedo, 0.0)
    radiance = radiance + jnp.where(live_hit[:, None],
                                    throughput * emitted, 0.0)

    # --- behaviour classes ---
    is_absorb = (kind == MAT_LIGHT) | (kind == MAT_PITCH_BLACK)
    is_hemi = (kind == MAT_LAMBERTIAN) | (kind == MAT_LOMMEL)
    is_spec = (kind == MAT_MIRROR) | (kind == MAT_METAL) | \
              (kind == MAT_DIELECTRIC) | (kind == MAT_TRANSPARENT)

    # --- specular family (Material.hs:65-112) ---
    refl = reflect(normal, d)
    fuzz_u = rng.unit_vector_from_uniforms(uniforms[:, _U_SPEC0],
                                           uniforms[:, _U_SPEC1])
    metal_dir = refl + param[:, None] * fuzz_u
    metal_ok = vdot0(metal_dir, normal) > 0.0          # Material.hs:76-77
    metal_dir = normalize(metal_dir)

    ior = jnp.maximum(param, 1e-6)
    ior_ratio = jnp.where(front, 1.0 / ior, ior)       # Material.hs:90
    cos_t = jnp.minimum(1.0, vdot0(normal, -d))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    cannot = ior_ratio * sin_t > 1.0
    r0 = (1.0 - ior_ratio) / (1.0 + ior_ratio)
    r0 = r0 * r0
    schlick = r0 + (1.0 - r0) * jnp.power(1.0 - cos_t, 5.0)
    di_reflect = cannot | (uniforms[:, _U_DIELECTRIC] < schlick)
    di_dir = jnp.where(di_reflect[:, None], refl,
                       refract(ior_ratio, cos_t, normal, d))

    spec_dir = jnp.where((kind == MAT_MIRROR)[:, None], refl, d)
    spec_dir = jnp.where((kind == MAT_METAL)[:, None], metal_dir, spec_dir)
    spec_dir = jnp.where((kind == MAT_DIELECTRIC)[:, None], di_dir, spec_dir)
    spec_att = jnp.where((kind == MAT_DIELECTRIC)[:, None],
                         jnp.ones_like(albedo), albedo)
    spec_dead = (kind == MAT_METAL) & ~metal_ok

    # --- diffuse family with redirection (Ray.hs:187-224) ---
    unit_u = rng.unit_vector_from_uniforms(uniforms[:, _U_DIR0],
                                           uniforms[:, _U_DIR1])
    cos_dir = normalize(normal + unit_u)   # cosine-weighted (Ray.hs:191-192)
    base_dir = jnp.where(is_hemi[:, None], cos_dir, unit_u)

    if has_targets:
        x_t = uniforms[:, _U_CHOICE]
        # CDF threshold selection (Ray.hs:148-151): first target whose
        # cumulative prob exceeds x; none -> base sample.
        t_sel = jnp.sum((x_t[:, None] >= cdf[None, :]).astype(jnp.int32), 1)
        use_target = t_sel < s.n_redirect
        ti = jnp.minimum(t_sel, s.n_redirect - 1)
        light_pt = (s.redirect_q[ti]
                    + uniforms[:, _U_TGT_I, None] * s.redirect_u[ti]
                    + uniforms[:, _U_TGT_J, None] * s.redirect_v[ti])
        tgt_dir = normalize(light_pt - point)
        diff_dir = jnp.where(use_target[:, None], tgt_dir, base_dir)
    else:
        diff_dir = base_dir
    diff_dir = jax.lax.stop_gradient(diff_dir)

    mu1 = vdot0(diff_dir, normal)
    pdf_base = jnp.where(is_hemi, mu1 / jnp.pi, 0.25 / jnp.pi)
    hemi_dead = is_hemi & (pdf_base <= 0.0)            # Ray.hs:198

    if has_targets:
        pdf_t = _eval_redirect_pdf(s, point, diff_dir)
        pdf_mix = rem_prob * pdf_base + pdf_t
    else:
        pdf_mix = pdf_base
    # detached sampling density; BRDF numerator stays differentiable
    pdf_mix = jax.lax.stop_gradient(jnp.maximum(pdf_mix, 1e-12))

    mu0 = -vdot0(d, normal)
    lommel = 0.25 / jnp.maximum(mu0 + mu1, 1e-8)
    hg = _henyey_greenstein(param, vdot0(d, diff_dir))
    brdf_factor = jnp.ones((r,), DTYPE)
    brdf_factor = jnp.where(kind == MAT_LOMMEL, lommel, brdf_factor)
    brdf_factor = jnp.where(kind == MAT_ANISOTROPIC, hg, brdf_factor)
    diff_w = albedo * (brdf_factor * pdf_base / pdf_mix)[:, None]

    # --- combine ---
    new_dir = jnp.where(is_spec[:, None], spec_dir, diff_dir)
    weight = jnp.where(is_spec[:, None], spec_att, diff_w)
    next_alive = live_hit & ~is_absorb & ~spec_dead & ~hemi_dead

    throughput = jnp.where(next_alive[:, None], throughput * weight,
                           throughput)
    o_new = jnp.where(next_alive[:, None], point, o)
    d_new = jnp.where(next_alive[:, None], new_dir, d)
    died_now = alive & ~next_alive
    return o_new, d_new, radiance, throughput, next_alive, died_now


def _russian_roulette(s: CameraSettings, u_rr, depth, thr_tuple, alive,
                      died, detach: bool = False):
    """Opt-in Russian roulette (NOT in the reference; unbiased): from
    ``depth >= s.rr_depth`` a path survives with probability
    ``clamp(max(throughput), rr_min, 1)`` and survivors' throughput is
    divided by it.  Cuts the deep-path tail that dominates wavefront
    iteration counts at max_depth=50 (lane occupancy 0.4 -> ~0.9).

    ``thr_tuple`` is an (r, g, b) tuple of [R] arrays. Returns
    (thr', alive', died').  ``detach=True`` stops gradients through the
    survival probability (detached sampling, like the MIS denominators).
    """
    thr_max = jnp.maximum(thr_tuple[0],
                          jnp.maximum(thr_tuple[1], thr_tuple[2]))
    p = jnp.clip(thr_max, s.rr_min, 1.0)
    if detach:
        p = jax.lax.stop_gradient(p)
    do = depth >= s.rr_depth
    kill = do & (u_rr >= p)
    scale = jnp.where(do & ~kill, 1.0 / p, 1.0)
    thr = tuple(t * scale for t in thr_tuple)
    rr_kill = alive & kill
    return thr, alive & ~kill, died | rr_kill


def pallas_eligible(scene: Scene, n_rays: int,
                    interpret: bool = False) -> bool:
    """Static check: can the dense Pallas intersect kernels serve this
    scene?  Kind-segmented tables have no size cap (past MAX_DENSE_PRIMS
    the dynamic all-pairs kernel streams chunks from HBM); unsegmented
    tables must fit VMEM.  ``interpret`` skips the backend check (CPU
    tests drive the kernels in interpret mode)."""
    from ..ops.pallas.intersect_kernel import MAX_DENSE_PRIMS
    return ((interpret or jax.default_backend() in ("tpu", "axon"))
            and scene.bvh is None
            and (scene.prims.kind.shape[0] <= MAX_DENSE_PRIMS
                 or scene.prims.kind_segments is not None)
            and n_rays % 128 == 0)


# Above this many primitive rows the full-bounce megakernel loses to the
# split path: its embedded clustered consensus intersect measured 6.6 s
# vs the dynamic all-pairs kernel's 4.5 s on bigmesh (50k tris, binned
# wavefront) — per-(chunk, 512-ray-row) exact slab consensus beats
# 4096-lane block consensus once bounce rays dominate.  At small scenes
# the megakernel's fused shade still wins (Cornell ~80x).
MEGA_MAX_PRIMS = 8192
# FORWARD-only cap (round 5): after the static chunk skip + W-relabel
# lane padding, the split path (all-pairs intersect + fused shade)
# beats the megakernel's embedded 4096-lane-consensus intersect far
# below MEGA_MAX_PRIMS — bunny (4,992 tris) e2e measured 2.75 s split
# vs 9.92 s mega.  The DIFF driver keeps MEGA_MAX_PRIMS: its split
# alternative pays per-iteration XLA shade glue and loses (2.17 vs
# 2.63 M on bunny).  Env-tunable for A/B.
MEGA_MAX_PRIMS_FWD = int(__import__("os").environ.get(
    "RT_MEGA_MAX_PRIMS_FWD", "512"))


def bounce_kernel_eligible(scene: Scene, s: CameraSettings,
                           n_rays: int, interpret: bool = False,
                           defer_rich: bool = False,
                           forward_only: bool = False) -> bool:
    """Static check for the full-bounce megakernel: dense scene, no
    volumes, only constant/checker textures, few targets and few
    material *behaviors* (constant-color materials collapse to one
    behavior row however many colors the scene interns — see
    materials.MaterialTable.behavior_of).

    ``defer_rich=True`` (the DIFF fused-iteration driver only): rich
    textures on non-light materials are allowed — the kernel shades
    them at albedo 1.0 (bounce_kernel._shade_values) and the driver
    multiplies the real texel into throughput outside per iteration.
    Light textures stay constant/checker (emission is in-kernel)."""
    import os
    if os.environ.get("RT_NO_MEGA"):
        return False
    # env read per-call so tests/A-B runs can re-pin the forward cap
    cap = int(os.environ.get("RT_MEGA_MAX_PRIMS_FWD",
                             str(MEGA_MAX_PRIMS_FWD))) \
        if forward_only else MEGA_MAX_PRIMS
    if scene.prims.kind.shape[0] > cap \
            and not os.environ.get("RT_FORCE_MEGA"):
        return False
    from ..textures.textures import TEX_CHECKER, TEX_CONSTANT
    m = scene.materials
    n_rows = m.n_behaviors if getattr(m, "n_behaviors", 0) > 0 \
        else m.kind.shape[0]
    base_tex = {TEX_CONSTANT, TEX_CHECKER}
    if defer_rich:
        tex_ok = set(m.light_tex_kinds) <= base_tex
    else:
        tex_ok = set(scene.textures.kinds_present) <= base_tex
    return (pallas_eligible(scene, n_rays, interpret=interpret)
            and scene.volumes is None
            and tex_ok
            and s.n_redirect <= 8
            and n_rows <= 16
            and scene.ellipsoids is None
            # rotated sphere instances need object-space UV, which the
            # in-kernel checker eval doesn't apply (constant ignores uv)
            and not (scene.prims.sphere_rots
                     and TEX_CHECKER in scene.textures.kinds_present))


def bounce_mega_soa(scene: Scene, s: CameraSettings, comps, uniforms,
                    rad, thr, alive, interpret: bool = False,
                    with_idx: bool = False):
    # Dead (budget-exhausted) lanes carry STALE rays; left alone they
    # poison every consensus/cull bound their block touches (74% of
    # lanes are dead in a typical tail iteration — measured bigmesh
    # occupancy 0.26 — and their arbitrary directions made the culled
    # path no faster than visit-everything).  Send them from far
    # outside the scene so every cluster test rejects them; their
    # outputs are masked by ``alive`` downstream anyway.
    far = jnp.float32(3e18)
    comps = tuple(
        jnp.where(alive, c, far) if k < 3 else c
        for k, c in enumerate(comps))
    """Component-level megakernel call.

    ``comps`` = (ox, oy, oz, dx, dy, dz, time); ``rad``/``thr`` are
    (r, g, b) tuples — all 1-D [R] arrays (SoA: [R, 3] arrays tile
    catastrophically on TPU).  Returns (comps', rad', thr', alive', died),
    plus the winner prim index (i32, -1 on miss) when ``with_idx``.

    """
    from ..ops.pallas.bounce_kernel import (
        N_U, bounce_megakernel, pack_behaviors, pack_materials,
        pack_prims, pack_targets,
    )
    from ..ops.pallas.intersect_kernel import pack_clusters
    from ..textures.textures import TEX_CONSTANT
    r = comps[0].shape[0]
    g = r // 128
    resh = lambda x: x.reshape(g, 128)
    m = scene.materials
    use_beh = getattr(m, "n_behaviors", 0) > 0
    if use_beh:
        # behavior-collapsed packing: constant-texture color + scalar
        # param ride per-prim (pack_prims cols 31-34); the material loop
        # unrolls over the few behavior rows (demo1: 460 mats -> 3 rows)
        p = scene.prims
        tex_ids = m.tex[p.mat]
        is_const = (scene.textures.kind[tex_ids] == TEX_CONSTANT)[:, None]
        prim_albedo = jnp.where(is_const, scene.textures.c0[tex_ids], 0.0)
        ptbl = pack_prims(p, mat_override=m.behavior_of[p.mat],
                          albedo=prim_albedo, param=m.param[p.mat])
        mtbl = pack_behaviors(m, scene.textures)
        n_mats = m.n_behaviors
    else:
        ptbl = pack_prims(scene.prims)
        mtbl = pack_materials(m, scene.textures)
        n_mats = m.kind.shape[0]
    ctbl = pack_clusters(scene.prims)
    ttbl = pack_targets(s.redirect_prob, s.redirect_q, s.redirect_u,
                        s.redirect_v)
    uk = uniforms[:, :N_U].T.reshape(N_U, g, 128)
    outs = bounce_megakernel(
        ptbl, ctbl, mtbl, ttbl,
        *(resh(c) for c in comps),
        resh(thr[0]), resh(thr[1]), resh(thr[2]),
        resh(alive.astype(DTYPE)), uk,
        n_prims=_n_scan_prims(scene.prims),
        n_mats=n_mats, n_targets=s.n_redirect,
        t_min=float(s.t_min), has_motion=scene.prims.has_motion,
        use_prim_albedo=use_beh, has_box=scene.prims.has_box,
        segments=scene.prims.kind_segments,
        kinds=scene.prims.kinds_present, interpret=interpret)
    fl = lambda x: x.reshape(r)
    new_comps = tuple(fl(outs[k]) for k in range(6)) + (comps[6],)
    thr_new = (fl(outs[6]), fl(outs[7]), fl(outs[8]))
    alive_new = fl(outs[12]) > 0.5
    miss = fl(outs[13]) > 0.5
    # background on miss (kept outside the kernel: arbitrary jittable bg)
    o = jnp.stack(comps[0:3], axis=-1)
    d = jnp.stack(comps[3:6], axis=-1)
    bg = s.background(o, d).astype(DTYPE)
    miss_f = jnp.where(miss, 1.0, 0.0)
    rad_new = tuple(
        rad[k] + fl(outs[9 + k]) + miss_f * thr[k] * bg[:, k]
        for k in range(3))
    died = alive & ~alive_new
    if with_idx:
        idx = fl(outs[14]).astype(jnp.int32)
        return new_comps, rad_new, thr_new, alive_new, died, idx
    return new_comps, rad_new, thr_new, alive_new, died


def bounce_mega(scene: Scene, s: CameraSettings, o, d, time, uniforms,
                radiance, throughput, alive, interpret: bool = False,
                with_idx: bool = False):
    """Full-bounce Pallas megakernel wrapper; drop-in for :func:`bounce`."""
    comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time)
    rad = (radiance[:, 0], radiance[:, 1], radiance[:, 2])
    thr = (throughput[:, 0], throughput[:, 1], throughput[:, 2])
    out = bounce_mega_soa(scene, s, comps, uniforms, rad, thr, alive,
                          interpret=interpret, with_idx=with_idx)
    new_comps, rad_new, thr_new, alive_new, died = out[:5]
    o_new = jnp.stack(new_comps[0:3], axis=-1)
    d_new = jnp.stack(new_comps[3:6], axis=-1)
    res = (o_new, d_new, jnp.stack(rad_new, axis=-1),
           jnp.stack(thr_new, axis=-1), alive_new, died)
    return res + (out[5],) if with_idx else res


def trace(scene: Scene, s: CameraSettings, o, d, time, keys,
          differentiable: bool = False):
    """Trace a fixed batch of rays to completion; returns radiance [R, 3].

    ``keys`` are per-ray typed RNG keys (shard-invariant, see core/rng.py).

    ``differentiable=True`` drives the same bounce body with a bounded
    ``lax.scan`` (reverse-mode AD cannot cross ``while_loop``); each bounce
    is rematerialized under ``jax.checkpoint``.
    """
    r = o.shape[0]
    n_u = n_bounce_uniforms(scene)
    use_pallas = pallas_eligible(scene, r) and scene.bvh is None
    use_mega = (not differentiable) and bounce_kernel_eligible(
        scene, s, r, forward_only=True)

    def body(state):
        depth, o, d, radiance, throughput, alive, time = state
        dkeys = rng.mix_depth(keys, depth)
        uniforms = rng.uniform_block(dkeys, n_u + 1)
        if use_mega:
            o, d, radiance, throughput, alive, _ = bounce_mega(
                scene, s, o, d, time, uniforms, radiance, throughput, alive)
        else:
            o, d, radiance, throughput, alive, _ = bounce(
                scene, s, o, d, time, uniforms, radiance, throughput, alive,
                use_pallas=use_pallas, diff=differentiable)
        if s.rr_depth is not None:
            thr_t = (throughput[:, 0], throughput[:, 1], throughput[:, 2])
            thr_t, alive, _ = _russian_roulette(
                s, uniforms[:, n_u], depth + 1, thr_t, alive,
                jnp.zeros_like(alive), detach=differentiable)
            throughput = jnp.stack(thr_t, axis=-1)
        return depth + 1, o, d, radiance, throughput, alive, time

    def cond(state):
        depth = state[0]
        alive = state[5]
        return (depth < s.max_depth) & jnp.any(alive)

    state = (
        jnp.zeros((), jnp.int32), o, d, jnp.zeros((r, 3), DTYPE),
        jnp.ones((r, 3), DTYPE), jnp.ones((r,), bool), time,
    )
    if differentiable:
        ckpt_body = jax.checkpoint(body)

        def scan_body(st, _):
            return ckpt_body(st), None

        state, _ = jax.lax.scan(scan_body, state, None, length=s.max_depth)
    else:
        state = jax.lax.while_loop(cond, body, state)
    return state[3]


def trace_wavefront(scene: Scene, s: CameraSettings, base_key, n_pix: int,
                    spp: int, n_lanes: int, acc=None, sample_offset: int = 0,
                    with_stats: bool = False):
    """Persistent wavefront: render ``n_pix * spp`` paths with a fixed pool
    of ``n_lanes`` lanes, regenerating dead lanes from the work queue every
    iteration.  Returns the [n_pix, 3] radiance *sum* over samples (divide
    by spp for the image); pass ``acc`` to continue accumulating
    (progressive rendering / checkpoint-resume).

    Work item w maps to (pixel = w % n_pix, sample = w // n_pix); RNG keys
    derive from those absolute coordinates, so the image is independent of
    n_lanes, batching, and device layout.
    """
    total_work = n_pix * spp
    n_u = n_bounce_uniforms(scene)
    frame = camera_frame(s)
    if acc is None:
        acc = jnp.zeros((n_pix, 3), DTYPE)
    lanes = min(n_lanes, -(-total_work // 128) * 128)
    use_pallas = pallas_eligible(scene, lanes)
    use_mega = bounce_kernel_eligible(scene, s, lanes, forward_only=True)

    # State is fully SoA: 1-D lane arrays only ([R, 3] carries tile
    # catastrophically on TPU — minor dim 3 in an (8, 128) tile).
    def body(state):
        (acc_r, acc_g, acc_b, next_w, comps, rad, thr,
         alive, pixel, sample, depth, keys, iters, segments) = state

        # --- regenerate dead lanes from the queue ---
        dead = ~alive
        rank = jnp.cumsum(dead.astype(jnp.int32)) - dead.astype(jnp.int32)
        wi = next_w + rank
        can = dead & (wi < total_work)
        can_f = jnp.where(can, 1.0, 0.0)
        new_pixel = (wi % n_pix).astype(jnp.int32)
        new_sample = (wi // n_pix).astype(jnp.int32) + sample_offset
        nk = rng.ray_keys_fast(base_key, new_pixel, new_sample)
        keys = jax.random.wrap_key_data(jnp.where(
            can[:, None], jax.random.key_data(nk),
            jax.random.key_data(keys)))
        rad = tuple(r * (1.0 - can_f) for r in rad)
        thr = tuple(jnp.where(can, 1.0, t) for t in thr)
        pixel = jnp.where(can, new_pixel, pixel)
        sample = jnp.where(can, new_sample, sample)
        depth = jnp.where(can, 0, depth)
        alive = alive | can
        next_w = next_w + jnp.sum(can.astype(jnp.int32))

        # --- one uniform block per iteration: bounce draws + (for lanes
        # regenerated this iteration, at depth 0) camera draws + RR ---
        dkeys = rng.mix_depth(keys, depth)
        uniforms = rng.uniform_block(dkeys, n_u + 6)
        new_comps = generate_ray_components(s, frame, pixel,
                                            uniforms[:, n_u:n_u + 5])
        comps = tuple(jnp.where(can, nc, c)
                      for nc, c in zip(new_comps, comps))

        if use_mega:
            comps, rad, thr, alive, died = bounce_mega_soa(
                scene, s, comps, uniforms, rad, thr, alive)
        else:
            o = jnp.stack(comps[0:3], axis=-1)
            d = jnp.stack(comps[3:6], axis=-1)
            o, d, radiance, throughput, alive, died = bounce(
                scene, s, o, d, comps[6], uniforms,
                jnp.stack(rad, axis=-1), jnp.stack(thr, axis=-1), alive,
                use_pallas=use_pallas)
            comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                     comps[6])
            rad = (radiance[:, 0], radiance[:, 1], radiance[:, 2])
            thr = (throughput[:, 0], throughput[:, 1], throughput[:, 2])
        depth = depth + 1
        # depth cap kills lanes (reference depth<=0 -> black, Ray.hs:176)
        capped = alive & (depth >= s.max_depth)
        died = died | capped
        alive = alive & ~capped
        if s.rr_depth is not None:
            thr, alive, died = _russian_roulette(
                s, uniforms[:, n_u + 5], depth, thr, alive, died)

        # --- flush finished paths into the accumulator ---
        died_f = jnp.where(died, 1.0, 0.0)
        acc_r = acc_r.at[pixel].add(rad[0] * died_f, mode="drop")
        acc_g = acc_g.at[pixel].add(rad[1] * died_f, mode="drop")
        acc_b = acc_b.at[pixel].add(rad[2] * died_f, mode="drop")

        segments = segments + jnp.sum((alive | died).astype(jnp.int32))
        return (acc_r, acc_g, acc_b, next_w, comps, rad, thr,
                alive, pixel, sample, depth, keys, iters + 1, segments)

    def cond(state):
        next_w = state[3]
        alive = state[7]
        return (next_w < total_work) | jnp.any(alive)

    z1 = jnp.zeros((lanes,), DTYPE)
    o1 = jnp.ones((lanes,), DTYPE)
    init_keys = rng.ray_keys_fast(base_key, jnp.zeros(lanes, jnp.int32),
                                  jnp.zeros(lanes, jnp.int32))
    zw = jnp.zeros((n_pix,), DTYPE)
    state = (
        zw, zw, zw, jnp.zeros((), jnp.int32),
        (z1, z1, z1, z1, z1, o1, z1),       # o, d (dummy unit z), time
        (z1, z1, z1), (o1, o1, o1),         # radiance, throughput
        jnp.zeros((lanes,), bool),
        jnp.zeros((lanes,), jnp.int32), jnp.zeros((lanes,), jnp.int32),
        jnp.zeros((lanes,), jnp.int32), init_keys,
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
    )
    state = jax.lax.while_loop(cond, body, state)
    acc_out = acc + jnp.stack(state[0:3], axis=-1)
    if with_stats:
        return acc_out, dict(iterations=state[-2], segments=state[-1],
                             lanes=lanes)
    return acc_out


def _tile_maps(n_pix: int, width: int, lanes: int, tile_h: int = 8,
               tile_w: int = 128):
    """Tile-ordered pixel<->lane maps.

    Lane blocks of the Pallas kernels are 1024-4096 consecutive lanes; in
    scanline order that is a full-width strip whose rays collectively
    overlap most of the scene, so the clustered intersect kernel's
    block-consensus AABB skipping never fires.  Mapping lanes to 8x128
    *pixel tiles* makes each kernel block a compact screen tile with a
    narrow frustum (and spatially compact bounce origins), which is what
    lets mesh-scale scenes skip most clusters.

    Returns (lane_to_pixel[lanes], pixel_to_lane[n_pix]) as np arrays.
    """
    import numpy as np
    p = np.arange(n_pix, dtype=np.int64)
    j, i = p // width, p % width
    n_tx = -(-width // tile_w)
    key = (((j // tile_h) * n_tx + (i // tile_w)) * (tile_h * tile_w)
           + (j % tile_h) * tile_w + (i % tile_w))
    order = np.argsort(key, kind="stable").astype(np.int32)  # lane -> pixel
    lane_to_pixel = np.full(lanes, n_pix - 1, np.int32)
    lane_to_pixel[:n_pix] = order
    pixel_to_lane = np.empty(n_pix, np.int32)
    pixel_to_lane[order] = np.arange(n_pix, dtype=np.int32)
    return lane_to_pixel, pixel_to_lane


def trace_wavefront_stationary(scene: Scene, s: CameraSettings, base_key,
                               n_pix: int, spp: int, acc=None,
                               sample_offset: int = 0,
                               with_stats: bool = False,
                               rotate_k: int = 1,
                               pixel_offset=0,
                               fused_interpret: bool = False):
    """Pixel-stationary persistent wavefront: lane ``l`` owns pixel
    ``pixel_offset + l`` for the whole launch and traces its ``spp``
    samples sequentially.  ``pixel_offset`` lets a device render a
    contiguous pixel block of a larger image (parallel/sharding.py
    shard_map path); RNG keys use absolute pixel ids, so the image is
    identical however the blocks are cut.

    Why: TPU scatter with per-iteration-varying indices costs ~0.8 ms per
    131k updates (XLA re-sorts the indices every iteration), which
    dominated the queue-based wavefront.  With stationary lanes the flush
    is a lane-indexed *masked add* — no scatter anywhere — at the price of
    some tail imbalance (lanes whose pixels have long paths finish last).

    ``rotate_k > 1`` (must divide ``spp``) rotates each lane through ``k``
    pixels — lane ``l`` serves lane-slot ``(l + c*stride) % lanes`` for
    samples in chunk ``c = sample // (spp/k)`` — so per-lane total work
    averages the path-length variance of ``k`` pixels.  The stride is a
    large multiple of the Pallas block width, so (a) the ``k`` pixels are
    spread across the WHOLE image (sky lanes average with fog lanes —
    adjacent pixels have correlated path lengths and average nothing) and
    (b) each kernel block still covers one contiguous tile-ordered pixel
    run (cluster-consensus coherence survives rotation).  The flush stays
    scatter-free: contributions land at a per-chunk *fixed* lane shift,
    i.e. ``k`` masked ``jnp.roll`` adds, unscrambled once at the end.

    RNG keys derive from absolute (pixel, sample) exactly as in
    :func:`trace_wavefront`, so all schedulers and any ``rotate_k``
    produce the same samples.
    """
    lanes = -(-n_pix // LANE_ALIGN) * LANE_ALIGN
    k_rot = rotate_k if (rotate_k > 1 and spp % rotate_k == 0) else 1
    spp_k = spp // k_rot
    n_u = n_bounce_uniforms(scene)
    frame = camera_frame(s)
    if acc is None:
        acc = jnp.zeros((n_pix, 3), DTYPE)
    use_pallas = pallas_eligible(scene, lanes)
    use_mega = bounce_kernel_eligible(scene, s, lanes, forward_only=True)
    last_sample = sample_offset + spp - 1

    # Tile-order the pixel<->lane map when this launch covers the full
    # image at a static offset (the single-chip path) AND the scene is
    # big enough for the clustered intersect loop — tiling only exists to
    # make its block consensus fire; for small scenes the reordered lane
    # traffic costs ~10% for no benefit.  See _tile_maps.
    from ..ops.pallas.intersect_kernel import CLUSTER_MIN_PRIMS
    # a static row-aligned offset covers both the full image and the
    # pixel-band splits of render_accumulate (whole rows per band)
    use_tiles = (isinstance(pixel_offset, int)
                 and pixel_offset % s.image_width == 0
                 and n_pix % s.image_width == 0
                 and scene.prims.kind.shape[0] >= CLUSTER_MIN_PRIMS)
    if use_tiles:
        l2p_np, p2l_np = _tile_maps(n_pix, s.image_width, lanes)
        tile_l2p = jnp.asarray(l2p_np) + pixel_offset
        tile_p2l = jnp.asarray(p2l_np)

    # rotation stride: a multiple of the Pallas block width (32 rows x
    # 128 lanes) so rotated blocks stay tile-contiguous; ~lanes/k spreads
    # a lane's k pixels across the whole image.  Small lane pools where
    # the aligned stride degenerates (stride % lanes == 0 would rotate by
    # nothing) fall back to plain lanes/k.
    _BLK = 32 * LANE_ALIGN
    stride = max((lanes // max(k_rot, 1)) // _BLK * _BLK, _BLK)
    if k_rot > 1 and stride % lanes == 0:
        stride = max(lanes // k_rot, 1)

    lane_ids = jnp.arange(lanes, dtype=jnp.int32)

    # ---- fused-iteration fast path: the whole body is ONE Pallas
    # kernel (ops/pallas/iter_kernel.py) + the masked accumulation adds;
    # same RNG stream and estimator as the body below (the kernel's
    # int32 counter-hash is bit-identical to core/rng.py) ----
    from ..diff.fused_iter import fused_iter_eligible
    if k_rot == 1 and fused_iter_eligible(scene, s, lanes,
                                          interpret=fused_interpret,
                                          need_replay=False):
        from ..diff.fused_iter import fused_iter_fwd_step
        step = fused_iter_fwd_step(scene, s, base_key, spp, sample_offset,
                                   interpret=fused_interpret)
        if use_tiles:
            lane_pixel = tile_l2p
        else:
            lane_pixel = pixel_offset + jnp.minimum(lane_ids, n_pix - 1)
        g = lanes // 128
        pix2 = lane_pixel.astype(jnp.int32).reshape(g, 128)
        init_smp = jnp.where(lane_ids < n_pix, sample_offset - 1,
                             last_sample + 1).astype(jnp.int32)

        def body_f(state):
            accs, carry, iters, segments = state
            carry2, rad2, died_f = step(pix2, carry)
            accs = tuple(a + r * died_f for a, r in zip(accs, rad2))
            alive2 = carry2[2] > 0.5
            segments = segments + jnp.sum(
                (alive2 | (died_f > 0.5)).astype(jnp.int32))
            return (accs, carry2, iters + 1, segments)

        def cond_f(state):
            carry = state[1]
            return jnp.any((carry[2] > 0.5) | (carry[0] < last_sample))

        z2 = jnp.zeros((g, 128), DTYPE)
        o2 = jnp.ones((g, 128), DTYPE)
        zi2 = jnp.zeros((g, 128), jnp.int32)
        carry0 = ((init_smp.reshape(g, 128), zi2, z2)
                  + (z2, z2, z2, z2, z2, o2, z2) + (z2, z2, z2)
                  + (o2, o2, o2))
        state = ((z2, z2, z2), carry0, jnp.zeros((), jnp.int32),
                 jnp.zeros((), jnp.int32))
        state = jax.lax.while_loop(cond_f, body_f, state)
        accs = tuple(a.reshape(lanes) for a in state[0])
        if use_tiles:
            contrib = jnp.stack(accs, axis=-1)[tile_p2l]
        else:
            contrib = jnp.stack(accs, axis=-1)[:n_pix]
        acc_out = acc + contrib
        if with_stats:
            return acc_out, dict(iterations=state[2], segments=state[3],
                                 lanes=lanes)
        return acc_out

    if k_rot == 1:
        # padding lanes (>= n_pix) start exhausted
        init_sample = jnp.where(lane_ids < n_pix,
                                sample_offset - 1, last_sample + 1)
    else:
        # every lane works: padded slots are dummy pixels whose
        # contributions land at lane slots >= n_pix and are dropped at
        # the final unscramble (wasted work: (lanes-n_pix)*spp, <0.1%)
        init_sample = jnp.full((lanes,), sample_offset - 1, jnp.int32)

    def body(state):
        (acc_r, acc_g, acc_b, comps, rad, thr, alive, sample, depth, keys,
         iters, segments) = state

        # --- start this lane's next sample if idle ---
        can = ~alive & (sample < last_sample)
        can_f = jnp.where(can, 1.0, 0.0)
        sample = jnp.where(can, sample + 1, sample)
        if k_rot == 1:
            rot_c = None
            if use_tiles:
                lane_pixel = tile_l2p
            else:
                lane_pixel = pixel_offset + jnp.minimum(lane_ids, n_pix - 1)
            cam_pixel = lane_pixel
        else:
            rot_c = ((sample - sample_offset) // spp_k).astype(jnp.int32)
            rot_c = jnp.clip(rot_c, 0, k_rot - 1)
            # lane l serves lane-slot (l + c*stride) % lanes; the k
            # possible lane->pixel maps are rolled constants, selected by
            # the per-lane chunk with a where-chain (no dynamic gather)
            if use_tiles:
                maps = [jnp.roll(tile_l2p, -cc * stride)
                        for cc in range(k_rot)]
            else:
                maps = [pixel_offset + jnp.minimum(
                            (lane_ids + cc * stride) % lanes, n_pix - 1)
                        for cc in range(k_rot)]
            lane_pixel = maps[0]
            for cc in range(1, k_rot):
                lane_pixel = jnp.where(rot_c == cc, maps[cc], lane_pixel)
            cam_pixel = lane_pixel
        nk = rng.ray_keys_fast(base_key, lane_pixel, sample)
        keys = jax.random.wrap_key_data(jnp.where(
            can[:, None], jax.random.key_data(nk),
            jax.random.key_data(keys)))
        rad = tuple(r * (1.0 - can_f) for r in rad)
        thr = tuple(jnp.where(can, 1.0, t) for t in thr)
        depth = jnp.where(can, 0, depth)
        alive = alive | can

        dkeys = rng.mix_depth(keys, depth)
        uniforms = rng.uniform_block(dkeys, n_u + 6)
        new_comps = generate_ray_components(s, frame, cam_pixel,
                                            uniforms[:, n_u:n_u + 5])
        comps = tuple(jnp.where(can, nc, c)
                      for nc, c in zip(new_comps, comps))

        if use_mega:
            comps, rad, thr, alive, died = bounce_mega_soa(
                scene, s, comps, uniforms, rad, thr, alive)
        else:
            o = jnp.stack(comps[0:3], axis=-1)
            d = jnp.stack(comps[3:6], axis=-1)
            o, d, radiance, throughput, alive, died = bounce(
                scene, s, o, d, comps[6], uniforms,
                jnp.stack(rad, axis=-1), jnp.stack(thr, axis=-1), alive,
                use_pallas=use_pallas)
            comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                     comps[6])
            rad = (radiance[:, 0], radiance[:, 1], radiance[:, 2])
            thr = (throughput[:, 0], throughput[:, 1], throughput[:, 2])
        depth = depth + 1
        capped = alive & (depth >= s.max_depth)
        died = died | capped
        alive = alive & ~capped
        if s.rr_depth is not None:
            thr, alive, died = _russian_roulette(
                s, uniforms[:, n_u + 5], depth, thr, alive, died)

        # --- flush: lane-indexed masked add (scatter-free) ---
        died_f = jnp.where(died, 1.0, 0.0)
        if k_rot == 1:
            acc_r = acc_r + rad[0] * died_f
            acc_g = acc_g + rad[1] * died_f
            acc_b = acc_b + rad[2] * died_f
        else:
            # lane l's chunk-c contribution lands at slot
            # (l + c*stride) % lanes — a fixed shift per chunk c: k
            # masked ROLLS per iteration.  Round 2 replaced these with
            # [k, lanes] per-chunk accumulators (.at[cc].add) claiming
            # rolls pay HBM traffic per iteration; honest value-fetch
            # timing shows the opposite on the chip — rolls 99.1M
            # rays/s vs 56.6M roll-free at rotate_k=8 on the Cornell
            # forward bench (the roll-free "101M" was measured before
            # the value-fetch discipline and was inflated).  The diff
            # wavefront keeps per-chunk accumulators: under scan AD
            # they measured 25% faster there.
            for cc in range(k_rot):
                m = died_f * jnp.where(rot_c == cc, 1.0, 0.0)
                acc_r = acc_r + jnp.roll(rad[0] * m, cc * stride)
                acc_g = acc_g + jnp.roll(rad[1] * m, cc * stride)
                acc_b = acc_b + jnp.roll(rad[2] * m, cc * stride)

        segments = segments + jnp.sum((alive | died).astype(jnp.int32))
        return (acc_r, acc_g, acc_b, comps, rad, thr, alive, sample, depth,
                keys, iters + 1, segments)

    def cond(state):
        alive = state[6]
        sample = state[7]
        return jnp.any(alive | (sample < last_sample))

    z1 = jnp.zeros((lanes,), DTYPE)
    o1 = jnp.ones((lanes,), DTYPE)
    init_keys = rng.ray_keys_fast(base_key, jnp.zeros(lanes, jnp.int32),
                                  jnp.zeros(lanes, jnp.int32))
    state = (
        z1, z1, z1,
        (z1, z1, z1, z1, z1, o1, z1),
        (z1, z1, z1), (o1, o1, o1),
        jnp.zeros((lanes,), bool), init_sample.astype(jnp.int32),
        jnp.zeros((lanes,), jnp.int32), init_keys,
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
    )
    state = jax.lax.while_loop(cond, body, state)
    accs = state[0:3]
    if use_tiles:
        # lane order -> pixel order: one gather per launch
        contrib = jnp.stack(accs, axis=-1)[tile_p2l]
    else:
        contrib = jnp.stack(accs, axis=-1)[:n_pix]
    acc_out = acc + contrib
    if with_stats:
        return acc_out, dict(iterations=state[-2], segments=state[-1],
                             lanes=lanes)
    return acc_out


# Below this many primitive rows the per-iteration intersect is too
# cheap for ray binning to amortize its sort+gather (~5-10 ms at 2^18
# lanes); above it, incoherent wavefronts cost 3.4-7x coherent ones
# (tools/prof_bigmesh_engines.py: 366 vs 107 ms per 2^18 rays at 50k
# rows) and re-sorting wins outright.
SORT_MIN_PRIMS = int(__import__("os").environ.get("RT_SORT_MIN_PRIMS",
                                                  "8192"))


def trace_wavefront_sorted(scene: Scene, s: CameraSettings, base_key,
                           n_pix: int, spp: int, acc=None,
                           sample_offset: int = 0,
                           with_stats: bool = False,
                           pixel_offset=0):
    """Ray-binned persistent WORK-QUEUE wavefront for mesh-scale scenes.

    Two ideas on top of :func:`trace_wavefront_stationary`:

    * **Ray binning** — the lane ORDER is re-sorted every iteration by
      (direction octant, quantized origin cell): after one bounce a
      wavefront is incoherent, and the dense kernels' block/row
      consensus only fires when the rays of a kernel block agree
      spatially (measured: 122 -> 83 ms/iter on bigmesh).  The
      permutation applies as ONE packed [C, R] take per dtype (17
      separate gathers measured 61 ms/iter vs 4 ms packed).
    * **Queue regeneration** — dead lanes pull fresh (pixel, sample)
      work items from a global counter instead of being bound to one
      pixel, so occupancy stays ~1 until the whole budget drains (the
      pixel-stationary tail measured occupancy 0.26 at spp=4).  The
      per-pixel scatter-add this needs is already paid for by the
      binning, and work items enumerate pixels in 8x128 TILE order so
      freshly regenerated lanes (sorted together at the end) form
      coherent camera-ray rows.

    RNG keys are absolute (pixel, sample): the image equals the other
    drivers' bit-for-bit regardless of lane count or assignment order.
    """
    import os as _os
    lanes = -(-n_pix // LANE_ALIGN) * LANE_ALIGN
    n_u = n_bounce_uniforms(scene)
    frame = camera_frame(s)
    if acc is None:
        acc = jnp.zeros((n_pix, 3), DTYPE)
    use_pallas = pallas_eligible(scene, lanes)
    use_mega = bounce_kernel_eligible(scene, s, lanes, forward_only=True)
    total_work = n_pix * spp

    # loose scene bbox for origin quantization (traced once per compile)
    p = scene.prims
    nn = _n_scan_prims(p)
    ext = jnp.abs(p.e1[:nn]) + jnp.abs(p.e2[:nn])
    blo = jnp.min(p.p0[:nn] - ext, axis=0)
    bhi = jnp.max(p.p0[:nn] + ext, axis=0)
    binv = 1.0 / jnp.maximum(bhi - blo, 1e-6)

    # work item w -> (pixel, sample): pixels enumerate in 8x128 tile
    # order so consecutive fresh lanes form one-tile camera bundles
    l2p_np, _ = _tile_maps(n_pix, s.image_width, n_pix)
    tile_l2p = jnp.asarray(l2p_np)

    import os as _os
    _CELL = int(_os.environ.get("RT_SORT_CELL", "256"))
    # Re-bin every k-th iteration: the permutation is purely a perf
    # hint (RNG keys are absolute (pixel, sample)), and the per-
    # iteration argsort (~12 ms) + packed takes (~4 ms) are the
    # driver's overhead at 2^18 lanes.  Regeneration and the death
    # flush still run EVERY iteration, so occupancy and the estimator
    # are unchanged; only block coherence decays between sorts.
    _SORT_EVERY = int(_os.environ.get("RT_SORT_EVERY", "1"))
    # origin-quantization cells per axis.  The scene bbox includes
    # ground planes etc. far larger than the mesh, so cells must be
    # fine for mesh-surface origins to separate at all: bigmesh
    # end-to-end measured 0.94 / 0.96 / 0.98 M rays/s at 64 / 128 /
    # 256 cells (_spread3 handles up to 10-bit inputs)

    def _spread3(x):
        # interleave 6 bits to every 3rd position (3-D Morton spread)
        x = (x | (x << 16)) & jnp.int32(0x030000FF)
        x = (x | (x << 8)) & jnp.int32(0x0300F00F)
        x = (x | (x << 4)) & jnp.int32(0x030C30C3)
        x = (x | (x << 2)) & jnp.int32(0x09249249)
        return x

    def sort_key(comps, alive):
        ox, oy, oz, dx, dy, dz, _ = comps
        oct_ = ((dx < 0).astype(jnp.int32) * 4
                + (dy < 0).astype(jnp.int32) * 2
                + (dz < 0).astype(jnp.int32))
        q = lambda o, k: jnp.clip(((o - blo[k]) * binv[k]
                                   * _CELL).astype(jnp.int32),
                                  0, _CELL - 1)
        cell = (_spread3(q(ox, 0)) | (_spread3(q(oy, 1)) << 1)
                | (_spread3(q(oz, 2)) << 2))
        live_key = oct_ * (_CELL ** 3) + cell
        # dead lanes sort together at the end (stable, so their queue
        # ranks are consecutive -> consecutive tile-ordered work items)
        dead_key = jnp.int32(1 << 25)
        return jnp.where(alive, live_key, dead_key)

    def sort_perm(comps, alive):
        return jnp.argsort(sort_key(comps, alive), stable=True)

    # Block-granularity rebin (RT_SORT_BLOCKS=1): sort whole 128-lane
    # blocks by their minimum live key instead of every lane.  The
    # argsort shrinks from R to R/128 elements and the takes become
    # whole-tile row gathers (~2-3 ms saved of the ~22 ms sort+take at
    # 360k lanes) at the cost of intra-block coherence, which only the
    # initial camera tiling provides.  Queue regeneration is unaffected
    # (rank = cumsum(dead) never required contiguity; a fully-dead
    # block still receives 128 consecutive tile-ordered work items).
    _SORT_BLOCKS = int(_os.environ.get("RT_SORT_BLOCKS", "0"))

    def rebin(state):
        # --- re-bin lanes (permutation travels with ALL lane state) ---
        # The full (octant, morton-cell) argsort earns its ~12 ms: a
        # cheap 9-bucket octant-only partition (masked cumsums + one
        # packed scatter, ~5 ms) measured bigmesh 0.79 vs 0.95 M rays/s
        # and pawn 19.4 vs 12.0 s — origin-cell coherence is where the
        # kernel consensus money is (round-4 A/B).
        (acc_r, acc_g, acc_b, next_w, comps, rad, thr, alive, lane_pixel,
         sample, depth, iters, segments) = state
        fpack = jnp.stack(comps + rad + thr, axis=0)          # [13, R]
        ipack = jnp.stack(
            [lane_pixel, sample, depth, alive.astype(jnp.int32)], axis=0)
        if _SORT_BLOCKS:
            key = sort_key(comps, alive)
            gb = key.shape[0] // 128
            bperm = jnp.argsort(key.reshape(gb, 128).min(axis=1),
                                stable=True)
            r_tot = key.shape[0]
            fpack = jnp.take(fpack.reshape(13, gb, 128), bperm,
                             axis=1).reshape(13, r_tot)
            ipack = jnp.take(ipack.reshape(4, gb, 128), bperm,
                             axis=1).reshape(4, r_tot)
        else:
            perm = sort_perm(comps, alive)
            fpack = jnp.take(fpack, perm, axis=1)
            ipack = jnp.take(ipack, perm, axis=1)
        comps = tuple(fpack[k] for k in range(7))
        rad = tuple(fpack[7 + k] for k in range(3))
        thr = tuple(fpack[10 + k] for k in range(3))
        lane_pixel = ipack[0]
        sample = ipack[1]
        depth = ipack[2]
        alive = ipack[3].astype(bool)
        return (acc_r, acc_g, acc_b, next_w, comps, rad, thr, alive,
                lane_pixel, sample, depth, iters, segments)

    def step(state):
        (acc_r, acc_g, acc_b, next_w, comps, rad, thr, alive, lane_pixel,
         sample, depth, iters, segments) = state

        # --- queue regeneration: dead lanes pull fresh work ---
        dead = ~alive
        rank = jnp.cumsum(dead.astype(jnp.int32)) - dead.astype(jnp.int32)
        wi = next_w + rank
        can = dead & (wi < total_work)
        can_f = jnp.where(can, 1.0, 0.0)
        w_safe = jnp.minimum(wi, total_work - 1)
        new_pixel = tile_l2p[(w_safe % n_pix).astype(jnp.int32)]
        new_sample = (w_safe // n_pix).astype(jnp.int32) + sample_offset
        lane_pixel = jnp.where(can, new_pixel, lane_pixel)
        sample = jnp.where(can, new_sample, sample)
        depth = jnp.where(can, 0, depth)
        alive = alive | can
        next_w = next_w + jnp.sum(can.astype(jnp.int32))

        keys = rng.ray_keys_fast(base_key, pixel_offset + lane_pixel,
                                 sample)
        dkeys = rng.mix_depth(keys, depth)
        uniforms = rng.uniform_block(dkeys, n_u + 6)
        new_comps = generate_ray_components(
            s, frame, pixel_offset + lane_pixel, uniforms[:, n_u:n_u + 5])
        comps = tuple(jnp.where(can, nc, c)
                      for nc, c in zip(new_comps, comps))
        rad = tuple(r * (1.0 - can_f) for r in rad)
        thr = tuple(jnp.where(can, 1.0, t) for t in thr)

        if use_mega:
            comps, rad, thr, alive, died = bounce_mega_soa(
                scene, s, comps, uniforms, rad, thr, alive)
        else:
            o = jnp.stack(comps[0:3], axis=-1)
            d = jnp.stack(comps[3:6], axis=-1)
            o, d, radiance, throughput, alive, died = bounce(
                scene, s, o, d, comps[6], uniforms,
                jnp.stack(rad, axis=-1), jnp.stack(thr, axis=-1), alive,
                use_pallas=use_pallas)
            comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                     comps[6])
            rad = (radiance[:, 0], radiance[:, 1], radiance[:, 2])
            thr = (throughput[:, 0], throughput[:, 1], throughput[:, 2])
        depth = depth + 1
        capped = alive & (depth >= s.max_depth)
        died = died | capped
        alive = alive & ~capped
        if s.rr_depth is not None:
            thr, alive, died = _russian_roulette(
                s, uniforms[:, n_u + 5], depth, thr, alive, died)

        # --- flush: pixel-indexed scatter-add at death ---
        died_f = jnp.where(died, 1.0, 0.0)
        acc_r = acc_r.at[lane_pixel].add(rad[0] * died_f, mode="drop")
        acc_g = acc_g.at[lane_pixel].add(rad[1] * died_f, mode="drop")
        acc_b = acc_b.at[lane_pixel].add(rad[2] * died_f, mode="drop")

        segments = segments + jnp.sum((alive | died).astype(jnp.int32))
        return (acc_r, acc_g, acc_b, next_w, comps, rad, thr, alive,
                lane_pixel, sample, depth, iters + 1, segments)

    if _SORT_EVERY <= 1:
        def body(state):
            return step(rebin(state))
    else:
        # static unroll (a nested fori_loop would double-buffer the
        # intersect kernel's operands through the loop boundary —
        # measured scoped-VMEM OOM at 2^18 lanes)
        def body(state):
            state = rebin(state)
            for _ in range(_SORT_EVERY):
                state = step(state)
            return state

    def cond(state):
        return jnp.any(state[7]) | (state[3] < total_work)

    z1 = jnp.zeros((lanes,), DTYPE)
    o1 = jnp.ones((lanes,), DTYPE)
    zp = jnp.zeros((n_pix,), DTYPE)
    state = (
        zp, zp, zp, jnp.zeros((), jnp.int32),
        (z1, z1, z1, z1, z1, o1, z1),
        (z1, z1, z1), (o1, o1, o1),
        jnp.zeros((lanes,), bool),
        jnp.zeros((lanes,), jnp.int32),
        jnp.zeros((lanes,), jnp.int32),
        jnp.zeros((lanes,), jnp.int32),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
    )
    state = jax.lax.while_loop(cond, body, state)
    acc_out = acc + jnp.stack(state[0:3], axis=-1)
    if with_stats:
        return acc_out, dict(iterations=state[-2], segments=state[-1],
                             lanes=lanes)
    return acc_out


def _antithetic_maps(cost, k: int):
    """k lane->slot permutations with ~equal per-lane total cost.

    Rank slots by ``cost`` ascending; lane ``l`` serves ranks
    ``l, N-1-l, l+S, N-1-l-S, ...`` (S = N//k shifts keep the k maps
    distinct) — every antithetic rank pair sums to ~2x the mean, so the
    slowest lane's total collapses toward k*mean instead of k*worst.
    Each map is a permutation (every slot served exactly once per
    chunk), so the estimator is exactly the unbalanced one re-ordered.
    Requires even ``k``.

    Measured caveat (tools/prof_completion.py, Cornell spp=64): the
    completion tail there is dominated by per-SAMPLE path-length
    variance (max over 262k lanes of a 64-path sum), which no static
    assignment shrinks — balancing only pays on scenes whose per-pixel
    MEAN cost varies strongly (fog vs sky regions).
    """
    lanes = cost.shape[0]
    srt = jnp.argsort(cost)
    l = jnp.arange(lanes, dtype=jnp.int32)
    maps = []
    for cc in range(k):
        shift = (cc // 2) * (lanes // k)
        if cc % 2 == 0:
            r = (l + shift) % lanes
        else:
            r = (lanes - 1 - l - shift) % lanes
        maps.append(srt[r])
    return maps


def lane_cost_estimate(scene: Scene, s: CameraSettings, base_key,
                       pixel_ids, spp_est: int = 4,
                       sample_offset: int = 1 << 20):
    """Cheap forward per-lane cost signal for antithetic load balancing:
    total bounce iterations consumed by ``spp_est`` samples of each
    lane's pixel (~spp_est x mean path length).  Runs the forward-only
    regenerating wavefront (a while_loop — no AD) on a sample range
    disjoint from any render, so the balanced render shares no
    randomness with its own cost estimate."""
    lanes = pixel_ids.shape[0]
    n_u = n_bounce_uniforms(scene)
    frame = camera_frame(s)
    use_pallas = pallas_eligible(scene, lanes) and scene.bvh is None
    use_mega = bounce_kernel_eligible(scene, s, lanes, forward_only=True)
    last = sample_offset + spp_est - 1

    def body(st):
        cnt, comps, rad, thr, alive, sample, depth = st
        can = ~alive & (sample < last)
        sample = jnp.where(can, sample + 1, sample)
        depth = jnp.where(can, 0, depth)
        alive = alive | can
        keys = rng.ray_keys_fast(base_key, pixel_ids, sample)
        dkeys = rng.mix_depth(keys, depth)
        uniforms = rng.uniform_block(dkeys, n_u + 6)
        nc = generate_ray_components(s, frame, pixel_ids,
                                     uniforms[:, n_u:n_u + 5])
        comps = tuple(jnp.where(can, n, c) for n, c in zip(nc, comps))
        rad = tuple(jnp.where(can, 0.0, x) for x in rad)
        thr = tuple(jnp.where(can, 1.0, x) for x in thr)
        if use_mega:
            comps, rad, thr, alive, died = bounce_mega_soa(
                scene, s, comps, uniforms, rad, thr, alive)
        else:
            o = jnp.stack(comps[0:3], axis=-1)
            d = jnp.stack(comps[3:6], axis=-1)
            o, d, r3, t3, alive, died = bounce(
                scene, s, o, d, comps[6], uniforms,
                jnp.stack(rad, axis=-1), jnp.stack(thr, axis=-1), alive,
                use_pallas=use_pallas)
            comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
                     d[:, 2], comps[6])
            rad = (r3[:, 0], r3[:, 1], r3[:, 2])
            thr = (t3[:, 0], t3[:, 1], t3[:, 2])
        depth = depth + 1
        capped = alive & (depth >= s.max_depth)
        died = died | capped
        alive = alive & ~capped
        if s.rr_depth is not None:
            thr, alive, died = _russian_roulette(
                s, uniforms[:, n_u + 5], depth, thr, alive, died)
        cnt = cnt + (alive | died).astype(jnp.int32)
        return cnt, comps, rad, thr, alive, sample, depth

    def cond(st):
        return jnp.any(st[4] | (st[5] < last))

    z1 = jnp.zeros((lanes,), DTYPE)
    o1 = jnp.ones((lanes,), DTYPE)
    st = (jnp.zeros((lanes,), jnp.int32),
          (z1, z1, z1, z1, z1, o1, z1), (z1, z1, z1), (o1, o1, o1),
          jnp.zeros((lanes,), bool),
          jnp.full((lanes,), sample_offset - 1, jnp.int32),
          jnp.zeros((lanes,), jnp.int32))
    st = jax.lax.while_loop(cond, body, st)
    return st[0].astype(DTYPE)


def _trace_wavefront_diff_fused(scene: Scene, s: CameraSettings, base_key,
                                pixel_ids, spp: int, n_iters: int,
                                sample_offset: int, remat: bool,
                                schedule, interpret: bool = False):
    """Fused-iteration driver for the differentiable wavefront: the
    whole scan body is ONE Pallas kernel (ops/pallas/iter_kernel.py)
    plus the accumulation adds — same estimator and RNG stream as the
    unfused body (the kernel's int32 counter-hash is bit-identical to
    core/rng.py's uint32 stream); camera/shade transcendentals differ
    only in final-ulp lowering.  Carries: (smp, dep, alive, comps(7),
    rad(3), thr(3)) as [G, 128] blocks — no keys carry (recomputed
    in-kernel from absolute (pixel, sample, depth))."""
    from ..diff.fused_iter import fused_iter_step

    lanes = pixel_ids.shape[0]
    last_sample = sample_offset + spp - 1
    step = fused_iter_step(scene, s, base_key, spp, sample_offset,
                           interpret=interpret)

    def pack(pix):
        g = pix.shape[0] // 128
        return pix.astype(jnp.int32).reshape(g, 128)

    def init_carry(w):
        g = w // 128
        z = jnp.zeros((g, 128), DTYPE)
        o = jnp.ones((g, 128), DTYPE)
        zi = jnp.zeros((g, 128), jnp.int32)
        return ((jnp.full((g, 128), sample_offset - 1, jnp.int32), zi, z)
                + (z, z, z, z, z, o, z) + (z, z, z) + (o, o, o))

    def make_body(pix2):
        def body(state):
            acc, done, carry = state
            carry2, died_f = step(pix2, carry)
            rad2 = carry2[10:13]
            acc = tuple(a + r * died_f for a, r in zip(acc, rad2))
            done = done + died_f.astype(jnp.int32)
            return (acc, done, carry2)
        return jax.checkpoint(body) if remat else body

    g0 = lanes // 128
    z0 = jnp.zeros((g0, 128), DTYPE)
    state = ((z0, z0, z0), jnp.zeros((g0, 128), jnp.int32),
             init_carry(lanes))
    body0 = make_body(pack(pixel_ids))
    state = jax.lax.scan(lambda st, _: (body0(st), None), state, None,
                         length=n_iters)[0]

    if schedule:
        acc, done, carry = state
        acc = tuple(a.reshape(lanes) for a in acc)
        done = done.reshape(lanes)
        carry_f = tuple(
            c.reshape(c.shape[0] * 128) for c in carry)
        slot = jnp.arange(lanes, dtype=jnp.int32)
        pix_f = pixel_ids.astype(jnp.int32)
        for it_b, w_b in schedule:
            smp_c, dep_c, al_c = carry_f[0:3]
            unfinished = (al_c > 0.5) | (smp_c < last_sample)
            sel = jnp.argsort(~unfinished)[:w_b]
            slot = slot[sel]
            pix_f = pix_f[sel]
            carry_f = tuple(c[sel] for c in carry_f)
            gb = w_b // 128
            zb = jnp.zeros((gb, 128), DTYPE)
            st_b = ((zb, zb, zb), jnp.zeros((gb, 128), jnp.int32),
                    tuple(c.reshape(gb, 128) for c in carry_f))
            body_b = make_body(pack(pix_f))
            st_b = jax.lax.scan(lambda st, _: (body_b(st), None), st_b,
                                None, length=it_b)[0]
            acc_b, done_b, carry_b = st_b
            acc = tuple(a.at[slot].add(ab.reshape(w_b))
                        for a, ab in zip(acc, acc_b))
            done = done.at[slot].add(done_b.reshape(w_b))
            carry_f = tuple(c.reshape(w_b) for c in carry_b)
        mean = jnp.stack(acc, axis=-1) / jnp.maximum(done, 1)[:, None]
        return mean, done

    acc, done, _ = state
    acc = tuple(a.reshape(lanes) for a in acc)
    done = done.reshape(lanes)
    mean = jnp.stack(acc, axis=-1) / jnp.maximum(done, 1)[:, None]
    return mean, done


def trace_wavefront_diff(scene: Scene, s: CameraSettings, base_key,
                         pixel_ids, spp: int, n_iters: int | None = None,
                         sample_offset: int = 0, remat: bool = True,
                         use_mega: bool | None = None,
                         mega_interpret: bool = False,
                         rotate_k: int = 1,
                         skip_done: bool = False,
                         skip_chunk: int = 16,
                         pixel_cost=None,
                         schedule: tuple | None = None):
    """Differentiable pixel-stationary wavefront.

    Reverse-mode AD cannot cross ``while_loop``, and a fixed
    scan-over-max-depth wastes ~90% of its iterations on dead lanes (mean
    Cornell path length ~3 vs depth 50).  This driver runs the same
    regenerating pixel-stationary scheduler as
    :func:`trace_wavefront_stationary` under a *bounded* ``lax.scan``
    (each iteration rematerialized with ``jax.checkpoint``).

    Megakernel-eligible scenes take the full-bounce Pallas forward with
    the winner-index backward (diff/mega_bounce.py); others use the
    custom-VJP surface hit (Pallas forward, winner-only backward) + XLA
    material math.  ``use_mega`` forces the choice (tests);
    ``mega_interpret`` runs the kernel in interpret mode (CPU tests).

    Returns ``(mean_radiance[P, 3], samples_done[P])``: lanes that run
    out of iterations drop their remaining samples, so the mean is over
    ``samples_done`` (choose ``n_iters`` with slack — default
    ``6 * spp + max_depth`` — and monitor ``samples_done == spp``).

    ``skip_done=True`` wraps each run of ``skip_chunk`` scan iterations
    in a ``lax.cond`` that bypasses the whole bounce once every lane has
    finished its ``spp`` samples.  Measured OFF by default: on the
    current TPU toolchain a cond inside the differentiated scan forces
    state copies/blocks fusion costing ~+22% per LIVE iteration even at
    skip_chunk=16 (tools/prof_completion.py: 0.337s vs 0.277s at
    n_iters=320), which exceeds what the skipped tail saves at any
    realistic bound.  Guaranteed completion instead comes from a plain
    generous ``n_iters`` (Cornell bench: 275 iters for spp=64 under RR,
    frac=1.0).

    ``rotate_k`` (must divide ``spp``): as in
    :func:`trace_wavefront_stationary`, rotate each lane through k
    pixels at a large stride so per-lane total work averages per-pixel
    path-length imbalance — the bounded scan then needs fewer
    iterations for the same completion fraction.  Rolls are linear, so
    gradients flow through unchanged.

    ``schedule``: optional tuple of ``(extra_iters, width)`` pairs — the
    *two-phase completion schedule*.  After the ``n_iters`` full-width
    iterations, the unfinished lanes (still mid-path or with samples
    left to start) are **compacted** into ``width`` lanes (stable
    argsort of the unfinished mask + gather of the whole lane state) and
    the scan continues there for ``extra_iters`` more iterations; each
    phase's radiance lands in phase-local accumulators that are
    scattered back to the original lane slots once per phase.  The
    completion tail is per-SAMPLE path-length variance — the max over
    262k lanes of a 64-path sum — so at bench shapes 99.8% of lanes
    finish by ~185 iterations while guaranteed completion needs 275+:
    running the last ~90+ iterations at 1/8 width cuts the tail's cost
    ~8x without dropping any sample (the compacted lanes carry their
    absolute (pixel, sample) RNG coordinates, so the estimator is
    EXACTLY the single-phase one; only fp add order differs at the
    final scatter).  Requires ``rotate_k == 1`` and ``not skip_done``.
    Monitor ``samples_done``: a phase whose unfinished count exceeds its
    ``width`` drops the overflow lanes' remaining samples.
    """
    lanes = pixel_ids.shape[0]
    if n_iters is None:
        n_iters = 6 * spp + s.max_depth
    if (rotate_k == 1 and not skip_done and pixel_cost is None
            and use_mega is not False):
        from ..diff.fused_iter import fused_iter_eligible
        if fused_iter_eligible(scene, s, lanes,
                               interpret=mega_interpret):
            return _trace_wavefront_diff_fused(
                scene, s, base_key, pixel_ids, spp, n_iters,
                sample_offset, remat, schedule,
                interpret=mega_interpret)
    # keep ONLY raw uint32 key data inside the scan (wrap at use): the
    # extended key dtype as a cond carry/closure breaks JAX's
    # residual-union typing under the skip-done lax.cond's VJP
    base_raw = jax.random.key_data(base_key)
    k_rot = rotate_k if (rotate_k > 1 and spp % rotate_k == 0) else 1
    spp_k = spp // k_rot
    _BLK = 32 * LANE_ALIGN
    stride = max((lanes // k_rot) // _BLK * _BLK, _BLK)
    if k_rot > 1 and stride % lanes == 0:
        stride = max(lanes // k_rot, 1)
    balanced = (pixel_cost is not None and k_rot > 1 and k_rot % 2 == 0)
    if balanced:
        # Cost-balanced antithetic assignment: the scan must run until
        # the SLOWEST lane finishes, and per-pixel mean path length
        # varies ~2x across the image (Cornell: frac=1.0 needs ~4.3*spp
        # iterations vs the 2.2*spp mean).  Rank pixels by a cheap
        # forward cost estimate (lane_cost_estimate) and give each lane
        # antithetic rank pairs (rank i with rank N-1-i), so every
        # lane's k-pixel total is ~exactly k*mean and the completion
        # bound drops toward the mean.
        lane_maps = _antithetic_maps(jax.lax.stop_gradient(pixel_cost),
                                     k_rot)
        pixel_maps = [pixel_ids[m] for m in lane_maps]
        inv_maps = [jnp.argsort(m) for m in lane_maps]
    else:
        pixel_maps = [jnp.roll(pixel_ids, -cc * stride)
                      for cc in range(k_rot)]
    n_u = n_bounce_uniforms(scene)
    frame = camera_frame(s)
    use_pallas = pallas_eligible(scene, lanes) and scene.bvh is None
    if use_mega is None:
        use_mega = bounce_kernel_eligible(scene, s, lanes)
    if n_iters is None:
        n_iters = 6 * spp + s.max_depth
    last_sample = sample_offset + spp - 1

    def make_body(pix_arr):
      def body(state):
        (acc, done, comps, rad, thr, alive, sample, depth, keys) = state

        can = ~alive & (sample < last_sample)
        can_f = jnp.where(can, 1.0, 0.0)
        sample = jnp.where(can, sample + 1, sample)
        if k_rot == 1:
            rot_c = None
            lane_pixel = pix_arr
        else:
            rot_c = jnp.clip(((sample - sample_offset) // spp_k)
                             .astype(jnp.int32), 0, k_rot - 1)
            lane_pixel = pixel_maps[0]
            for cc in range(1, k_rot):
                lane_pixel = jnp.where(rot_c == cc, pixel_maps[cc],
                                       lane_pixel)
        # keys ride the carry as RAW uint32 (extended key dtypes crossing
        # the skip-done lax.cond break JAX's residual-union typing)
        nk = jax.random.key_data(
            rng.ray_keys_fast(jax.random.wrap_key_data(base_raw), lane_pixel, sample))
        keys = jnp.where(can[:, None], nk, keys)
        rad = tuple(x * (1.0 - can_f) for x in rad)
        thr = tuple(jnp.where(can, 1.0, x) for x in thr)
        depth = jnp.where(can, 0, depth)
        alive = alive | can

        dkeys = rng.mix_depth(jax.random.wrap_key_data(keys), depth)
        uniforms = rng.uniform_block(dkeys, n_u + 6)
        new_comps = generate_ray_components(s, frame, lane_pixel,
                                            uniforms[:, n_u:n_u + 5])
        comps = tuple(jnp.where(can, nc, c)
                      for nc, c in zip(new_comps, comps))

        if use_mega:
            from ..diff.mega_bounce import mega_bounce_diff_soa
            comps, contrib, thr, alive, died = mega_bounce_diff_soa(
                scene, s, comps, uniforms, thr, alive,
                interpret=mega_interpret)
            rad = tuple(r + c for r, c in zip(rad, contrib))
        else:
            o = jnp.stack(comps[0:3], axis=-1)
            d = jnp.stack(comps[3:6], axis=-1)
            o, d, rad3, thr3, alive, died = bounce(
                scene, s, o, d, comps[6], uniforms,
                jnp.stack(rad, axis=-1), jnp.stack(thr, axis=-1), alive,
                use_pallas=use_pallas, diff=True)
            comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
                     d[:, 2], comps[6])
            rad = (rad3[:, 0], rad3[:, 1], rad3[:, 2])
            thr = (thr3[:, 0], thr3[:, 1], thr3[:, 2])
        depth = depth + 1
        capped = alive & (depth >= s.max_depth)
        died = died | capped
        alive = alive & ~capped
        if s.rr_depth is not None:
            thr, alive, died = _russian_roulette(
                s, uniforms[:, n_u + 5], depth, thr, alive, died,
                detach=True)

        died_f = jnp.where(died, 1.0, 0.0)
        if k_rot == 1:
            acc = tuple(a + r * died_f for a, r in zip(acc, rad))
            done = done + died.astype(jnp.int32)
        else:
            # contribution of lane l belongs to pixel slot
            # (l + c*stride) % lanes: fixed shift per chunk.  Accumulate
            # into per-chunk SEPARATE carries (a tuple, not a [k, R]
            # buffer: .at[cc].add under scan-AD copies the whole buffer
            # per update — measured 25% slower; and per-iteration
            # jnp.roll moves the array through HBM every iteration —
            # measured 71.8M vs 101M rays/s at rotate_k=8).  The k rolls
            # happen ONCE after the scan.
            acc = list(acc)
            done = list(done)
            for cc in range(k_rot):
                m = (died_f * jnp.where(rot_c == cc, 1.0, 0.0))
                acc[cc] = tuple(a + r * m for a, r in zip(acc[cc], rad))
                done[cc] = done[cc] + m.astype(jnp.int32)
            acc = tuple(acc)
            done = tuple(done)
        return (acc, done, comps, rad, thr, alive, sample, depth,
                keys)
      return body

    body = make_body(pixel_ids)
    z1 = jnp.zeros((lanes,), DTYPE)
    o1 = jnp.ones((lanes,), DTYPE)
    zi = jnp.zeros((lanes,), jnp.int32)
    init_keys = jax.random.key_data(
        rng.ray_keys_fast(base_key, jnp.zeros(lanes, jnp.int32),
                          jnp.zeros(lanes, jnp.int32)))
    if k_rot == 1:
        acc0, done0 = (z1, z1, z1), zi
    else:
        acc0 = tuple((z1, z1, z1) for _ in range(k_rot))
        done0 = tuple(zi for _ in range(k_rot))
    state = (
        acc0, done0,
        (z1, z1, z1, z1, z1, o1, z1),       # o, d (dummy unit z), time
        (z1, z1, z1), (o1, o1, o1),         # radiance, throughput
        jnp.zeros((lanes,), bool),
        jnp.full((lanes,), sample_offset - 1, jnp.int32),
        jnp.zeros((lanes,), jnp.int32), init_keys,
    )
    body_r = jax.checkpoint(body) if remat else body
    if skip_done:
        k_skip = max(1, min(skip_chunk, n_iters))
        n_outer = n_iters // k_skip
        k_rem = n_iters - n_outer * k_skip

        # Skip k_skip iterations at once when every lane is done: the
        # untaken cond branch is genuinely not executed (forward OR
        # backward), and the per-cond state-copy overhead amortizes
        # over the chunk.  A final short chunk of k_rem iterations keeps
        # the total EXACTLY n_iters, so skip_done is a pure semantic
        # no-op vs skip_done=False even when samples don't all complete.
        def make_chunk(k):
            def chunk(st):
                st, _ = jax.lax.scan(lambda s2, _: (body_r(s2), None),
                                     st, None, length=k)
                return st
            return chunk

        def make_stepped(k):
            chunk = make_chunk(k)

            def stepped(st, _):
                go = jnp.any(st[5]) | jnp.any(st[6] < last_sample)
                return jax.lax.cond(go, chunk, lambda s_: s_, st), None
            return stepped

        if n_outer:
            state, _ = jax.lax.scan(make_stepped(k_skip), state, None,
                                    length=n_outer)
        if k_rem:
            state, _ = make_stepped(k_rem)(state, None)
    else:
        state, _ = jax.lax.scan(lambda st, _: (body_r(st), None), state,
                                None, length=n_iters)

    if schedule:
        if k_rot != 1 or skip_done:
            raise ValueError("schedule requires rotate_k=1, skip_done=False")
        acc, done = state[0], state[1]
        carries = state[2:9]                 # comps, rad, thr, alive, sample, depth, keys
        slot = jnp.arange(lanes, dtype=jnp.int32)
        for it_b, w_b in schedule:
            comps_c, rad_c, thr_c, alive_c, sample_c, depth_c, keys_c = carries
            # stable sort: unfinished lanes (key False) first, original
            # order preserved → deterministic compaction
            unfinished = alive_c | (sample_c < last_sample)
            sel = jnp.argsort(~unfinished)[:w_b]
            slot = slot[sel]
            carries = jax.tree_util.tree_map(lambda x: x[sel], carries)
            zb = jnp.zeros((w_b,), DTYPE)
            st_b = ((zb, zb, zb), jnp.zeros((w_b,), jnp.int32)) + carries
            body_b = make_body(pixel_ids[slot])
            body_b = jax.checkpoint(body_b) if remat else body_b
            st_b, _ = jax.lax.scan(lambda st, _: (body_b(st), None), st_b,
                                   None, length=it_b)
            acc = tuple(a.at[slot].add(ab) for a, ab in zip(acc, st_b[0]))
            done = done.at[slot].add(st_b[1])
            carries = st_b[2:9]
        state = (acc, done) + carries

    acc, done = state[0], state[1]
    if k_rot > 1 and balanced:
        # chunk carries -> lane slots: slot s's chunk-cc contribution
        # came from lane inv_maps[cc][s] — one gather per chunk
        acc = tuple(
            sum(acc[cc][ch][inv_maps[cc]] for cc in range(k_rot))
            for ch in range(3))
        done = sum(done[cc][inv_maps[cc]] for cc in range(k_rot))
    elif k_rot > 1:
        # chunk carries -> lane slots: one roll per chunk, post-scan
        acc = tuple(
            sum(jnp.roll(acc[cc][ch], cc * stride) for cc in range(k_rot))
            for ch in range(3))
        done = sum(jnp.roll(done[cc], cc * stride) for cc in range(k_rot))
    mean = jnp.stack(acc, axis=-1) / jnp.maximum(done, 1)[:, None]
    return mean, done
