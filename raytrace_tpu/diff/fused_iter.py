"""Custom-VJP wrapper for the fused wavefront-iteration megakernel.

Forward: ONE Pallas kernel per scan iteration (ops/pallas/iter_kernel.py)
— regeneration, RNG, camera, bounce, RR and death bookkeeping all in
VMEM; the only XLA ops left in the scan body are the image accumulation
adds.

Backward: the regeneration/RNG/camera stage is DETACHED (sampling) or
LINEAR (selects), so the VJP decomposes exactly as the unfused path's
(diff/mega_bounce.py):

* reconstruct the pre-bounce state in XLA from the saved integer
  coordinates (pixel, sample, depth) — bit-identical RNG recompute,
  ~60 cheap ops that run only in the backward pass;
* replay the bounce + its machine-derived transpose through the
  existing Pallas replay kernel (diff/lane_replay.py:replay_bwd_soa)
  using the saved winner index;
* route the cotangents through the linear regeneration selects by hand
  (where(can, new, old) transposes to a (1 - can) mask).

Residuals per iteration: the 17 input carries + winner index + RR scale
(the unfused path saves 20) — detached sampling discipline unchanged
(stop-gradient on sampled directions, MIS denominators, RR survival).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.vecmath import DTYPE
from ..render.camera import (
    camera_frame, const_background, generate_ray_components, gray_fade, sky,
)
from .gradients import combine, partition

N_CARRY = 17


def background_kind(s):
    """(bg_kind, color) when the kernel can evaluate the background
    in-VMEM; None otherwise (render/camera.py's three shipped
    backgrounds; arbitrary callables take the unfused path)."""
    from ..ops.pallas.iter_kernel import BG_CONST, BG_GRAY, BG_SKY
    import numpy as np
    bg = s.background
    # numpy (NOT jnp): under an outer jit a jnp-built color would be a
    # staged tracer, and closing over it from the custom-VJP backward
    # leaks it into the scan body's jaxpr consts ("No constant handler
    # for DynamicJaxprTracer" at while-lowering)
    if bg is sky:
        return BG_SKY, np.zeros(3, np.float32)
    if bg is gray_fade:
        return BG_GRAY, np.zeros(3, np.float32)
    if getattr(bg, "__qualname__", "").startswith("const_background"):
        cell = bg.__closure__[0].cell_contents
        return BG_CONST, (np.asarray(cell, np.float32)
                          * np.ones(3, np.float32))
    return None


def fused_iter_eligible(scene, s, lanes: int,
                        interpret: bool = False,
                        need_replay: bool = True) -> bool:
    """Static check: can the fused iteration kernel drive the diff
    wavefront (``need_replay=True``: the backward must have a replay
    path) or the forward-only stationary wavefront for this scene?

    The DIFF driver (``need_replay=True``) accepts rich textures via
    albedo deferral — the kernel shades them at 1.0 and the driver
    multiplies the real texel into throughput per iteration
    (:func:`fused_iter_step`); the forward-only driver has no
    per-iteration XLA stage to host the multiply, so it stays
    constant/checker-only."""
    from ..render.integrator import bounce_kernel_eligible
    from .lane_replay import replay_eligible
    import os
    if os.environ.get("RT_NO_FUSED_ITER"):
        return False
    from .lane_replay import replay_pre_eligible
    return (bounce_kernel_eligible(scene, s, lanes, interpret=interpret,
                                   defer_rich=need_replay,
                                   forward_only=not need_replay)
            and (not need_replay or replay_pre_eligible(scene))
            and lanes % 128 == 0
            and background_kind(s) is not None
            and not rng.USE_THREEFRY and rng.USE_PAIR16
            and not scene.prims.sphere_rots)


def fused_iter_step(scene, s, base_key, spp: int, sample_offset: int,
                    interpret: bool = False):
    """Returns ``step(pixel_ids2d, carry) -> carry2`` — one fused
    differentiable wavefront iteration over [G, 128]-packed lane state.

    ``carry`` = (smp i32, dep i32, al f32, comps(7), rad(3), thr(3))
    [the pixel assignment is a closure-free ARG so compacted completion
    phases can re-bind it].  Differentiable w.r.t. every float leaf of
    ``scene`` exactly like the unfused body (same replay backward)."""
    from ..ops.pallas.bounce_kernel import (
        N_U, pack_behaviors, pack_materials, pack_targets,
    )
    from ..ops.pallas.intersect_kernel import pack_clusters, pack_prims
    from ..ops.pallas.iter_kernel import (
        iter_megakernel, pack_cam, pack_kt, resolve_use_ap,
    )
    from ..render.integrator import _n_scan_prims, n_bounce_uniforms
    from ..textures.textures import TEX_CHECKER, TEX_CONSTANT
    from .lane_replay import replay_bwd_soa

    # rich textures (image/noise/marble/custom): the kernel shades them
    # at albedo 1.0 and the step multiplies the real texel into
    # throughput OUTSIDE the custom-VJP boundary — plain differentiable
    # XLA, so atlas/noise-param gradients flow through eval_texture's
    # own backward (scatter-free image_grad_kernel included) and the
    # point chain rides the existing o2 cotangent.  uv feeds only
    # floor()-lookups (Texture.hs:36-56), so its gradient is exactly
    # zero and the kernel's uv outputs stay detached.
    has_rich = not (set(scene.textures.kinds_present)
                    <= {TEX_CONSTANT, TEX_CHECKER})
    params, statics = partition(scene)
    st_dtypes = jax.tree_util.tree_map(lambda x: x.dtype, statics)
    statics_f = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), statics)
    t_min = float(s.t_min)
    has_motion = scene.prims.has_motion
    n_u = n_bounce_uniforms(scene)
    bg_kind, bg_color = background_kind(s)
    last_sample = sample_offset + spp - 1
    rr_depth = None if s.rr_depth is None else int(s.rr_depth)
    max_depth = int(s.max_depth)
    width = int(s.image_width)
    # the key rides through the custom-VJP boundary as an ARG (kt):
    # custom_vjp closures must not capture tracers (diff/mega_bounce.py)
    kt = pack_kt(base_key, last_sample)

    def rebuild(params, statics_f):
        st = jax.tree_util.tree_map(lambda x, dt: x.astype(dt),
                                    statics_f, st_dtypes)
        return combine(params, st)

    def kernel_tables(scene_r):
        m = scene_r.materials
        use_beh = getattr(m, "n_behaviors", 0) > 0
        if use_beh:
            p = scene_r.prims
            tex_ids = m.tex[p.mat]
            is_const = (scene_r.textures.kind[tex_ids]
                        == TEX_CONSTANT)[:, None]
            prim_albedo = jnp.where(is_const,
                                    scene_r.textures.c0[tex_ids], 0.0)
            ptbl = pack_prims(p, mat_override=m.behavior_of[p.mat],
                              albedo=prim_albedo, param=m.param[p.mat])
            mtbl = pack_behaviors(m, scene_r.textures)
            n_mats = m.n_behaviors
        else:
            ptbl = pack_prims(scene_r.prims)
            mtbl = pack_materials(m, scene_r.textures)
            n_mats = m.kind.shape[0]
        ctbl = pack_clusters(scene_r.prims)
        ttbl = pack_targets(s.redirect_prob, s.redirect_q, s.redirect_u,
                            s.redirect_v)
        return ptbl, ctbl, mtbl, ttbl, n_mats, use_beh

    use_ap = resolve_use_ap(_n_scan_prims(scene.prims),
                            scene.prims.kind_segments)

    def run_fwd(params, statics_f, s_in, kt_in, pix2, *carry):
        scene_r = rebuild(params, statics_f)
        ptbl, ctbl, mtbl, ttbl, n_mats, use_beh = kernel_tables(scene_r)
        cam = pack_cam(s_in, camera_frame(s_in), bg_color)
        outs = iter_megakernel(
            ptbl, ctbl, mtbl, ttbl, cam, kt_in, (pix2,) + carry,
            n_prims=_n_scan_prims(scene_r.prims), n_mats=n_mats,
            n_targets=int(s_in.n_redirect), t_min=t_min,
            has_motion=has_motion, use_prim_albedo=use_beh,
            has_box=scene_r.prims.has_box,
            segments=scene_r.prims.kind_segments,
            kinds=scene_r.prims.kinds_present, n_u=n_u,
            rr_depth=rr_depth, max_depth=max_depth, width=width,
            bg_kind=bg_kind, with_uv=has_rich, use_ap=use_ap,
            interpret=interpret)
        # carry2 = (smp, dep, al, comps(7), rad(3), thr(3)) + died_f;
        # residuals = (idx, rr_scale); rich scenes append (uu, vv, idx)
        # outputs for the deferred texel multiply in step()
        carry2 = ((outs[14], outs[15], outs[13]) + tuple(outs[0:7])
                  + tuple(outs[7:10]) + tuple(outs[10:13]) + (outs[16],))
        if has_rich:
            carry2 = carry2 + (outs[19], outs[20], outs[17])
        return carry2, (outs[17], outs[18])

    def _f_bwd_pre(params, statics_f, s_in, kt_in, pix2, ints, comps_i,
                   thr_i, idx2, scale2, cts):
        """Default <= 64-row backward: XLA one-hot gathers/reduces
        around the pre-gathered in-kernel-regen replay kernel."""
        from ..core.vecmath import onehot_rows
        from ..ops.pallas.bounce_bwd_gather_kernel import (
            bounce_bwd_regen_pre_megakernel,
        )
        from ..ops.pallas.bounce_kernel import pack_targets
        from .lane_replay import assemble_scene_grads

        _SG = jax.lax.stop_gradient
        (smp_i, dep_i, al_i) = ints
        scene_r = rebuild(params, statics_f)
        p, m, tx = scene_r.prims, scene_r.materials, scene_r.textures
        n, nm, nt = p.kind.shape[0], m.kind.shape[0], tx.kind.shape[0]
        has_box = p.has_box
        g2 = pix2.shape[0]
        r = g2 * 128
        fl = lambda x: x.reshape(r)
        st = lambda x: x.reshape(g2, 128)
        idx_f = fl(idx2)
        pi = jnp.maximum(idx_f.astype(jnp.int32), 0)
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
        oh_m = _SG(jax.nn.one_hot(mat_f.astype(jnp.int32), nm,
                                  dtype=DTYPE))
        mrows = oh_m @ jnp.concatenate(
            [m.kind.astype(DTYPE)[:, None], m.tex.astype(DTYPE)[:, None],
             m.param[:, None]], axis=1)
        kind_m, tex_f, param = mrows[:, 0], mrows[:, 1], mrows[:, 2]
        oh_t = _SG(jax.nn.one_hot(tex_f.astype(jnp.int32), nt,
                                  dtype=DTYPE))
        trows = oh_t @ jnp.concatenate(
            [tx.kind.astype(DTYPE)[:, None], tx.f0[:, None],
             tx.f1[:, None], tx.c0, tx.c1], axis=1)
        texkind, f0l, f1l = trows[:, 0], trows[:, 1], trows[:, 2]
        c0 = trows[:, 3:6]
        c1 = trows[:, 6:9]
        gath = ([st(_SG(rows[:, k])) for k in range(n_row)]
                + [st(_SG(c0[:, k])) for k in range(3)]
                + [st(_SG(c1[:, k])) for k in range(3)]
                + [st(_SG(param)), st(_SG(kind_p)), st(_SG(kind_m)),
                   st(_SG(texkind)), st(_SG(f0l)), st(_SG(f1l))]
                + [st(_SG(uvr[:, k])) for k in range(6)])
        cam = _SG(pack_cam(s_in, camera_frame(s_in), bg_color))
        ttbl = _SG(pack_targets(s_in.redirect_prob, s_in.redirect_q,
                                s_in.redirect_u, s_in.redirect_v))
        cts13 = tuple(cts[3:10]) + tuple(cts[10:13]) + tuple(cts[13:16])
        g_rows, g_c0, g_c1, g_param, g_comps_in, g_rad_in, g_thr_in = \
            bounce_bwd_regen_pre_megakernel(
                ttbl, kt_in, cam, gath, idx2, (pix2, smp_i, dep_i),
                al_i, comps_i, thr_i, scale2, cts13,
                n_targets=int(s_in.n_redirect), has_motion=has_motion,
                has_box=has_box, t_min=t_min, n_row=n_row, n_u=n_u,
                width=width, bg_kind=bg_kind, interpret=interpret)
        # one-hot-transpose reduces (scatter-free, one matmul each)
        g_ptab = oh_p.T @ jnp.stack([fl(g) for g in g_rows], axis=-1)
        g_tc0 = oh_t.T @ jnp.stack([fl(g) for g in g_c0], axis=-1)
        g_tc1 = oh_t.T @ jnp.stack([fl(g) for g in g_c1], axis=-1)
        g_mparam = fl(g_param) @ oh_m
        g_scene = assemble_scene_grads(
            scene_r, g_ptab[:, 0:3], g_ptab[:, 3:6], g_ptab[:, 6:9],
            g_ptab[:, 9:12] if has_motion else None,
            g_ptab[:, 12:15] if has_motion else None,
            g_mparam, g_tc0, g_tc1)
        g_params = jax.tree_util.tree_map(
            lambda x: x if (hasattr(x, "dtype") and jnp.issubdtype(
                x.dtype, jnp.floating)) else None, g_scene)

        import numpy as np

        def zi(x):
            if jnp.issubdtype(x.dtype, jnp.floating):
                return jnp.zeros_like(x)
            return np.zeros(x.shape, jax.dtypes.float0)

        return ((g_params,
                 jax.tree_util.tree_map(jnp.zeros_like, statics_f),
                 jax.tree_util.tree_map(jnp.zeros_like, s_in),
                 zi(kt_in), zi(pix2), zi(smp_i), zi(dep_i),
                 jnp.zeros_like(al_i))
                + tuple(g_comps_in) + tuple(g_rad_in) + tuple(g_thr_in))

    @jax.custom_vjp
    def f(params, statics_f, s_in, kt_in, pix2, *carry):
        return run_fwd(params, statics_f, s_in, kt_in, pix2, *carry)[0]

    def f_fwd(params, statics_f, s_in, kt_in, pix2, *carry):
        out, res_extra = run_fwd(params, statics_f, s_in, kt_in, pix2,
                                 *carry)
        # rad carries don't enter the backward (pure linear passthrough)
        # — drop them from the per-iteration residual set
        return out, ((params, statics_f, s_in, kt_in, pix2) + carry[0:10]
                     + carry[13:16] + res_extra)

    def f_bwd(res, cts):
        (params, statics_f, s_in, kt_in, pix2) = res[:5]
        (smp_i, dep_i, al_i) = res[5:8]
        comps_i = res[8:15]
        thr_i = res[15:18]
        idx2, scale2 = res[18:]

        import os as _os
        n_prims = scene.prims.kind.shape[0]
        # DEFAULT backward at every eligible scale: XLA one-hot
        # gathers/reduces (one big MXU matmul each — measured faster
        # than take/scatter even at 4,992 rows, ops/diff_intersect.py)
        # around the PRE-GATHERED regen backward kernel — the detached
        # regeneration/RNG/camera stage reconstructs in-kernel from the
        # saved integer coordinates, so the scan backward's XLA stage
        # shrinks to the gathers.  The kernel itself is table-size-
        # independent (replay_pre_eligible caps at the forward's
        # MEGA_MAX_PRIMS).  RT_FUSED_BWD_XLA=1 restores the all-XLA
        # reconstruction path.
        if (not _os.environ.get("RT_FUSED_BWD_XLA")
                and not _os.environ.get("RT_FUSED_BWD_KERNEL")):
            return _f_bwd_pre(params, statics_f, s_in, kt_in, pix2,
                              (smp_i, dep_i, al_i), comps_i, thr_i,
                              idx2, scale2, cts)
        # Opt-in (RT_FUSED_BWD_KERNEL=1): the one-kernel backward's
        # per-row gather/reduce dots are latency-bound at small N —
        # measured 69.9 M vs 91.8 M bench rays/s on Cornell (24 prims)
        # against the XLA-reconstruction path.  Revisit for mesh-scale
        # scenes where the [512, W] chunk dots amortize.
        if _os.environ.get("RT_FUSED_BWD_KERNEL"):
            # ---- one-kernel backward: regen reconstruction + replay
            # transpose + winner reduction all in VMEM ----
            from ..ops.pallas.bounce_bwd_gather_kernel import (
                bounce_bwd_regen_megakernel,
            )
            from ..ops.pallas.bounce_kernel import pack_targets
            from .lane_replay import assemble_scene_grads, build_bwd_tables

            _SG = jax.lax.stop_gradient
            scene_r = rebuild(params, statics_f)
            tbl, mtbl, xtbl, n, n_row, nm, nt = build_bwd_tables(
                _SG(scene_r), has_motion)
            nt_pad = xtbl.shape[0]
            cam = _SG(pack_cam(s_in, camera_frame(s_in), bg_color))
            ttbl = _SG(pack_targets(s_in.redirect_prob, s_in.redirect_q,
                                    s_in.redirect_u, s_in.redirect_v))
            # UNCLAMPED winner index: the in-kernel one-hots match
            # nothing at -1 (zero rows / zero grads) and the hashit
            # flag needs the miss sentinel
            bi = idx2
            cts13 = tuple(cts[3:10]) + tuple(cts[10:13]) \
                + tuple(cts[13:16])
            g_comps_in, g_rad_in, g_thr_in, g_tbl, g_mat, g_tex = \
                bounce_bwd_regen_megakernel(
                    ttbl, kt_in, cam, tbl, mtbl, xtbl, bi,
                    (pix2, smp_i, dep_i), al_i, comps_i, thr_i, scale2,
                    cts13, n_targets=int(s_in.n_redirect),
                    has_motion=has_motion,
                    has_box=scene_r.prims.has_box, t_min=t_min, n_u=n_u,
                    width=width, bg_kind=bg_kind, interpret=interpret)
            g_ptab = g_tbl[:n]
            g_mparam = jnp.sum(g_mat[:nm], axis=1)
            g_tc0 = jnp.stack(
                [jnp.sum(g_tex[j * nt_pad:j * nt_pad + nt], axis=1)
                 for j in range(3)], axis=-1)
            g_tc1 = jnp.stack(
                [jnp.sum(g_tex[j * nt_pad:j * nt_pad + nt], axis=1)
                 for j in range(3, 6)], axis=-1)
            g_scene = assemble_scene_grads(
                scene_r, g_ptab[:, 0:3], g_ptab[:, 3:6], g_ptab[:, 6:9],
                g_ptab[:, 9:12] if has_motion else None,
                g_ptab[:, 12:15] if has_motion else None,
                g_mparam, g_tc0, g_tc1)
            g_params = jax.tree_util.tree_map(
                lambda x: x if (hasattr(x, "dtype") and jnp.issubdtype(
                    x.dtype, jnp.floating)) else None, g_scene)

            import numpy as np

            def zi(x):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return jnp.zeros_like(x)
                return np.zeros(x.shape, jax.dtypes.float0)

            return ((g_params,
                     jax.tree_util.tree_map(jnp.zeros_like, statics_f),
                     jax.tree_util.tree_map(jnp.zeros_like, s_in),
                     zi(kt_in), zi(pix2), zi(smp_i), zi(dep_i),
                     jnp.zeros_like(al_i))
                    + g_comps_in + g_rad_in + g_thr_in)

        g2 = pix2.shape[0]
        r = g2 * 128
        fl = lambda x: x.reshape(r)
        pixv = fl(pix2)
        smpv = fl(smp_i)
        depv = fl(dep_i)
        alv = fl(al_i) > 0.5
        comps_in = tuple(fl(c) for c in comps_i)
        thr_in = tuple(fl(t) for t in thr_i)
        idx = fl(idx2).astype(jnp.int32)
        scale = fl(scale2)

        # ---- reconstruct the pre-bounce state (detached; backward-only
        # cost — bit-identical RNG/camera recompute) ----
        can = ~alv & (smpv < last_sample)
        can_f = jnp.where(can, 1.0, 0.0)
        smp2 = jnp.where(can, smpv + 1, smpv)
        dep_pre = jnp.where(can, 0, depv)
        alive_pre = alv | can
        base_raw = kt_in[0, 0:2].astype(jnp.uint32)
        keys = rng.ray_keys_fast(
            jax.random.wrap_key_data(base_raw), pixv, smp2)
        dkeys = rng.mix_depth(keys, dep_pre)
        uni = rng.uniform_block(dkeys, n_u + 6)
        scene_d = jax.lax.stop_gradient(rebuild(params, statics_f))
        frame = camera_frame(s_in)
        new_comps = generate_ray_components(
            s_in, frame, pixv, uni[:, n_u:n_u + 5])
        comps_pre = tuple(jnp.where(can, jax.lax.stop_gradient(n), c)
                          for n, c in zip(new_comps, comps_in))
        thr_pre = tuple(jnp.where(can, 1.0, t) for t in thr_in)
        # dead-lane origin nulling, but at 3e9 (not the forward's
        # 3e18): masked-out grads tolerate any value, and 3e18
        # overflows the record math for small-edge rows (NaN via
        # 0 * inf in the transpose)
        far = jnp.float32(3e9)
        comps_pre = tuple(
            jnp.where(alive_pre, c, far) if k < 3 else c
            for k, c in enumerate(comps_pre))

        # ---- cotangents: carry2 layout (smp, dep, al, comps, rad, thr,
        # died) — ints/flags get zero/ignored ----
        ct_comps = tuple(fl(c) for c in cts[3:10])
        ct_rad = tuple(fl(c) for c in cts[10:13])
        ct_thr = tuple(fl(c) for c in cts[13:16])
        # RR: thr2 = thr2_bounce * scale (survival prob detached)
        ct_thr_b = tuple(c * scale for c in ct_thr)
        ct12 = ct_comps[0:6] + ct_rad + ct_thr_b

        scene_r = rebuild(params, statics_f)
        u_cols = tuple(uni[:, k] for k in range(N_U))
        g_scene, g_lane = replay_bwd_soa(
            scene_r, s_in, comps_pre, u_cols, thr_pre, alive_pre, idx,
            ct12, has_motion=has_motion, t_min=t_min, use_pallas=True,
            interpret=interpret)

        # route through the linear regeneration selects
        st = lambda x: x.reshape(g2, 128)
        keep = 1.0 - can_f
        g_comps_in = tuple(st(g * keep) for g in g_lane[0:6]) \
            + (st((g_lane[6] + ct_comps[6]) * keep),)
        g_rad_in = tuple(st(c * keep) for c in ct_rad)
        g_thr_in = tuple(st(g * keep) for g in g_lane[7:10])

        g_params = jax.tree_util.tree_map(
            lambda x: x if (hasattr(x, "dtype") and jnp.issubdtype(
                x.dtype, jnp.floating)) else None, g_scene)

        import numpy as np

        def zi(x):
            # integer primals take float0 cotangents
            if jnp.issubdtype(x.dtype, jnp.floating):
                return jnp.zeros_like(x)
            return np.zeros(x.shape, jax.dtypes.float0)

        return ((g_params,
                 jax.tree_util.tree_map(jnp.zeros_like, statics_f),
                 jax.tree_util.tree_map(jnp.zeros_like, s_in),
                 zi(kt_in), zi(pix2), zi(smp_i), zi(dep_i),
                 jnp.zeros_like(al_i))
                + g_comps_in + g_rad_in + g_thr_in)

    f.defvjp(f_fwd, f_bwd)

    if has_rich:
        from ..core.vecmath import onehot_rows
        from ..textures.textures import (
            TEX_IMAGE, _image_gather, eval_texture,
        )
        n_pr = scene.prims.kind.shape[0]
        # static per-prim texture routing (<= MAX_REPLAY_PRIMS rows by
        # replay_eligible(defer_rich=True))
        tex_of_prim_ids = scene.materials.tex[scene.prims.mat]
        tex_of_prim = scene.textures.kind[tex_of_prim_ids]
        image_only = (set(scene.textures.kinds_present)
                      <= {0, 1, TEX_IMAGE})

        def apply_rich(carry2, uu2, vv2, idxf):
            thr = carry2[13:16]
            g2 = uu2.shape[0]
            r = g2 * 128
            fl = lambda x: x.reshape(r)
            _SGl = jax.lax.stop_gradient
            pi = jnp.maximum(fl(_SGl(idxf)).astype(jnp.int32), 0)
            oh_p = onehot_rows(pi, n_pr)
            live0 = (fl(carry2[2]) > 0.5) & (fl(_SGl(idxf)) >= 0.0)
            if image_only:
                # SoA fast path: per-lane atlas indices computed on 1-D
                # columns ([R, 3]/[R, 2] stacks tile terribly — CLAUDE.md)
                # and ONE flat gather; everything but the texel fetch is
                # a [R, n<=64] one-hot matmul.
                tx = scene.textures
                pstat = jnp.stack(
                    [tex_of_prim.astype(DTYPE),
                     tx.i0[tex_of_prim_ids].astype(DTYPE),
                     tx.image_hw[tx.i0[tex_of_prim_ids], 0].astype(DTYPE),
                     tx.image_hw[tx.i0[tex_of_prim_ids], 1].astype(DTYPE)],
                    axis=-1)                          # [n, 4] static-ish
                lane_stat = oh_p @ pstat
                tkind = lane_stat[:, 0]
                img_f = lane_stat[:, 1]
                h_l = jnp.maximum(lane_stat[:, 2], 1.0)
                w_l = jnp.maximum(lane_stat[:, 3], 1.0)
                rich_l = tkind > 1.5
                uu_l = _SGl(fl(uu2))
                vv_l = _SGl(fl(vv2))
                live = live0 & rich_l
                live_f = jnp.where(live, 1.0, 0.0)
                # non-contributing lanes fetch texel (0, 0): a mostly-
                # constant index stream keeps XLA's per-call gather
                # index handling cheap
                i_l = live_f * jnp.mod(jnp.floor(uu_l * w_l), w_l)
                j_l = live_f * jnp.mod(jnp.floor((1.0 - vv_l) * h_l),
                                       h_l)
                alb = _image_gather(tx.images,
                                    (live_f * img_f).astype(jnp.int32),
                                    j_l.astype(jnp.int32),
                                    i_l.astype(jnp.int32))
                # back to SoA immediately: a [R, 3] array persisting as
                # a scan residual pays ~40x tile write amplification
                # (minor dim 3 in (8, 128) tiles — CLAUDE.md)
                thr2 = tuple(
                    (fl(t) * (1.0 + live_f * (alb[:, k] - 1.0)))
                    .reshape(g2, 128)
                    for k, t in enumerate(thr))
                return carry2[:13] + thr2 + carry2[16:]
            else:
                tid_f = oh_p @ tex_of_prim_ids.astype(DTYPE)
                tkind = oh_p @ tex_of_prim.astype(DTYPE)
                rich_l = tkind > 1.5                # > TEX_CHECKER
                point = jnp.stack([fl(c) for c in carry2[3:6]], axis=-1)
                uv = _SGl(jnp.stack([fl(uu2), fl(vv2)], axis=-1))
                alb = eval_texture(scene.textures,
                                   tid_f.astype(jnp.int32),
                                   point, uv, onehot=True)
            live = live0 & rich_l
            mult = jnp.where(live[:, None], alb, 1.0)
            thr2 = tuple((fl(t) * mult[:, k]).reshape(g2, 128)
                         for k, t in enumerate(thr))
            return carry2[:13] + thr2 + carry2[16:]

        def step(pix2, carry):
            out = f(params, statics_f, s, kt, pix2, *carry)
            carry2 = apply_rich(out[:N_CARRY - 1], out[N_CARRY],
                                out[N_CARRY + 1], out[N_CARRY + 2])
            return carry2, out[N_CARRY - 1]             # carry2, died_f

        return step

    def step(pix2, carry):
        out = f(params, statics_f, s, kt, pix2, *carry)
        return out[:N_CARRY - 1], out[N_CARRY - 1]      # carry2, died_f

    return step


def fused_iter_fwd_step(scene, s, base_key, spp: int, sample_offset: int,
                        interpret: bool = False):
    """Forward-only fused iteration (no custom VJP): the same ONE-kernel
    body for the non-differentiable stationary wavefront
    (render/integrator.py:trace_wavefront_stationary).  Returns
    ``step(pix2, carry) -> (carry2, rad2, died_f)`` over the same
    [G, 128] carry layout as :func:`fused_iter_step`."""
    from ..ops.pallas.bounce_kernel import (
        pack_behaviors, pack_materials, pack_targets,
    )
    from ..ops.pallas.intersect_kernel import pack_clusters, pack_prims
    from ..ops.pallas.iter_kernel import (
        iter_megakernel, pack_cam, pack_kt, resolve_use_ap,
    )
    from ..render.integrator import _n_scan_prims, n_bounce_uniforms
    from ..textures.textures import TEX_CONSTANT

    t_min = float(s.t_min)
    has_motion = scene.prims.has_motion
    n_u = n_bounce_uniforms(scene)
    bg_kind, bg_color = background_kind(s)
    last_sample = sample_offset + spp - 1
    rr_depth = None if s.rr_depth is None else int(s.rr_depth)
    kt = pack_kt(base_key, last_sample)
    m = scene.materials
    use_beh = getattr(m, "n_behaviors", 0) > 0
    if use_beh:
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
    cam = pack_cam(s, camera_frame(s), bg_color)
    use_ap = resolve_use_ap(_n_scan_prims(scene.prims),
                            scene.prims.kind_segments)

    def step(pix2, carry):
        outs = iter_megakernel(
            ptbl, ctbl, mtbl, ttbl, cam, kt, (pix2,) + tuple(carry),
            n_prims=_n_scan_prims(scene.prims), n_mats=n_mats,
            n_targets=int(s.n_redirect), t_min=t_min,
            has_motion=has_motion, use_prim_albedo=use_beh,
            has_box=scene.prims.has_box,
            segments=scene.prims.kind_segments,
            kinds=scene.prims.kinds_present, n_u=n_u, rr_depth=rr_depth,
            max_depth=int(s.max_depth), width=int(s.image_width),
            bg_kind=bg_kind, use_ap=use_ap, interpret=interpret)
        carry2 = ((outs[14], outs[15], outs[13]) + tuple(outs[0:7])
                  + tuple(outs[7:10]) + tuple(outs[10:13]))
        return carry2, tuple(outs[7:10]), outs[16]

    return step
