"""Wavefront path-tracing integrator.

The reference integrator is a lazy recursion per ray (``rayColor``,
Ray.hs:174-224).  The TPU-native design (SURVEY.md §3.2, BASELINE
north-star) converts it to an *iterative wavefront*: one big buffer of live
rays advances through a bounded ``lax.while_loop`` over bounce depth,
carrying ``(radiance, throughput, alive)`` — each recursion level
``emitted + weight * child`` becomes ``radiance += throughput * emitted;
throughput *= weight``.  All material logic is evaluated branchlessly with
masked selects over integer material tags; there is no per-ray control
flow anywhere.

Importance-sampled redirection with MIS mixture pdfs follows
Ray.hs:112-151 and 187-224 exactly: CDF target selection, mixture pdf
``remProb * pdf_base + sum probs_i * t_i^2 / |cross_i . dir|``, and the
reference's pdf<=0 path kill (Ray.hs:198).

Differentiability: sampled directions and discrete choices are detached
(they come from RNG); the mixture pdf *denominator* is wrapped in
``stop_gradient`` so gradients flow through BRDF/throughput factors only —
the reparameterized/detached-sampling scheme mandated by the BASELINE
north-star.
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
from .camera import CameraSettings
from .volumes import volume_candidates


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


def trace(scene: Scene, s: CameraSettings, o, d, time, keys):
    """Trace a batch of rays to completion; returns radiance [R, 3].

    ``keys`` are per-ray typed RNG keys (shard-invariant, see core/rng.py).
    """
    r = o.shape[0]
    zeros3 = jnp.zeros((r, 3), DTYPE)

    has_targets = s.n_redirect > 0
    if has_targets:
        probs_sum = jnp.sum(s.redirect_prob)
        rem_prob = 1.0 - probs_sum
        cdf = jnp.cumsum(s.redirect_prob)

    def cond(state):
        depth = state[0]
        alive = state[5]
        return (depth < s.max_depth) & jnp.any(alive)

    def body(state):
        depth, o, d, radiance, throughput, alive, time = state
        dkeys = rng.fold_depth(keys, depth)

        # --- intersect: surface + media (global argmin; SURVEY.md §3.3) ---
        tmin = jnp.full((r,), s.t_min, DTYPE)
        tmax = jnp.full((r,), INF, DTYPE)
        t_srf, idx = nearest_hit_t(scene.prims, scene.bvh, o, d, time,
                                   tmin, tmax)

        if scene.volumes is not None:
            nv = scene.volumes.n_volumes
            u_sc = rng.uniform(rng.site(dkeys, 10), (nv,))
            t_vol, _ = volume_candidates(scene.volumes, o, d, time, tmin, u_sc)
            v_best = jnp.argmin(t_vol, axis=1)
            t_med = jnp.take_along_axis(t_vol, v_best[:, None], 1)[:, 0]
            in_medium = t_med < t_srf
            t_hit = jnp.where(in_medium, t_med, t_srf)
        else:
            in_medium = jnp.zeros((r,), bool)
            t_hit = t_srf

        hit_any = jnp.isfinite(t_hit)

        # --- miss: background (Ray.hs:179) ---
        bg = s.background(o, d).astype(DTYPE)
        miss = alive & ~hit_any
        radiance = radiance + jnp.where(miss[:, None], throughput * bg, 0.0)

        # --- hit record (medium hits: arbitrary normal/uv, Geometry.hs:320-326)
        t_safe = jnp.where(hit_any, t_hit, 1.0)  # keep grads NaN-free on miss
        rec = make_hit_record(scene.prims, idx, o, d, time, t_safe)
        point = o + t_safe[:, None] * d
        normal = rec.normal
        front = rec.front
        uv = rec.uv
        mat_id = rec.mat
        if scene.volumes is not None:
            med = in_medium[:, None]
            normal = jnp.where(med, -d, normal)
            front = jnp.where(in_medium, True, front)
            uv = jnp.where(med, 0.0, uv)
            mat_id = jnp.where(in_medium, scene.volumes.mat[v_best], mat_id)

        kind = scene.materials.kind[mat_id]
        tex_id = scene.materials.tex[mat_id]
        param = scene.materials.param[mat_id]
        albedo = eval_texture(scene.textures, tex_id, point, uv)

        live_hit = alive & hit_any

        # --- emitted (Ray.hs:181-183): only lightSource emits ---
        emitted = jnp.where((kind == MAT_LIGHT)[:, None], albedo, 0.0)
        radiance = radiance + jnp.where(live_hit[:, None],
                                        throughput * emitted, 0.0)

        # --- behaviour classes ---
        is_absorb = (kind == MAT_LIGHT) | (kind == MAT_PITCH_BLACK)
        is_hemi = (kind == MAT_LAMBERTIAN) | (kind == MAT_LOMMEL)
        is_sphr = (kind == MAT_ISOTROPIC) | (kind == MAT_ANISOTROPIC)
        is_spec = (kind == MAT_MIRROR) | (kind == MAT_METAL) | \
                  (kind == MAT_DIELECTRIC) | (kind == MAT_TRANSPARENT)

        # --- specular family (Material.hs:65-112) ---
        refl = reflect(normal, d)
        fuzz_u = rng.unit_vector(rng.site(dkeys, 1))
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
        x_di = rng.uniform(rng.site(dkeys, 2))
        di_reflect = cannot | (x_di < schlick)
        di_dir = jnp.where(di_reflect[:, None], refl,
                           refract(ior_ratio, cos_t, normal, d))

        spec_dir = jnp.where((kind == MAT_MIRROR)[:, None], refl, d)
        spec_dir = jnp.where((kind == MAT_METAL)[:, None], metal_dir, spec_dir)
        spec_dir = jnp.where((kind == MAT_DIELECTRIC)[:, None], di_dir, spec_dir)
        spec_att = jnp.where((kind == MAT_DIELECTRIC)[:, None],
                             jnp.ones_like(albedo), albedo)
        spec_dead = (kind == MAT_METAL) & ~metal_ok

        # --- diffuse family with redirection (Ray.hs:187-224) ---
        cos_dir = normalize(normal + rng.unit_vector(rng.site(dkeys, 3)))
        sph_dir = rng.unit_vector(rng.site(dkeys, 4))
        base_dir = jnp.where(is_hemi[:, None], cos_dir, sph_dir)

        if has_targets:
            x_t = rng.uniform(rng.site(dkeys, 5))
            # CDF threshold selection (Ray.hs:148-151): first target whose
            # cumulative prob exceeds x; none -> base sample.
            t_sel = jnp.sum((x_t[:, None] >= cdf[None, :]).astype(jnp.int32), 1)
            use_target = t_sel < s.n_redirect
            ti = jnp.minimum(t_sel, s.n_redirect - 1)
            ij = rng.uniform(rng.site(dkeys, 6), (2,))
            light_pt = (s.redirect_q[ti]
                        + ij[:, 0:1] * s.redirect_u[ti]
                        + ij[:, 1:2] * s.redirect_v[ti])
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
        alive = next_alive & (alive & hit_any)

        return depth + 1, o_new, d_new, radiance, throughput, alive, time

    state = (
        jnp.zeros((), jnp.int32), o, d, zeros3,
        jnp.ones((r, 3), DTYPE), jnp.ones((r,), bool), time,
    )
    state = jax.lax.while_loop(cond, body, state)
    return state[3]
