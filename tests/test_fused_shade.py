"""Fused Pallas shade stage vs the XLA shade (interpret mode on CPU).

The fused path (integrator._fused_shade_bounce -> bounce_kernel.
shade_megakernel) consumes a precomputed hit record + medium candidates
and must reproduce the XLA bounce lane-by-lane, including medium
scatter events, deferred rich-texture albedo (image/noise/marble), MIS
redirection, and path kills.
"""
import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu.core import rng
from raytrace_tpu.render.camera import CameraSettings
from raytrace_tpu.render.integrator import (
    _N_BASE_U, _fused_shade_bounce, _surface_hit, bounce,
    fused_shade_eligible, n_bounce_uniforms,
)
from raytrace_tpu.render.volumes import volume_candidates


def _earth():
    rg = np.random.default_rng(42)
    return rg.uniform(0, 1, (16, 32, 3)).astype(np.float32)


def _scene_rich():
    """Rich textures on every diffuse/specular family, const light."""
    mats = [
        rt.lambertian(rt.image_texture(_earth())),
        rt.lambertian(rt.marble_texture([0, 0, 0.05], 4.0)),
        rt.lambertian(rt.noise_texture(4, 2.0, [0, 0, 0],
                                       [0.1, 0.1, 0.2], [0.9, 0.9, 1.0])),
        rt.metal(0.2, rt.image_texture(_earth())),
        rt.light_source(rt.constant_texture([5.0, 4.0, 3.0])),
        rt.dielectric(1.5),
        rt.lambertian(rt.checker_texture(4, 4, [0.2, 0.4, 0.6],
                                         [0.9, 0.8, 0.1])),
    ]
    geoms = []
    rg = np.random.default_rng(1)
    for i, m in enumerate(mats):
        geoms.append(rt.with_material(m, rt.sphere(rg.uniform(-6, 6, 3),
                                                   1.2)))
        geoms.append(rt.with_material(
            mats[(i + 2) % len(mats)],
            rt.parallelogram(rg.uniform(-6, 6, 3), [2, 0, 0], [0, 2, 0.3])))
    return rt.compile_scene(rt.group(geoms), accel="dense")


def _scene_media():
    """pawn/demo2-style media: dielectric shell + isotropic subsurface,
    HG fog box, plus a marble sphere (rich texture + media together)."""
    world = rt.group([
        rt.with_material(rt.dielectric(1.5), rt.sphere([0, 0, -4], 1.5)),
        rt.with_material(rt.isotropic(rt.constant_texture([1.0, 0.1, 0.1])),
                         rt.constant_medium(2.0, rt.sphere([0, 0, -4], 1.5))),
        rt.with_material(rt.anisotropic(0.5, rt.constant_texture(0.8)),
                         rt.constant_medium(
                             0.6, rt.cuboid([2, -2, -6], [5, 1, -2]))),
        rt.with_material(rt.lambertian(rt.marble_texture([0, 0, 0.1], 3.0)),
                         rt.sphere([-3, 0, -5], 1.0)),
        rt.with_material(rt.light_source(rt.constant_texture(4.0)),
                         rt.parallelogram([-2, 5, -6], [4, 0, 0],
                                          [0, 0, 4])),
        rt.with_material(rt.lambertian(rt.constant_texture(0.5)),
                         rt.parallelogram([-20, -3, -20], [40, 0, 0],
                                          [0, 0, 40])),
    ])
    return rt.compile_scene(world, accel="dense")


def _run(scene, s, n=512, seed=0):
    rg = np.random.default_rng(seed)
    o = jnp.asarray(rg.uniform(-7, 7, (n, 3)), jnp.float32)
    d = jnp.asarray(rg.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    time = jnp.asarray(rg.uniform(0, 1, n), jnp.float32)
    keys = rng.ray_keys_fast(rng.base_key(9), jnp.arange(n),
                             jnp.zeros(n, jnp.int32))
    uniforms = rng.uniform_block(keys, n_bounce_uniforms(scene) + 6)
    radiance = jnp.asarray(rg.uniform(0, 0.2, (n, 3)), jnp.float32)
    throughput = jnp.ones((n, 3)) * 0.7
    alive = jnp.asarray(rg.uniform(0, 1, n) < 0.9)

    ref = bounce(scene, s, o, d, time, uniforms, radiance, throughput,
                 alive, use_pallas=False)

    # fused path: same parking + hit + medium fold as bounce(), then the
    # Pallas shade in interpret mode
    o_park = jnp.where(alive[:, None], o, jnp.float32(3e18))
    t_srf, idx, normal, front, uv, mat_id = _surface_hit(
        scene, s, o_park, d, time, False)
    med = None
    if scene.volumes is not None:
        r = n
        tmin = jnp.full((r,), s.t_min, jnp.float32)
        nv = scene.volumes.n_volumes
        u_sc = uniforms[:, _N_BASE_U:_N_BASE_U + nv]
        t_vol, _ = volume_candidates(scene.volumes, o_park, d, time, tmin,
                                     u_sc)
        t_med = jnp.full((r,), jnp.inf, jnp.float32)
        vol_mat = jnp.zeros((r,), mat_id.dtype)
        for v in range(nv):
            better = t_vol[:, v] < t_med
            t_med = jnp.where(better, t_vol[:, v], t_med)
            vol_mat = jnp.where(better, scene.volumes.mat[v], vol_mat)
        med = (t_med, vol_mat)
    fused = _fused_shade_bounce(
        scene, s, o_park, d, uniforms, radiance, throughput, alive,
        t_srf, idx, normal, front, uv, mat_id, med, interpret=True)
    return ref, fused


def _compare(ref, fused, atol=2e-3):
    names = ["o", "d", "radiance", "throughput", "alive", "died"]
    assert (np.asarray(ref[4]) == np.asarray(fused[4])).all(), "alive"
    assert (np.asarray(ref[5]) == np.asarray(fused[5])).all(), "died"
    for i in (0, 1, 2, 3):
        np.testing.assert_allclose(np.asarray(fused[i]),
                                   np.asarray(ref[i]),
                                   atol=atol, rtol=1e-3, err_msg=names[i])


def test_fused_shade_rich_textures():
    scene = _scene_rich()
    s = CameraSettings(background=rt.const_background([0.4, 0.5, 0.6]))
    assert fused_shade_eligible(scene, s)
    _compare(*_run(scene, s, seed=2))


def test_fused_shade_media():
    scene = _scene_media()
    s = CameraSettings(background=rt.const_background(0.3))
    assert fused_shade_eligible(scene, s)
    ref, fused = _run(scene, s, seed=4)
    _compare(ref, fused)


def test_fused_shade_media_with_redirect():
    scene = _scene_media()
    s = CameraSettings(background=rt.const_background(0.2))
    s = s.with_redirect_targets([
        (0.25, [-2, 5, -6], [4, 0, 0], [0, 0, 4]),
    ])
    _compare(*_run(scene, s, seed=6))


def test_fused_shade_rich_light_ineligible():
    """Rich-texture lights would emit the deferred 1.0 albedo in-kernel:
    must be statically rejected."""
    world = rt.group([
        rt.with_material(rt.light_source(rt.marble_texture([0, 0, 0.1], 2.0)),
                         rt.sphere([0, 0, -4], 1.0)),
        rt.with_material(rt.lambertian(rt.constant_texture(0.5)),
                         rt.parallelogram([-5, -2, -8], [10, 0, 0],
                                          [0, 0, 10])),
    ])
    scene = rt.compile_scene(world, accel="dense")
    s = CameraSettings(background=rt.const_background(0.2))
    assert not fused_shade_eligible(scene, s)
