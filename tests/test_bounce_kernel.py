"""Full-bounce megakernel vs XLA bounce (interpret mode on CPU).

Both paths consume the same uniform block, so results must agree to f32
tolerance lane-by-lane, including sampled directions, MIS weights and
path kills.
"""
import jax
import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu.core import rng
from raytrace_tpu.render.camera import CameraSettings
from raytrace_tpu.render.integrator import (
    bounce, bounce_mega, n_bounce_uniforms,
)


def _scene_all_materials():
    mats = [
        rt.lambertian(rt.checker_texture(4, 4, [0.2, 0.4, 0.6], [0.9, 0.8, 0.1])),
        rt.mirror(rt.constant_texture([0.9, 0.8, 0.7])),
        rt.metal(0.3, rt.constant_texture([0.8, 0.6, 0.2])),
        rt.dielectric(1.5),
        rt.light_source(rt.constant_texture([5.0, 4.0, 3.0])),
        rt.transparent(rt.constant_texture([0.5, 0.9, 0.5])),
        rt.lommel_seeliger(rt.constant_texture(0.8)),
        rt.pitch_black(),
    ]
    geoms = []
    rg = np.random.default_rng(0)
    for i, m in enumerate(mats):
        c = rg.uniform(-6, 6, 3)
        geoms.append(rt.with_material(m, rt.sphere(c, 1.2)))
        q = rg.uniform(-6, 6, 3)
        geoms.append(rt.with_material(mats[(i + 3) % len(mats)],
                                      rt.parallelogram(q, [2, 0, 0], [0, 2, 0.3])))
    geoms.append(rt.with_material(mats[0],
                                  rt.triangle([-8, -2, -3], [-5, -2, -3], [-6.5, 1, -3])))
    return rt.compile_scene(rt.group(geoms), accel="dense")


def _run(settings, scene, n=512, seed=0):
    rg = np.random.default_rng(seed)
    o = jnp.asarray(rg.uniform(-8, 8, (n, 3)), jnp.float32)
    d = jnp.asarray(rg.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    time = jnp.asarray(rg.uniform(0, 1, n), jnp.float32)
    keys = rng.ray_keys_fast(rng.base_key(7), jnp.arange(n), jnp.zeros(n, jnp.int32))
    uniforms = rng.uniform_block(keys, n_bounce_uniforms(scene))
    radiance = jnp.zeros((n, 3))
    throughput = jnp.ones((n, 3)) * 0.7
    alive = jnp.asarray(rg.uniform(0, 1, n) < 0.9)

    ref = bounce(scene, settings, o, d, time, uniforms, radiance,
                 throughput, alive, use_pallas=False)
    mega = bounce_mega(scene, settings, o, d, time, uniforms, radiance,
                       throughput, alive, interpret=True)
    return ref, mega


def _compare(ref, mega, atol=2e-3):
    names = ["o", "d", "radiance", "throughput", "alive", "died"]
    r_alive = np.asarray(ref[4])
    m_alive = np.asarray(mega[4])
    assert (r_alive == m_alive).all(), "alive mismatch"
    assert (np.asarray(ref[5]) == np.asarray(mega[5])).all(), "died mismatch"
    for i in (0, 1, 2, 3):
        a = np.asarray(ref[i])
        b = np.asarray(mega[i])
        # compare only live lanes for o/d/throughput (dead lanes frozen
        # identically anyway) — radiance everywhere
        np.testing.assert_allclose(b, a, atol=atol, rtol=1e-3,
                                   err_msg=names[i])


def test_bounce_mega_no_targets():
    scene = _scene_all_materials()
    s = CameraSettings(background=rt.const_background([0.5, 0.6, 0.7]))
    ref, mega = _run(s, scene)
    _compare(ref, mega)


def test_bounce_mega_with_targets():
    scene = _scene_all_materials()
    s = CameraSettings(background=rt.const_background(0.2))
    s = s.with_redirect_targets([
        (0.25, [-1, 9, -1], [2, 0, 0], [0, 0, 2]),
        (0.15, [5, 9, 5], [1, 0, 0], [0, 0, 1]),
    ])
    ref, mega = _run(s, scene, seed=3)
    _compare(ref, mega)


def test_bounce_mega_motion():
    M = rt.lambertian(rt.constant_texture(0.5))
    scene = rt.compile_scene(rt.group([
        rt.moving([0, 0, 0], [3, 0, 0],
                  rt.with_material(M, rt.sphere([0, 0, -5], 1.0))),
        rt.with_material(M, rt.parallelogram([-9, -3, -9], [18, 0, 0],
                                             [0, 0, 18])),
    ]), accel="dense")
    s = CameraSettings(background=rt.const_background(1.0))
    ref, mega = _run(s, scene, seed=5)
    _compare(ref, mega)


