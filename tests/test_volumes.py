"""Constant-medium tests: Beer-Lambert transmission and scattering
(reference semantics: Geometry.hs:298-330)."""
import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu.core import rng
from raytrace_tpu.render.integrator import trace


def _trace(scene, settings, o, d, seed=0):
    n = o.shape[0]
    keys = rng.ray_keys(rng.base_key(seed), jnp.arange(n),
                        jnp.zeros(n, jnp.int32))
    return np.asarray(trace(scene, settings, o, d, jnp.zeros(n), keys))


def _rays_through_center(n):
    o = jnp.tile(jnp.asarray([0.0, 0.0, 5.0]), (n, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))
    return o, d


def test_absorbing_fog_beer_lambert():
    """pitch_black fog ball: transmission = exp(-rho * path_length)."""
    rho = 0.4
    radius = 1.5
    scene = rt.compile_scene(rt.with_material(
        rt.pitch_black(), rt.constant_medium(rho, rt.sphere([0, 0, 0], radius))))
    s = rt.CameraSettings(background=rt.const_background(1.0), max_depth=8)
    n = 4096
    out = _trace(scene, s, *_rays_through_center(n))
    expected = np.exp(-rho * 2 * radius)
    np.testing.assert_allclose(out.mean(), expected, atol=0.02)


def test_ray_starting_inside():
    rho = 0.5
    radius = 2.0
    scene = rt.compile_scene(rt.with_material(
        rt.pitch_black(), rt.constant_medium(rho, rt.sphere([0, 0, 0], radius))))
    s = rt.CameraSettings(background=rt.const_background(1.0), max_depth=8)
    n = 4096
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))
    out = _trace(scene, s, o, d)
    expected = np.exp(-rho * radius)  # path length = radius from center
    np.testing.assert_allclose(out.mean(), expected, atol=0.02)


def test_isotropic_scattering_conserves_energy():
    """White isotropic fog in a unit furnace: scattering is lossless."""
    scene = rt.compile_scene(rt.with_material(
        rt.isotropic(rt.constant_texture(1.0)),
        rt.constant_medium(1.0, rt.sphere([0, 0, 0], 1.0))))
    s = rt.CameraSettings(background=rt.const_background(1.0), max_depth=64)
    n = 2048
    out = _trace(scene, s, *_rays_through_center(n))
    np.testing.assert_allclose(out.mean(), 1.0, atol=0.02)


def test_miss_bbox_no_fog():
    scene = rt.compile_scene(rt.with_material(
        rt.pitch_black(), rt.constant_medium(10.0, rt.sphere([0, 0, 0], 1.0))))
    s = rt.CameraSettings(background=rt.const_background(1.0), max_depth=4)
    n = 64
    o = jnp.tile(jnp.asarray([0.0, 3.0, 5.0]), (n, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))
    out = _trace(scene, s, o, d)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_volume_behind_surface_loses():
    """An opaque wall in front of the fog: fog must not contribute."""
    world = rt.group([
        rt.with_material(rt.light_source(rt.constant_texture([0.0, 1.0, 0.0])),
                         rt.parallelogram([-5, -5, 2], [10, 0, 0], [0, 10, 0])),
        rt.with_material(rt.pitch_black(),
                         rt.constant_medium(50.0, rt.sphere([0, 0, 0], 1.0))),
    ])
    scene = rt.compile_scene(world)
    s = rt.CameraSettings(background=rt.const_background(0.0), max_depth=4)
    n = 32
    o = jnp.tile(jnp.asarray([0.0, 0.0, 5.0]), (n, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))
    out = _trace(scene, s, o, d)
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]] * n, atol=1e-6)


def test_cuboid_boundary_volume():
    """Box-shaped fog (the cornellSmoke setup, test/Main.hs:220-257)."""
    rho = 0.3
    scene = rt.compile_scene(rt.with_material(
        rt.pitch_black(),
        rt.constant_medium(rho, rt.cuboid([-1, -1, -1], [1, 1, 1]))))
    s = rt.CameraSettings(background=rt.const_background(1.0), max_depth=8)
    n = 4096
    out = _trace(scene, s, *_rays_through_center(n))
    np.testing.assert_allclose(out.mean(), np.exp(-rho * 2.0), atol=0.02)


def test_two_volumes_independent():
    rho = 0.3
    world = rt.group([
        rt.with_material(rt.pitch_black(),
                         rt.constant_medium(rho, rt.sphere([0, 0, 2], 0.5))),
        rt.with_material(rt.pitch_black(),
                         rt.constant_medium(rho, rt.sphere([0, 0, -2], 0.5))),
    ])
    scene = rt.compile_scene(world)
    s = rt.CameraSettings(background=rt.const_background(1.0), max_depth=8)
    n = 4096
    out = _trace(scene, s, *_rays_through_center(n))
    np.testing.assert_allclose(out.mean(), np.exp(-rho * 2.0), atol=0.02)
