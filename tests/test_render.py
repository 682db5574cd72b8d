"""Render-driver tests: scheduler equivalence, determinism, progressive
accumulation (the reference's determinism story, SURVEY.md §5, upgraded
to layout invariance)."""
import jax
import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu.core import rng
from raytrace_tpu.render.integrator import (
    trace_wavefront, trace_wavefront_stationary,
)
from raytrace_tpu.render.render import render_accumulate


def _scene():
    return rt.compile_scene(rt.group([
        rt.with_material(rt.lambertian(rt.checker_texture(8, 4, 0.2, 0.9)),
                         rt.sphere([0, 0, -3], 1.0)),
        rt.with_material(rt.mirror(rt.constant_texture(0.8)),
                         rt.parallelogram([-4, -2, -6], [8, 0, 0], [0, 4, 0])),
    ]))


SETTINGS = rt.CameraSettings(image_width=32, aspect_ratio=1.0,
                             samples_per_pixel=4, max_depth=5,
                             background=rt.sky)
N_PIX = 32 * 32


def test_schedulers_agree():
    """Queue and pixel-stationary schedulers trace identical samples."""
    scene = _scene()
    key = rng.base_key(5)
    q = np.asarray(trace_wavefront(scene, SETTINGS, key, N_PIX, 4, 1 << 10))
    st = np.asarray(trace_wavefront_stationary(scene, SETTINGS, key,
                                               N_PIX, 4))
    np.testing.assert_allclose(q, st, atol=1e-4, rtol=1e-4)


def test_stationary_rotation_matches_unrotated():
    """Pixel rotation (stride-rolled lane->pixel maps + masked-roll
    flushes) must reproduce the unrotated image exactly: RNG keys are
    absolute (pixel, sample) coordinates."""
    scene = _scene()
    key = rng.base_key(5)
    base = np.asarray(trace_wavefront_stationary(scene, SETTINGS, key,
                                                 N_PIX, 4))
    for k in (2, 4):
        rot = np.asarray(trace_wavefront_stationary(scene, SETTINGS, key,
                                                    N_PIX, 4, rotate_k=k))
        np.testing.assert_allclose(rot, base, atol=1e-4, rtol=1e-4)


def test_queue_invariant_to_lane_count():
    scene = _scene()
    key = rng.base_key(5)
    a = np.asarray(trace_wavefront(scene, SETTINGS, key, N_PIX, 4, 1 << 9))
    b = np.asarray(trace_wavefront(scene, SETTINGS, key, N_PIX, 4, 1 << 11))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_render_deterministic():
    scene = _scene()
    a = rt.render(scene, SETTINGS, seed=7)
    b = rt.render(scene, SETTINGS, seed=7)
    np.testing.assert_array_equal(a, b)
    c = rt.render(scene, SETTINGS, seed=8)
    assert not np.allclose(a, c)


def test_render_invariant_to_chunking():
    scene = _scene()
    a = rt.render(scene, SETTINGS, seed=7, spp_chunk=1)
    b = rt.render(scene, SETTINGS, seed=7, spp_chunk=4)
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_progressive_accumulate_resume():
    """(sum, count) accumulation is the checkpoint/resume story: two
    2-spp passes equal one 4-spp pass."""
    scene = _scene()
    acc1, n1 = render_accumulate(scene, SETTINGS, seed=7, spp=2)
    acc2, n2 = render_accumulate(scene, SETTINGS, seed=7, spp=2,
                                 acc=acc1, spp_done=n1)
    assert n2 == 4
    full, n4 = render_accumulate(scene, SETTINGS, seed=7, spp=4)
    np.testing.assert_allclose(np.asarray(acc2), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


def test_image_shape_and_range():
    scene = _scene()
    s = SETTINGS.replace(aspect_ratio=16 / 9, image_width=48)
    img = rt.render(scene, s, seed=0)
    assert img.shape == (27, 48, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0


def test_tiled_lane_order_invariant():
    """Tile-ordered lanes (clustered scenes) must produce the same image
    as linear lane order — RNG is keyed on absolute (pixel, sample)."""
    import numpy as np
    import jax.numpy as jnp
    from raytrace_tpu.core import rng as _rng
    from raytrace_tpu.render import integrator as integ

    rng_ = np.random.default_rng(5)
    centers = rng_.uniform(-6, 6, (80, 3))
    world = rt.group([
        rt.with_material(rt.lambertian(rt.constant_texture(0.6)),
                         rt.spheres(centers, rng_.uniform(0.3, 0.8, 80))),
        rt.with_material(rt.light_source(rt.constant_texture(4.0)),
                         rt.parallelogram([-8, 8, -8], [16, 0, 0], [0, 0, 16])),
    ])
    scene = rt.compile_scene(world, accel="dense")
    assert scene.prims.kind.shape[0] >= 65
    s = rt.CameraSettings(image_width=40, samples_per_pixel=4, max_depth=4,
                          background=rt.const_background(0.2))
    n_pix = s.image_width * s.image_height
    key = _rng.base_key(0)
    tiled = integ.trace_wavefront_stationary(scene, s, key, n_pix, 4)
    orig = integ._tile_maps
    try:
        # identity maps = linear lane order
        integ._tile_maps = lambda n, w, l, **kw: (
            np.minimum(np.arange(l, dtype=np.int32), n - 1),
            np.arange(n, dtype=np.int32))
        linear = integ.trace_wavefront_stationary(scene, s, key, n_pix, 4)
    finally:
        integ._tile_maps = orig
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(linear),
                               atol=2e-5, rtol=1e-5)


def test_sorted_wavefront_matches_stationary():
    """trace_wavefront_sorted (ray-binned lane order, scatter flush) must
    produce the SAME accumulator as the pixel-stationary scheduler: RNG
    keys are absolute (pixel, sample), so lane ordering is invisible."""
    from raytrace_tpu.render.integrator import (
        trace_wavefront_sorted, trace_wavefront_stationary,
    )
    scene = _scene()
    key = rng.base_key(9)
    a = trace_wavefront_stationary(scene, SETTINGS, key, N_PIX, 8)
    b = trace_wavefront_sorted(scene, SETTINGS, key, N_PIX, 8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
