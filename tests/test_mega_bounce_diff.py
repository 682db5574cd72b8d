"""Differentiable megakernel bounce (diff/mega_bounce.py) vs the XLA diff
path: same loss, same gradients (interpret mode on CPU).

The custom VJP's backward re-derives the bounce from the saved winner
index, so gradients must match the plain XLA bounce's autodiff exactly
(up to f32 noise and the kernel's polynomial atan2 in sphere uv).
"""
import jax
import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu.core import rng
from raytrace_tpu.diff.gradients import combine, partition
from raytrace_tpu.render.integrator import trace_wavefront_diff


def _scene():
    world = rt.group([
        rt.with_material(rt.lambertian(rt.constant_texture([0.5, 0.3, 0.7])),
                         rt.sphere([0, 0, -3], 1.0)),
        rt.with_material(rt.metal(0.2, rt.constant_texture([0.8, 0.7, 0.6])),
                         rt.sphere([2.2, 0, -3.5], 1.0)),
        rt.with_material(rt.dielectric(1.5),
                         rt.sphere([-2.2, 0, -3.5], 1.0)),
        rt.with_material(
            rt.lambertian(rt.checker_texture(4, 4, [0.2, 0.2, 0.2],
                                             [0.9, 0.9, 0.9])),
            rt.parallelogram([-20, -1.2, -20], [40, 0, 0], [0, 0, 40])),
        rt.with_material(rt.light_source(rt.constant_texture(4.0)),
                         rt.parallelogram([-2, 8, -5], [4, 0, 0],
                                          [0, 0, 4])),
    ])
    return rt.compile_scene(world, accel="dense")


def _settings():
    s = rt.CameraSettings(image_width=16, samples_per_pixel=4, max_depth=5,
                          background=rt.const_background(0.3))
    return s.with_redirect_targets([(0.3, [-2, 8, -5], [4, 0, 0],
                                     [0, 0, 4])])


def _loss_fn(use_mega):
    scene0 = _scene()
    s = _settings()
    _, statics = partition(scene0)
    key = rng.base_key(3)
    pix = jnp.arange(256, dtype=jnp.int32)

    def loss(params):
        scene = combine(params, statics)
        img, done = trace_wavefront_diff(
            scene, s, key, pix, spp=4, n_iters=40, use_mega=use_mega,
            mega_interpret=True)
        return jnp.sum(img ** 2), done

    params, _ = partition(scene0)
    return loss, params


def test_mega_diff_matches_xla_loss_and_grads():
    loss_x, params = _loss_fn(False)
    loss_m, _ = _loss_fn(True)
    (vx, done_x), gx = jax.value_and_grad(loss_x, has_aux=True)(params)
    (vm, done_m), gm = jax.value_and_grad(loss_m, has_aux=True)(params)

    assert (np.asarray(done_x) == np.asarray(done_m)).all()
    np.testing.assert_allclose(float(vx), float(vm), rtol=2e-4)

    leaves_x, treedef = jax.tree_util.tree_flatten(gx)
    leaves_m, _ = jax.tree_util.tree_flatten(gm)
    for lx, lm in zip(leaves_x, leaves_m):
        np.testing.assert_allclose(
            np.asarray(lm), np.asarray(lx), rtol=2e-3, atol=2e-4)


def test_mega_diff_albedo_gradient_matches_fd():
    """FD check through the megakernel custom VJP itself (same RNG both
    sides -> noise-free central difference)."""
    scene0 = _scene()
    s = _settings()
    key = rng.base_key(1)
    pix = jnp.arange(256, dtype=jnp.int32)

    def f(albedo_r):
        c0 = scene0.textures.c0.at[0, 0].set(albedo_r)
        scene = scene0.replace(textures=scene0.textures.replace(c0=c0))
        img, _ = trace_wavefront_diff(scene, s, key, pix, spp=4, n_iters=40,
                                      use_mega=True, mega_interpret=True)
        return jnp.mean(img)

    g_auto = float(jax.grad(f)(jnp.float32(0.5)))
    eps = 1e-2
    g_fd = float((f(0.5 + eps) - f(0.5 - eps)) / (2 * eps))
    assert np.isfinite(g_auto)
    np.testing.assert_allclose(g_auto, g_fd, rtol=0.05)


def test_winner_record_gather_matches_onehot(monkeypatch):
    """Past RT_DIFF_ONEHOT_MAX the winner reconstruction switches from
    the [R, N] one-hot matmul to a direct gather (backward: one row
    scatter-add); gradients must be identical."""
    import numpy as np
    import raytrace_tpu as rt
    from raytrace_tpu.core import rng as _rng
    from raytrace_tpu.diff.gradients import (
        combine, partition, render_loss_wavefront,
    )

    rs = np.random.RandomState(3)
    p0 = rs.uniform(-2, 2, (80, 3))
    tris = [rt.triangle(p, p + [0.3, 0, 0], p + [0, 0.3, 0]) for p in p0]
    world = rt.group([
        rt.with_material(rt.lambertian(rt.constant_texture(0.6)),
                         rt.group(tris)),
        rt.with_material(rt.light_source(rt.constant_texture(3.0)),
                         rt.parallelogram([-3, 4, -3], [6, 0, 0],
                                          [0, 0, 6])),
    ])
    scene = rt.compile_scene(world, accel="dense")
    assert scene.prims.kind.shape[0] > 64   # generic replay fallback
    s = rt.CameraSettings(image_width=32, samples_per_pixel=4,
                          max_depth=4, center=np.asarray([0., 0., 6.]),
                          look_at=np.zeros(3), vfov=0.9,
                          background=rt.const_background(0.3))
    params, statics = partition(scene)
    pix = jnp.arange(1024, dtype=jnp.int32)
    target = jnp.zeros((1024, 3), jnp.float32)
    vg = jax.value_and_grad(render_loss_wavefront, has_aux=True)

    def go():
        return vg(params, statics, s, _rng.base_key(0), pix, target,
                  spp=4, n_iters=20, remat=False)

    monkeypatch.setenv("RT_DIFF_ONEHOT_MAX", "100000")
    (l0, _), g0 = go()
    monkeypatch.setenv("RT_DIFF_ONEHOT_MAX", "16")
    (l1, _), g1 = go()
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        if a is None or not hasattr(a, "dtype"):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
