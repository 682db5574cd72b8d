"""Image-texture (atlas) gradients: FD-checked and usable for inverse
rendering (VERDICT r1 item 7 / ROADMAP item 5).

The forward atlas lookup is a gather; its backward is a scatter-add into
the atlas.  These tests pin exactness (FD) and that a perturbed texture
is recoverable by gradient descent through the full differentiable
renderer.
"""
import numpy as np
import jax
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu.core import rng as rrng
from raytrace_tpu.render.integrator import trace


def _scene_with_image(atlas):
    light = rt.light_source(rt.constant_texture(4.0))
    world = rt.group([
        rt.with_material(rt.lambertian(rt.image_texture(atlas)),
                         rt.sphere([0, 0, -3], 1.0)),
        rt.with_material(light, rt.parallelogram([-3, 3, -1], [6, 0, 0],
                                                 [0, 0, -4])),
    ])
    return rt.compile_scene(world)


def _probe(scene, n=256, seed=2):
    s = rt.CameraSettings(center=jnp.zeros(3),
                          look_at=jnp.asarray([0.0, 0.0, -3.0]),
                          vfov=0.8, image_width=4, aspect_ratio=1.0,
                          samples_per_pixel=1, max_depth=3,
                          background=rt.const_background(0.1))
    g = np.random.default_rng(seed)
    o = jnp.zeros((n, 3), jnp.float32)
    d = np.asarray([0, 0, -3.0]) + 0.8 * g.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                    jnp.float32)
    time = jnp.zeros((n,), jnp.float32)
    keys = rrng.ray_keys_fast(rrng.base_key(0),
                              jnp.arange(n, dtype=jnp.int32),
                              jnp.zeros(n, jnp.int32))
    return s, o, d, time, keys


def test_image_texture_gradient_matches_fd():
    atlas0 = np.full((8, 16, 3), 0.5, np.float32)
    scene = _scene_with_image(atlas0)
    s, o, d, time, keys = _probe(scene)
    target = jnp.zeros((o.shape[0], 3), jnp.float32)

    def loss(images):
        sc = scene.replace(textures=scene.textures.replace(images=images))
        img = trace(sc, s, o, d, time, keys, differentiable=True)
        return jnp.mean((img - target) ** 2)

    g = jax.grad(loss)(scene.textures.images)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    hot = np.unravel_index(np.argmax(np.abs(g)), g.shape)
    assert abs(g[hot]) > 1e-6  # some texel actually matters
    # central FD on the hottest texel
    eps = 1e-2
    e = jnp.zeros_like(scene.textures.images).at[hot].set(eps)
    fd = (loss(scene.textures.images + e)
          - loss(scene.textures.images - e)) / (2 * eps)
    np.testing.assert_allclose(g[hot], float(fd), rtol=5e-2, atol=1e-7)


def test_image_texture_inverse_rendering_recovers():
    """Perturb a block of atlas texels, then recover it by Adam through
    the differentiable renderer (texture inverse rendering end-to-end)."""
    import optax

    atlas_true = np.full((8, 16, 3), 0.5, np.float32)
    atlas_true[2:5, 4:10] = [0.8, 0.2, 0.3]
    scene = _scene_with_image(atlas_true)
    s, o, d, time, keys = _probe(scene, n=512)
    target = trace(scene, s, o, d, time, keys, differentiable=True)
    target = jax.lax.stop_gradient(target)

    def loss(images):
        sc = scene.replace(textures=scene.textures.replace(images=images))
        img = trace(sc, s, o, d, time, keys, differentiable=True)
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    images = scene.textures.images + jnp.zeros_like(scene.textures.images
                                                    ).at[0, 2:5, 4:10].set(
        jnp.asarray([-0.25, 0.25, 0.2]))
    opt = optax.adam(0.05)
    state = opt.init(images)
    l0, _ = vg(images)
    for _ in range(40):
        l, g = vg(images)
        up, state = opt.update(g, state)
        images = images + up
    l1, _ = vg(images)
    assert float(l1) < 0.2 * float(l0)
    # the perturbed block moved toward truth
    err0 = 0.25
    err1 = float(jnp.abs(
        images[0, 2:5, 4:10] - scene.textures.images[0, 2:5, 4:10]).mean())
    assert err1 < 0.5 * err0
