"""Scatter-free image-atlas gradient kernel vs the XLA scatter backward
(interpret mode on CPU): cotangents must agree texel-by-texel."""
import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.ops.pallas.image_grad_kernel import image_grad_pallas
from raytrace_tpu.textures.textures import _image_gather


def _case(n, n_img, h, w, seed):
    rg = np.random.default_rng(seed)
    images = jnp.asarray(rg.uniform(0, 1, (n_img, h, w, 3)), jnp.float32)
    img_id = jnp.asarray(rg.integers(0, n_img, n), jnp.int32)
    j = jnp.asarray(rg.integers(0, h, n), jnp.int32)
    i = jnp.asarray(rg.integers(0, w, n), jnp.int32)
    g = jnp.asarray(rg.normal(size=(n, 3)), jnp.float32)
    return images, img_id, j, i, g


def test_image_grad_matches_scatter():
    for n, n_img, h, w, seed in ((512, 1, 16, 16, 0), (640, 3, 8, 24, 1),
                                 (384, 2, 17, 5, 2)):
        images, img_id, j, i, g = _case(n, n_img, h, w, seed)

        def f(images):
            return images[img_id, j, i]

        _, vjp = jax.vjp(f, images)
        (g_ref,) = vjp(g)
        g_pal = image_grad_pallas(img_id, j, i, g, n_img=n_img, h=h, w=w,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)


def test_image_gather_custom_vjp_end_to_end():
    """_image_gather with the Pallas backward forced must give the same
    value AND gradient as the plain gather."""
    images, img_id, j, i, g = _case(512, 2, 12, 20, 3)

    def loss_ref(images):
        return jnp.sum(images[img_id, j, i] * g)

    def loss_pal(images):
        return jnp.sum(_image_gather(images, img_id, j, i,
                                     force_pallas_bwd=True,
                                     interpret=True) * g)

    v_ref, g_ref = jax.value_and_grad(loss_ref)(images)
    v_pal, g_pal = jax.value_and_grad(loss_pal)(images)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
