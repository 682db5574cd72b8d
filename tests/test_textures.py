"""Texture table tests (reference semantics: Texture.hs)."""
import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu.textures.textures import compile_textures, eval_texture


def _eval(textures, ids, pts, uvs):
    table = compile_textures(textures)
    return np.asarray(eval_texture(
        table, jnp.asarray(ids, jnp.int32),
        jnp.asarray(pts, jnp.float32), jnp.asarray(uvs, jnp.float32)))


def test_constant():
    out = _eval([rt.constant_texture([0.2, 0.4, 0.6])], [0, 0],
                np.zeros((2, 3)), np.zeros((2, 2)))
    np.testing.assert_allclose(out, [[0.2, 0.4, 0.6]] * 2, atol=1e-6)


def test_checker_parity():
    # (floor(u*n_u) + floor(v*n_v)) parity (Texture.hs:46-56)
    tex = rt.checker_texture(2, 2, [1, 1, 1], [0, 0, 0])
    uvs = [[0.1, 0.1], [0.6, 0.1], [0.6, 0.6], [0.1, 0.6]]
    out = _eval([tex], [0] * 4, np.zeros((4, 3)), uvs)
    np.testing.assert_allclose(out[:, 0], [1, 0, 1, 0], atol=1e-6)


def test_image_wrap_and_flip():
    # (0,0) is bottom-left; coordinates wrap (Texture.hs:29-43)
    img = np.zeros((2, 2, 3))
    img[0, 0] = [1, 0, 0]  # top-left row 0
    img[1, 1] = [0, 1, 0]  # bottom-right row 1
    tex = rt.image_texture(img)
    uvs = [[0.1, 0.9],   # top-left -> row 0, col 0
           [0.9, 0.1],   # bottom-right -> row 1, col 1
           [1.1, 1.9],   # wraps to same as (0.1, 0.9)
           [-0.9, -0.1]] # negative wrap
    out = _eval([tex], [0] * 4, np.zeros((4, 3)), uvs)
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[3], [1, 0, 0], atol=1e-6)


def test_noise_texture_range_and_lerp():
    tex = rt.noise_texture(2, 2.0, [10, 0, 0], [0, 0, 0], [1, 1, 1])
    pts = np.random.default_rng(0).uniform(-5, 5, (256, 3))
    out = _eval([tex], [0] * 256, pts, np.zeros((256, 2)))
    # fractal depth-2 noise bounded by 1.5*sqrt(3)/2; scaled 0.5/0.8 about 0.5
    assert out.min() >= 0.0 and out.max() <= 1.35
    assert 0.2 < out.mean() < 0.8
    # gray lerp: all channels equal
    np.testing.assert_allclose(out[:, 0], out[:, 1], atol=1e-6)


def test_marble_range():
    tex = rt.marble_texture([0, 0, 1], 4.0)
    pts = np.random.default_rng(1).uniform(-2, 2, (128, 3))
    out = _eval([tex], [0] * 128, pts, np.zeros((128, 2)))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_custom_and_mixed_tables():
    custom = rt.custom_texture(lambda p, uv: p * 2.0)
    const = rt.constant_texture([0.5, 0.5, 0.5])
    pts = np.asarray([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    out = _eval([const, custom], [1, 0], pts, np.zeros((2, 2)))
    np.testing.assert_allclose(out[0], [2.0, 4.0, 6.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.5, 0.5, 0.5], atol=1e-6)


def test_uv_and_solid_wrappers():
    uvtex = rt.uv_texture(lambda uv: jnp.concatenate(
        [uv, jnp.zeros(uv.shape[:-1] + (1,))], -1))
    out = _eval([uvtex], [0], np.zeros((1, 3)), [[0.25, 0.75]])
    np.testing.assert_allclose(out[0], [0.25, 0.75, 0.0], atol=1e-6)
    solid = rt.solid_texture(lambda p: p)
    out = _eval([solid], [0], [[0.1, 0.2, 0.3]], np.zeros((1, 2)))
    np.testing.assert_allclose(out[0], [0.1, 0.2, 0.3], atol=1e-6)


def test_two_images_atlas():
    a = np.full((1, 1, 3), 0.25)
    b = np.full((3, 2, 3), 0.75)
    out = _eval([rt.image_texture(a), rt.image_texture(b)], [0, 1],
                np.zeros((2, 3)), [[0.5, 0.5]] * 2)
    np.testing.assert_allclose(out[0], [0.25] * 3, atol=1e-6)
    np.testing.assert_allclose(out[1], [0.75] * 3, atol=1e-6)
