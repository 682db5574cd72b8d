"""Perlin noise tests (reference semantics: Noise.hs)."""
import numpy as np
import jax.numpy as jnp

from raytrace_tpu.textures.noise import fractal_noise, perlin_noise, turbulence


def _pts(n, seed=0, scale=50.0):
    return jnp.asarray(np.random.default_rng(seed).uniform(-scale, scale, (n, 3)))


def test_range_bound():
    # |noise| <= sqrt(3)/2 (Noise.hs:17-19)
    v = np.asarray(perlin_noise(_pts(2048)))
    assert np.abs(v).max() <= np.sqrt(3) / 2 + 1e-5


def test_zero_at_lattice():
    # gradient noise vanishes at lattice points
    p = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0], [10.0, -5.0, 7.0]])
    np.testing.assert_allclose(perlin_noise(p), 0.0, atol=1e-5)


def test_periodicity_256():
    p = _pts(256, scale=10.0)
    a = np.asarray(perlin_noise(p))
    b = np.asarray(perlin_noise(p + 256.0))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_continuity():
    p = jnp.asarray([[1.5, 2.5, 3.5]])
    eps = 1e-4
    a = float(perlin_noise(p)[0])
    b = float(perlin_noise(p + eps)[0])
    assert abs(a - b) < 1e-2


def test_fractal_octaves():
    p = _pts(64)
    n1 = np.asarray(fractal_noise(1, p))
    np.testing.assert_allclose(n1, np.asarray(perlin_noise(p)), atol=1e-6)
    n2 = np.asarray(fractal_noise(2, p))
    expected = n1 + 0.5 * np.asarray(perlin_noise(p * 2.0))
    np.testing.assert_allclose(n2, expected, atol=1e-5)


def test_turbulence_nonnegative():
    v = np.asarray(turbulence(7, _pts(512)))
    assert v.min() >= 0.0


def test_batch_shapes():
    out = perlin_noise(jnp.zeros((4, 5, 3)))
    assert out.shape == (4, 5)
