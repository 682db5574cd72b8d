"""RNG tests: distribution correctness + shard-invariant determinism."""
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.core import rng


def _keys(n, seed=0):
    return rng.ray_keys(rng.base_key(seed), jnp.arange(n),
                        jnp.zeros(n, jnp.int32))


def test_unit_vector_distribution():
    k = _keys(4096)
    v = np.asarray(rng.unit_vector(k))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # uniform on sphere: mean ~ 0, per-component variance ~ 1/3
    assert np.abs(v.mean(0)).max() < 0.05
    np.testing.assert_allclose(v.var(0), 1 / 3, atol=0.02)


def test_in_unit_disk_distribution():
    k = _keys(4096)
    p = np.asarray(rng.in_unit_disk(k))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # uniform in disk: E[r^2] = 1/2
    assert np.isclose((r ** 2).mean(), 0.5, atol=0.02)


def test_keys_depend_on_coordinates_only():
    # same (pixel, sample) -> same key regardless of batch layout
    a = rng.ray_keys(rng.base_key(7), jnp.asarray([3, 10]), jnp.asarray([1, 2]))
    b = rng.ray_keys(rng.base_key(7), jnp.asarray([10, 5, 3]),
                     jnp.asarray([2, 0, 1]))
    ua = np.asarray(rng.uniform(a))
    ub = np.asarray(rng.uniform(b))
    assert ua[0] == ub[2]  # pixel 3, sample 1
    assert ua[1] == ub[0]  # pixel 10, sample 2


def test_sites_and_depths_differ():
    k = _keys(8)
    u0 = np.asarray(rng.uniform(rng.site(k, 0)))
    u1 = np.asarray(rng.uniform(rng.site(k, 1)))
    d0 = np.asarray(rng.uniform(rng.fold_depth(k, 0)))
    d1 = np.asarray(rng.uniform(rng.fold_depth(k, 1)))
    assert not np.allclose(u0, u1)
    assert not np.allclose(d0, d1)


def test_uniform_range():
    u = np.asarray(rng.uniform(_keys(1024)))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert np.isclose(u.mean(), 0.5, atol=0.03)
