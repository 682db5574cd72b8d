"""Core math tests (reference semantics: Core.hs)."""
import numpy as np
import jax.numpy as jnp

from raytrace_tpu.core.vecmath import (
    box_from_corners, box_hull, box_join, degrees, in_interval, normalize,
    ray_box_overlaps, ray_box_range, reflect, refract, vcross, vdot0, vnorm,
)


def test_degrees():
    assert np.isclose(degrees(180.0), np.pi)


def test_reflect_mirror():
    # 45-degree incidence on y-up plane
    n = jnp.asarray([0.0, 1.0, 0.0])
    v = normalize(jnp.asarray([1.0, -1.0, 0.0]))
    out = reflect(n, v)
    np.testing.assert_allclose(out, normalize(jnp.asarray([1.0, 1.0, 0.0])),
                               atol=1e-6)


def test_reflect_batched():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(16, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = rng.normal(size=(16, 3))
    out = np.asarray(reflect(jnp.asarray(n), jnp.asarray(v)))
    # reflection preserves norm and flips the normal component
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                               np.linalg.norm(v, axis=-1), rtol=1e-5)
    np.testing.assert_allclose(np.sum(out * n, -1), -np.sum(v * n, -1),
                               rtol=1e-4, atol=1e-5)


def test_refract_snell():
    # straight-on: no bending
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    u = jnp.asarray([[0.0, -1.0, 0.0]])
    out = refract(jnp.asarray([0.5]), jnp.asarray([1.0]), n, u)
    np.testing.assert_allclose(out, u, atol=1e-6)
    # Snell's law at an angle: sin(theta_out) = ratio * sin(theta_in)
    theta_in = 0.5
    u = jnp.asarray([[np.sin(theta_in), -np.cos(theta_in), 0.0]])
    ratio = 1.0 / 1.5
    out = np.asarray(refract(jnp.asarray([ratio]),
                             jnp.asarray([np.cos(theta_in)]), n, u))[0]
    assert np.isclose(np.linalg.norm(out), 1.0, atol=1e-6)
    assert np.isclose(out[0], ratio * np.sin(theta_in), atol=1e-6)
    assert out[1] < 0


def test_interval_open():
    assert bool(in_interval(0.0, 1.0, 0.5))
    assert not bool(in_interval(0.0, 1.0, 0.0))  # open (Core.hs:84)
    assert not bool(in_interval(0.0, 1.0, 1.0))


def test_box_ops():
    lo, hi = box_from_corners(jnp.asarray([1.0, 2.0, 3.0]),
                              jnp.asarray([0.0, 5.0, -1.0]))
    np.testing.assert_allclose(lo, [0.0, 2.0, -1.0])
    np.testing.assert_allclose(hi, [1.0, 5.0, 3.0])
    lo2, hi2 = box_join(lo, hi, jnp.asarray([-1.0, 3.0, 0.0]),
                        jnp.asarray([0.5, 9.0, 0.0]))
    np.testing.assert_allclose(lo2, [-1.0, 2.0, -1.0])
    np.testing.assert_allclose(hi2, [1.0, 9.0, 3.0])
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, -1.0, 2.0], [0.5, 3.0, 1.0]])
    lo3, hi3 = box_hull(pts)
    np.testing.assert_allclose(lo3, [0.0, -1.0, 0.0])
    np.testing.assert_allclose(hi3, [1.0, 3.0, 2.0])


def test_slab_test():
    lo = jnp.asarray([0.0, 0.0, 0.0])
    hi = jnp.asarray([1.0, 1.0, 1.0])
    o = jnp.asarray([[-1.0, 0.5, 0.5], [-1.0, 2.0, 0.5], [0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]] * 3)
    inv = 1.0 / d
    hits = np.asarray(ray_box_overlaps(lo, hi, o, inv, 0.0, np.inf))
    assert hits.tolist() == [True, False, True]  # through, miss, from inside
    t0, t1 = ray_box_range(lo, hi, o[:1], inv[:1], 0.0, np.inf)
    np.testing.assert_allclose(t0, [1.0], atol=1e-6)
    np.testing.assert_allclose(t1, [2.0], atol=1e-6)


def test_slab_axis_parallel_ray():
    # zero direction component: IEEE infs must give correct result
    lo = jnp.asarray([0.0, 0.0, 0.0])
    hi = jnp.asarray([1.0, 1.0, 1.0])
    o = jnp.asarray([[0.5, 0.5, -1.0], [2.0, 0.5, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    inv = 1.0 / d
    hits = np.asarray(ray_box_overlaps(lo, hi, o, inv, 0.0, np.inf))
    assert hits.tolist() == [True, False]


def test_cross_and_norms():
    a = jnp.asarray([1.0, 0.0, 0.0])
    b = jnp.asarray([0.0, 1.0, 0.0])
    np.testing.assert_allclose(vcross(a, b), [0.0, 0.0, 1.0])
    assert np.isclose(vdot0(a, b), 0.0)
    assert np.isclose(vnorm(jnp.asarray([3.0, 4.0, 0.0])), 5.0)
    n = normalize(jnp.asarray([[10.0, 0.0, 0.0], [0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(n[0], [1.0, 0.0, 0.0], atol=1e-6)
    assert np.all(np.isfinite(np.asarray(n[1])))  # safe at zero
