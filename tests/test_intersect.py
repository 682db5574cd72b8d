"""Intersection engine tests vs closed-form expectations
(reference semantics: Geometry.hs:58-176)."""
import jax.numpy as jnp
import numpy as np
import pytest

import raytrace_tpu as rt
from raytrace_tpu.ops.intersect import (
    dense_nearest, make_hit_record, nearest_hit_t,
)


def _scene(world, **kw):
    return rt.compile_scene(world, **kw)


def _rays(o_list, d_list):
    o = jnp.asarray(o_list, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(d_list, jnp.float32).reshape(-1, 3)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _hit(scene, o, d, tmin=1e-3):
    r = o.shape[0]
    time = jnp.zeros(r)
    t, i = nearest_hit_t(scene.prims, scene.bvh, o, d, time,
                         jnp.full(r, tmin), jnp.full(r, jnp.inf))
    rec = make_hit_record(scene.prims, i, o, d, time, t)
    return t, i, rec


M = rt.lambertian(rt.constant_texture(0.5))


class TestSphere:
    def test_head_on(self):
        s = _scene(rt.with_material(M, rt.sphere([0, 0, -5], 1.0)))
        o, d = _rays([[0, 0, 0]], [[0, 0, -1]])
        t, i, rec = _hit(s, o, d)
        assert np.isclose(float(t[0]), 4.0, atol=1e-5)
        assert int(i[0]) == 0
        np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-5)
        assert bool(rec.front[0])

    def test_from_inside(self):
        s = _scene(rt.with_material(M, rt.sphere([0, 0, 0], 2.0)))
        o, d = _rays([[0, 0, 0]], [[0, 0, -1]])
        t, i, rec = _hit(s, o, d)
        assert np.isclose(float(t[0]), 2.0, atol=1e-5)
        assert not bool(rec.front[0])
        # normal faces the ray (flipped inward)
        np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-5)

    def test_miss(self):
        s = _scene(rt.with_material(M, rt.sphere([0, 0, -5], 1.0)))
        o, d = _rays([[0, 3, 0]], [[0, 0, -1]])
        t, i, _ = _hit(s, o, d)
        assert not np.isfinite(float(t[0]))
        assert int(i[0]) == -1

    def test_interval_excludes_near_root(self):
        # tmin beyond first root picks the far root (Geometry.hs:74-80)
        s = _scene(rt.with_material(M, rt.sphere([0, 0, -5], 1.0)))
        o, d = _rays([[0, 0, 0]], [[0, 0, -1]])
        r = o.shape[0]
        t, i = nearest_hit_t(s.prims, s.bvh, o, d, jnp.zeros(r),
                             jnp.full(r, 4.5), jnp.full(r, jnp.inf))
        assert np.isclose(float(t[0]), 6.0, atol=1e-5)

    def test_uv_poles_and_equator(self):
        # sphereUV (Geometry.hs:100-104): u = atan2(x,z)/2pi + 0.5,
        # v = acos(-y)/pi
        s = _scene(rt.with_material(M, rt.sphere([0, 0, 0], 1.0)))
        o, d = _rays([[0, 0, 5], [0, 5, 0], [5, 0, 0]],
                     [[0, 0, -1], [0, -1, 0], [-1, 0, 0]])
        _, _, rec = _hit(s, o, d)
        uv = np.asarray(rec.uv)
        np.testing.assert_allclose(uv[0], [0.5, 0.5], atol=1e-4)   # +z point
        # north pole (v=1); the grad-safe arccos clamp costs ~5e-4 there
        np.testing.assert_allclose(uv[1][1], 1.0, atol=1e-3)
        np.testing.assert_allclose(uv[2], [0.75, 0.5], atol=1e-4)  # +x point


class TestParallelogram:
    def test_hit_and_uv(self):
        s = _scene(rt.with_material(
            M, rt.parallelogram([0, 0, -2], [2, 0, 0], [0, 2, 0])))
        o, d = _rays([[0.5, 1.0, 0]], [[0, 0, -1]])
        t, i, rec = _hit(s, o, d)
        assert np.isclose(float(t[0]), 2.0, atol=1e-5)
        np.testing.assert_allclose(rec.uv[0], [0.25, 0.5], atol=1e-5)
        # right-hand rule: cross(u,v) = +z; ray going -z hits front
        assert bool(rec.front[0])
        np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-5)

    def test_outside_misses(self):
        s = _scene(rt.with_material(
            M, rt.parallelogram([0, 0, -2], [2, 0, 0], [0, 2, 0])))
        o, d = _rays([[2.5, 1.0, 0], [-0.1, 1.0, 0]],
                     [[0, 0, -1], [0, 0, -1]])
        t, _, _ = _hit(s, o, d)
        assert not np.any(np.isfinite(np.asarray(t)))

    def test_parallel_ray_misses(self):
        s = _scene(rt.with_material(
            M, rt.parallelogram([0, 0, -2], [2, 0, 0], [0, 2, 0])))
        o, d = _rays([[0.5, 0.5, -2]], [[1, 0, 0]])
        t, _, _ = _hit(s, o, d, tmin=1e-6)
        assert not np.isfinite(float(t[0]))

    def test_back_side(self):
        s = _scene(rt.with_material(
            M, rt.parallelogram([0, 0, -2], [2, 0, 0], [0, 2, 0])))
        o, d = _rays([[0.5, 1.0, -4]], [[0, 0, 1]])
        _, _, rec = _hit(s, o, d)
        assert not bool(rec.front[0])
        np.testing.assert_allclose(rec.normal[0], [0, 0, -1], atol=1e-5)


class TestTriangle:
    def test_hit_membership_uv(self):
        s = _scene(rt.with_material(
            M, rt.triangle([0, 0, -2], [2, 0, -2], [0, 2, -2],
                           uv0=(0, 0), uv1=(1, 0), uv2=(0, 1))))
        o, d = _rays([[0.5, 0.5, 0], [1.5, 1.5, 0]],
                     [[0, 0, -1], [0, 0, -1]])
        t, _, rec = _hit(s, o, d)
        assert np.isclose(float(t[0]), 2.0, atol=1e-5)
        assert not np.isfinite(float(t[1]))  # a+b > 1
        np.testing.assert_allclose(rec.uv[0], [0.25, 0.25], atol=1e-5)


class TestCuboid:
    def test_outward_normals(self):
        s = _scene(rt.with_material(M, rt.cuboid([-1, -1, -1], [1, 1, 1])))
        # axis-aligned cuboids compile to ONE slab-test box row (not the
        # reference's 6 parallelograms; see scene/types.py PRIM_BOX)
        assert s.prims.n == 1
        assert s.prims.has_box
        dirs = [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                [0, 0, 1], [0, 0, -1]]
        o = jnp.asarray([[-5.0 * np.asarray(dd)] for dd in dirs],
                        jnp.float32).reshape(-1, 3)
        d = jnp.asarray(dirs, jnp.float32)
        t, _, rec = _hit(s, o, d)
        np.testing.assert_allclose(np.asarray(t), 4.0, atol=1e-4)
        assert np.all(np.asarray(rec.front))
        np.testing.assert_allclose(np.asarray(rec.normal), -d, atol=1e-5)


class TestBoxEquivalence:
    """The single-row slab box must be indistinguishable from the
    reference's 6-parallelogram lowering (Geometry.hs:154-166) in t,
    normal, front flag, and per-face uv."""

    def _pair(self, lo, hi, wrap=lambda g: g):
        import raytrace_tpu.scene.builder as B
        box = _scene(wrap(rt.with_material(M, rt.cuboid(lo, hi))))
        faces = _scene(wrap(rt.with_material(
            M, B.box_faces(np.asarray([lo], np.float64),
                           np.asarray([hi], np.float64)))))
        return box, faces

    def _compare(self, sb, sf, o, d, time=None):
        r = o.shape[0]
        time = jnp.zeros(r) if time is None else time
        for s in (sb, sf):
            assert s.bvh is None
        tb, ib = nearest_hit_t(sb.prims, None, o, d, time,
                               jnp.full(r, 1e-3), jnp.full(r, jnp.inf))
        tf_, if_ = nearest_hit_t(sf.prims, None, o, d, time,
                                 jnp.full(r, 1e-3), jnp.full(r, jnp.inf))
        hit = np.isfinite(np.asarray(tb))
        np.testing.assert_array_equal(hit, np.isfinite(np.asarray(tf_)))
        np.testing.assert_allclose(np.asarray(tb)[hit],
                                   np.asarray(tf_)[hit], rtol=1e-4,
                                   atol=1e-4)
        rb = make_hit_record(sb.prims, ib, o, d, time,
                             jnp.where(jnp.isfinite(tb), tb, 1.0))
        rf = make_hit_record(sf.prims, if_, o, d, time,
                             jnp.where(jnp.isfinite(tf_), tf_, 1.0))
        np.testing.assert_allclose(np.asarray(rb.normal)[hit],
                                   np.asarray(rf.normal)[hit], atol=1e-4)
        np.testing.assert_array_equal(np.asarray(rb.front)[hit],
                                      np.asarray(rf.front)[hit])
        np.testing.assert_allclose(np.asarray(rb.uv)[hit],
                                   np.asarray(rf.uv)[hit], atol=1e-3)

    def test_random_rays_outside_and_inside(self):
        rng = np.random.default_rng(7)
        sb, sf = self._pair([-1.0, -0.5, -2.0], [0.5, 1.5, -0.5])
        o = rng.normal(0, 2.0, (256, 3))
        o[:64] = rng.uniform(-0.4, 0.4, (64, 3)) + [-0.25, 0.5, -1.25]
        d = rng.normal(0, 1, (256, 3))
        o, d = _rays(o, d)
        self._compare(sb, sf, o, d)

    def test_motion(self):
        rng = np.random.default_rng(8)
        wrap = lambda g: rt.moving([0, 0, 0], [1.5, 0.5, 0], g)
        sb, sf = self._pair([-1.0, -1.0, -4.0], [1.0, 1.0, -2.0], wrap)
        assert sb.prims.has_motion and sb.prims.has_box
        o, d = _rays(rng.normal(0, 2.0, (128, 3)), rng.normal(0, 1, (128, 3)))
        time = jnp.asarray(rng.uniform(0, 1, 128), jnp.float32)
        self._compare(sb, sf, o, d, time)

    def test_rotated_cuboid_lowers_to_parallelograms(self):
        s = _scene(rt.transform(
            rt.rotate_y(0.3),
            rt.with_material(M, rt.cuboid([-1, -1, -1], [1, 1, 1]))))
        assert s.prims.n == 6 and not s.prims.has_box

    def test_scaled_translated_cuboid_stays_box(self):
        s = _scene(rt.transform(
            rt.compose(rt.translate([1, 2, 3]), rt.scale(2.0)),
            rt.with_material(M, rt.cuboid([-1, -1, -1], [1, 1, 1]))))
        assert s.prims.n == 1 and s.prims.has_box
        o, d = _rays([[1, 2, 10]], [[0, 0, -1]])
        t, _, rec = _hit(s, o, d)
        # box now [-1,-0,1]*2+shift = lo (-1,0,1), hi (3,4,5); front z face
        # at z=5 -> t = 5
        assert np.isclose(float(t[0]), 5.0, atol=1e-4)
        np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-5)


class TestTransformsAndMotion:
    def test_baked_translation_rotation(self):
        m = rt.compose(rt.translate([0, 0, -5]), rt.rotate_y(np.pi / 2))
        s = _scene(rt.transform(m, rt.with_material(
            M, rt.parallelogram([-1, -1, 0], [2, 0, 0], [0, 2, 0]))))
        # after rotY(90): normal +z -> +x, plane now in yz at x=0, z=-5
        o, d = _rays([[5, 0, -5]], [[-1, 0, 0]])
        t, _, rec = _hit(s, o, d)
        assert np.isclose(float(t[0]), 5.0, atol=1e-4)
        np.testing.assert_allclose(rec.normal[0], [1, 0, 0], atol=1e-5)

    def test_uniform_scale_sphere(self):
        s = _scene(rt.transform(rt.scale(2.0), rt.with_material(
            M, rt.sphere([0, 0, -3], 1.0))))
        o, d = _rays([[0, 0, 0]], [[0, 0, -1]])
        t, _, _ = _hit(s, o, d)
        # center -> (0,0,-6), radius -> 2
        assert np.isclose(float(t[0]), 4.0, atol=1e-4)

    def test_motion_blur(self):
        s = _scene(rt.moving([0, 0, 0], [2, 0, 0], rt.with_material(
            M, rt.sphere([0, 0, -5], 1.0))))
        assert s.prims.has_motion
        o, d = _rays([[0, 0, 0], [2, 0, 0]], [[0, 0, -1], [0, 0, -1]])
        t0, _ = nearest_hit_t(s.prims, s.bvh, o, d, jnp.asarray([0.0, 0.0]),
                              jnp.full(2, 1e-3), jnp.full(2, jnp.inf))
        t1, _ = nearest_hit_t(s.prims, s.bvh, o, d, jnp.asarray([1.0, 1.0]),
                              jnp.full(2, 1e-3), jnp.full(2, jnp.inf))
        assert np.isfinite(float(t0[0])) and not np.isfinite(float(t0[1]))
        assert np.isfinite(float(t1[1])) and not np.isfinite(float(t1[0]))


class TestDenseVsBVH:
    def test_agreement_random_scene(self):
        rng = np.random.default_rng(3)
        centers = rng.uniform(-10, 10, (300, 3))
        radii = rng.uniform(0.2, 1.0, 300)
        world = rt.with_material(M, rt.spheres(centers, radii))
        dense = rt.compile_scene(world, accel="dense")
        accel = rt.compile_scene(world, accel="bvh", leaf_size=4)
        assert accel.bvh is not None
        n = 256
        o = jnp.asarray(rng.uniform(-12, 12, (n, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        time = jnp.zeros(n)
        td, _ = nearest_hit_t(dense.prims, None, o, d, time,
                              jnp.full(n, 1e-3), jnp.full(n, jnp.inf))
        tb, _ = nearest_hit_t(accel.prims, accel.bvh, o, d, time,
                              jnp.full(n, 1e-3), jnp.full(n, jnp.inf))
        td, tb = np.asarray(td), np.asarray(tb)
        finite = np.isfinite(td)
        assert (finite == np.isfinite(tb)).all()
        np.testing.assert_allclose(td[finite], tb[finite], rtol=1e-4)
