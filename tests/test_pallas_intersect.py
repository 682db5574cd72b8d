"""Pallas dense megakernel vs XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu.ops.intersect import make_hit_record, nearest_hit_t
from raytrace_tpu.ops.pallas.intersect_kernel import (
    pack_clusters,)
from raytrace_tpu.ops.pallas.intersect_kernel import (
    pack_prims, pallas_nearest_record,
)

M = rt.lambertian(rt.constant_texture(0.5))
M2 = rt.metal(0.1, rt.constant_texture(0.9))


def _mixed_scene(motion=False):
    items = [
        rt.with_material(M, rt.sphere([0, 0, -5], 1.0)),
        rt.with_material(M2, rt.sphere([3, 1, -8], 2.0)),
        rt.with_material(M, rt.parallelogram([-5, -2, -10], [10, 0, 0], [0, 6, 0])),
        rt.with_material(M2, rt.triangle([-2, -2, -3], [2, -2, -3], [0, 2, -3],
                                         uv0=(0, 0), uv1=(1, 0), uv2=(0.3, 0.9))),
        rt.with_material(M, rt.cuboid([4, -4, -6], [6, -2, -4])),
    ]
    if motion:
        items.append(rt.moving([0, 0, 0], [2, 0, 0],
                               rt.with_material(M, rt.sphere([-4, 0, -6], 1.0))))
    return rt.compile_scene(rt.group(items), accel="dense")


def _run_both(scene, n=512, seed=0, t_min=1e-3):
    rng_ = np.random.default_rng(seed)
    o = jnp.asarray(rng_.uniform(-6, 6, (n, 3)), jnp.float32)
    d = jnp.asarray(rng_.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    time = jnp.asarray(rng_.uniform(0, 1, n), jnp.float32)

    # XLA path
    tmin = jnp.full(n, t_min)
    tmax = jnp.full(n, jnp.inf)
    t_ref, i_ref = nearest_hit_t(scene.prims, None, o, d, time, tmin, tmax)
    rec = make_hit_record(scene.prims, i_ref, o, d, time,
                          jnp.where(jnp.isfinite(t_ref), t_ref, 1.0))

    # Pallas kernel (interpret mode for CPU)
    g = n // 128
    resh = lambda x: x.reshape(g, 128)
    tbl = pack_prims(scene.prims)
    ctbl = pack_clusters(scene.prims)
    t, idx, nx, ny, nz, fr, uu, vv, mat = pallas_nearest_record(
        tbl, ctbl, resh(o[:, 0]), resh(o[:, 1]), resh(o[:, 2]),
        resh(d[:, 0]), resh(d[:, 1]), resh(d[:, 2]), resh(time),
        n_prims=scene.prims.kind.shape[0], t_min=t_min,
        has_motion=scene.prims.has_motion, has_box=scene.prims.has_box,
        interpret=True)
    flat = lambda x: np.asarray(x).reshape(n)
    # decode kernel outputs the way _surface_hit does: flags bit0 = front,
    # bit1 = sphere; sphere uv computed from the outward normal host-side
    flags = flat(fr)
    front = (flags & 1).astype(bool)
    is_sphere = (flags & 2) > 0
    normal = np.stack([flat(nx), flat(ny), flat(nz)], -1)
    outward = normal * np.where(front, 1.0, -1.0)[:, None]
    su = np.arctan2(outward[:, 0], outward[:, 2]) / (2 * np.pi) + 0.5
    sv = np.arccos(np.clip(-outward[:, 1], -1 + 1e-6, 1 - 1e-6)) / np.pi
    uv = np.stack([np.where(is_sphere, su, flat(uu)),
                   np.where(is_sphere, sv, flat(vv))], -1)
    return (
        dict(t=np.asarray(t_ref), i=np.asarray(i_ref),
             n=np.asarray(rec.normal), f=np.asarray(rec.front),
             uv=np.asarray(rec.uv), m=np.asarray(rec.mat)),
        dict(t=flat(t), i=flat(idx), n=normal, f=front, uv=uv, m=flat(mat)),
    )


def _compare(ref, pal, t_rtol=2e-5):
    hit = np.isfinite(ref["t"])
    assert (hit == np.isfinite(pal["t"])).all()
    np.testing.assert_allclose(pal["t"][hit], ref["t"][hit], rtol=t_rtol,
                               atol=1e-5)
    assert (pal["i"][hit] == ref["i"][hit]).all()
    assert (pal["m"][hit] == ref["m"][hit]).all()
    assert (pal["f"][hit] == ref["f"][hit]).all()
    np.testing.assert_allclose(pal["n"][hit], ref["n"][hit], rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(pal["uv"][hit], ref["uv"][hit], rtol=1e-3,
                               atol=2e-3)


def test_static_scene_matches():
    scene = _mixed_scene(motion=False)
    ref, pal = _run_both(scene)
    assert np.isfinite(ref["t"]).sum() > 30  # sanity: plenty of hits
    _compare(ref, pal)


def test_motion_scene_matches():
    scene = _mixed_scene(motion=True)
    ref, pal = _run_both(scene, seed=3)
    _compare(ref, pal)


def test_large_scene_many_rays():
    rng_ = np.random.default_rng(1)
    centers = rng_.uniform(-10, 10, (100, 3))
    radii = rng_.uniform(0.3, 1.2, 100)
    scene = rt.compile_scene(
        rt.with_material(M, rt.spheres(centers, radii)), accel="dense")
    ref, pal = _run_both(scene, n=1024, seed=2)
    _compare(ref, pal)


def test_clustered_mixed_motion_matches():
    """> CLUSTER_MIN_PRIMS mixed prims incl. MOVING planar prims: the
    clustered two-phase loop (and the plane-motion handling, which the
    XLA path models via shifted q-dots) must match the XLA oracle."""
    rng_ = np.random.default_rng(7)
    items = []
    for i in range(40):
        c = rng_.uniform(-8, 8, 3)
        items.append(rt.with_material(M, rt.sphere(c, rng_.uniform(0.3, 1.0))))
    for i in range(40):
        q = rng_.uniform(-8, 8, 3)
        u = rng_.uniform(-1.5, 1.5, 3)
        v = rng_.uniform(-1.5, 1.5, 3)
        g = rt.with_material(M2, rt.parallelogram(q, u, v))
        if i % 2 == 0:
            g = rt.moving([0, 0, 0], rng_.uniform(-1, 1, 3), g)
        items.append(g)
    scene = rt.compile_scene(rt.group(items), accel="dense")
    assert scene.prims.kind.shape[0] >= 65  # clustered path engaged
    ref, pal = _run_both(scene, n=1024, seed=3)
    _compare(ref, pal)


def test_segmented_flat_and_clustered_match_oracle():
    """Pin each side of the adaptive block-level choice (FORCE_LOOP) and
    check both the kind-segmented flat one-pass scan and the segmented
    two-phase clustered loop against the XLA oracle on a mixed
    sphere/planar/box motion scene."""
    import raytrace_tpu.ops.pallas.intersect_kernel as ik

    rng_ = np.random.default_rng(11)
    items = []
    for i in range(40):
        c = rng_.uniform(-8, 8, 3)
        items.append(rt.with_material(M, rt.sphere(c, rng_.uniform(0.3, 1.0))))
    for i in range(30):
        q = rng_.uniform(-8, 8, 3)
        g = rt.with_material(M2, rt.parallelogram(
            q, rng_.uniform(-1.5, 1.5, 3), rng_.uniform(-1.5, 1.5, 3)))
        if i % 3 == 0:
            g = rt.moving([0, 0, 0], rng_.uniform(-1, 1, 3), g)
        items.append(g)
    for i in range(10):
        lo = rng_.uniform(-8, 8, 3)
        items.append(rt.with_material(M, rt.cuboid(
            lo, lo + rng_.uniform(0.5, 2.0, 3))))
    scene = rt.compile_scene(rt.group(items), accel="dense")
    assert scene.prims.kind_segments is not None
    assert len(scene.prims.kind_segments) == 3
    try:
        for mode in ("flat", "clustered"):
            ik.FORCE_LOOP = mode
            pallas_nearest_record._clear_cache()
            ref, pal = _run_both(scene, n=1024, seed=5)
            # t_rtol: this scene's wide coordinate range gives a couple
            # of lanes ~4e-5 relative f32 association noise (same winner)
            _compare(ref, pal, t_rtol=2e-4)
    finally:
        ik.FORCE_LOOP = None
        pallas_nearest_record._clear_cache()


def test_moving_parallelogram_single_pass():
    """Moving planar prim in the small-scene single-pass kernel (the
    plane used to ignore motion there)."""
    scene = rt.compile_scene(rt.group([
        rt.with_material(M, rt.moving([0, 0, 0], [3, 0, 0],
            rt.parallelogram([-1, -1, -5], [2, 0, 0], [0, 2, 0]))),
        rt.with_material(M2, rt.sphere([0, 0, -20], 1.0)),
    ]), accel="dense")
    ref, pal = _run_both(scene, n=512, seed=4)
    _compare(ref, pal)


def test_two_level_clustered_matches(monkeypatch):
    """Two-level (group -> cluster) consensus must match the XLA oracle.

    The production thresholds (GROUP_MIN_CLUSTERS=96 -> 6144+ prims) are
    too big for interpret mode, so shrink GROUP/GROUP_MIN_CLUSTERS and
    exercise a ~300-prim mixed kind-segmented scene: several groups per
    segment, segment bounds not group-aligned."""
    import raytrace_tpu.ops.pallas.intersect_kernel as ik
    monkeypatch.setattr(ik, "GROUP", 2)
    monkeypatch.setattr(ik, "GROUP_MIN_CLUSTERS", 2)
    rng_ = np.random.default_rng(11)
    items = []
    for _ in range(150):
        c = rng_.uniform(-12, 12, 3)
        items.append(rt.with_material(M, rt.sphere(c, rng_.uniform(0.3, 1.0))))
    for _ in range(120):
        q = rng_.uniform(-12, 12, 3)
        items.append(rt.with_material(M2, rt.parallelogram(
            q, rng_.uniform(-1.5, 1.5, 3), rng_.uniform(-1.5, 1.5, 3))))
    for _ in range(40):
        lo = rng_.uniform(-12, 12, 3)
        items.append(rt.with_material(M, rt.cuboid(lo, lo + rng_.uniform(0.3, 1.5, 3))))
    scene = rt.compile_scene(rt.group(items), accel="dense")
    assert scene.prims.kind_segments is not None
    ref, pal = _run_both(scene, n=512, seed=13)
    assert np.isfinite(ref["t"]).sum() > 50
    # t tolerance is scene-scale f32 precision (+-12-unit scene measures
    # identical 7.8e-5 max rel error with the single-level loop)
    _compare(ref, pal, t_rtol=2e-4)
