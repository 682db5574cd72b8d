"""Pallas volume-crossing kernel vs the XLA chunked scan (interpret mode
on CPU): crossings and scatter candidates must agree lane-by-lane."""
import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu.render.volumes import (
    volume_candidates, volume_candidates_pallas,
)


def _volume_scene():
    """Two media: a sphere fog ball and a cuboid smoke box (6 planes),
    plus a visible surface so the scene compiles."""
    world = rt.group([
        rt.with_material(rt.isotropic(rt.constant_texture(0.8)),
                         rt.constant_medium(0.7, rt.sphere([0, 0, -3], 1.5))),
        rt.with_material(rt.anisotropic(0.4, rt.constant_texture(0.9)),
                         rt.constant_medium(
                             1.2, rt.cuboid([2, -1, -5], [4.5, 1.5, -2]))),
        rt.with_material(rt.lambertian(rt.constant_texture(0.5)),
                         rt.parallelogram([-20, -2, -20], [40, 0, 0],
                                          [0, 0, 40])),
    ])
    return rt.compile_scene(world, accel="dense")


def test_pallas_volume_candidates_match_xla():
    scene = _volume_scene()
    vols = scene.volumes
    assert vols is not None and vols.n_volumes == 2

    rg = np.random.default_rng(0)
    n = 512
    o = jnp.asarray(rg.uniform(-6, 6, (n, 3)), jnp.float32)
    d = jnp.asarray(rg.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # include rays starting inside each medium
    o = o.at[:32].set(jnp.asarray([0.0, 0.0, -3.0]))
    o = o.at[32:64].set(jnp.asarray([3.2, 0.0, -3.5]))
    time = jnp.asarray(rg.uniform(0, 1, n), jnp.float32)
    t_min = jnp.full((n,), 1e-3, jnp.float32)
    u = jnp.asarray(rg.uniform(0, 1, (n, 2)), jnp.float32)

    t_x, v_x = volume_candidates(vols, o, d, time, t_min, u)
    t_p, v_p = volume_candidates_pallas(vols, o, d, time, t_min, u, 1e-3,
                                        interpret=True)
    assert (np.asarray(v_x) == np.asarray(v_p)).all()
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x),
                               rtol=1e-5, atol=1e-5)


def test_bcast_volume_candidates_match_xla():
    """The broadcast crossing kernel (prims on sublanes — the pawn-scale
    engine) must match the XLA scan lane-by-lane, including the
    sub-slice masking of non-aligned volume starts."""
    scene = _volume_scene()
    vols = scene.volumes

    rg = np.random.default_rng(3)
    n = 512
    o = jnp.asarray(rg.uniform(-6, 6, (n, 3)), jnp.float32)
    d = jnp.asarray(rg.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = o.at[:32].set(jnp.asarray([0.0, 0.0, -3.0]))
    o = o.at[32:64].set(jnp.asarray([3.2, 0.0, -3.5]))
    time = jnp.asarray(rg.uniform(0, 1, n), jnp.float32)
    t_min = jnp.full((n,), 1e-3, jnp.float32)
    u = jnp.asarray(rg.uniform(0, 1, (n, 2)), jnp.float32)

    t_x, v_x = volume_candidates(vols, o, d, time, t_min, u)
    t_b, v_b = volume_candidates_pallas(vols, o, d, time, t_min, u, 1e-3,
                                        interpret=True, use_bcast=True)
    assert (np.asarray(v_x) == np.asarray(v_b)).all()
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_x),
                               rtol=1e-5, atol=1e-5)


def test_bcast_volume_mesh_boundary():
    """Non-convex triangle-mesh medium boundary (the pawn configuration):
    broadcast crossings == scalar kernel == XLA scan, with shared-edge
    duplicate crossings collapsed identically."""
    from raytrace_tpu.scene.builder import Mesh

    # a closed octahedron mesh (8 triangles, shared edges everywhere)
    v = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                    [0, 0, 1], [0, 0, -1]], np.float64)
    f = np.asarray([(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
                    (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)], np.int64)
    mesh = Mesh(vertices=v, uv=np.zeros((0, 2)), faces=f,
                uv_faces=np.full((8, 3), -1, np.int64))
    world = rt.group([
        rt.with_material(rt.isotropic(rt.constant_texture([1.0, 0.2, 0.2])),
                         rt.constant_medium(2.0, rt.triangle_mesh(mesh))),
        rt.with_material(rt.lambertian(rt.constant_texture(0.5)),
                         rt.sphere([0, -50, 0], 40.0)),
    ])
    scene = rt.compile_scene(world, accel="dense")
    vols = scene.volumes
    assert vols is not None

    rg = np.random.default_rng(5)
    n = 384
    o = jnp.asarray(rg.uniform(-3, 3, (n, 3)), jnp.float32)
    d = jnp.asarray(rg.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = o.at[:64].set(0.0)  # inside the octahedron
    time = jnp.zeros((n,), jnp.float32)
    t_min = jnp.full((n,), 1e-3, jnp.float32)
    u = jnp.asarray(rg.uniform(0, 1, (n, 1)), jnp.float32)

    t_x, v_x = volume_candidates(vols, o, d, time, t_min, u)
    t_b, v_b = volume_candidates_pallas(vols, o, d, time, t_min, u, 1e-3,
                                        interpret=True, use_bcast=True)
    assert (np.asarray(v_x) == np.asarray(v_b)).all()
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_x),
                               rtol=1e-5, atol=1e-5)
    assert int(np.asarray(v_x).sum()) > 0, "no scatter events exercised"


def test_pallas_volume_candidates_motion():
    """Moving medium boundary: the kernel's motion columns must match."""
    world = rt.group([
        rt.moving([0, 0, 0], [2, 0, 0],
                  rt.with_material(
                      rt.isotropic(rt.constant_texture(0.5)),
                      rt.constant_medium(0.9, rt.sphere([0, 0, -4], 1.0)))),
        rt.with_material(rt.lambertian(rt.constant_texture(0.5)),
                         rt.sphere([0, -50, 0], 40.0)),
    ])
    scene = rt.compile_scene(world, accel="dense")
    vols = scene.volumes
    assert vols is not None and vols.prims.has_motion

    rg = np.random.default_rng(1)
    n = 256
    o = jnp.asarray(rg.uniform(-5, 5, (n, 3)), jnp.float32)
    d = jnp.asarray(rg.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    time = jnp.asarray(rg.uniform(0, 1, n), jnp.float32)
    t_min = jnp.full((n,), 1e-3, jnp.float32)
    u = jnp.asarray(rg.uniform(0, 1, (n, 1)), jnp.float32)

    t_x, v_x = volume_candidates(vols, o, d, time, t_min, u)
    t_p, v_p = volume_candidates_pallas(vols, o, d, time, t_min, u, 1e-3,
                                        interpret=True)
    assert (np.asarray(v_x) == np.asarray(v_p)).all()
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x),
                               rtol=1e-5, atol=1e-5)


def test_bcast_volume_subcluster_level(monkeypatch):
    """A mesh boundary big enough to split into 64-row sub-pieces: the
    second consensus level (round 5, pack_sub_boxes; opt-in
    RT_VOL_SUBC=1 — lost its pawn e2e A/B) must reproduce the XLA scan
    exactly (same strict-merge tie rules per sub-piece)."""
    monkeypatch.setenv("RT_VOL_SUBC", "1")
    from raytrace_tpu.scene.builder import Mesh
    from raytrace_tpu.ops.pallas.volume_kernel import (
        VOL_SUB, _sub_plans, pack_sub_boxes,
    )

    # a 288-tri uv-sphere boundary (> BCAST_CHUNK rows after padding)
    n_lat, n_lon = 12, 16
    th = np.linspace(0, np.pi, n_lat + 1)
    ph = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt),
                  np.sin(tt) * np.sin(pp)], -1).reshape(-1, 3)
    vid = np.arange((n_lat + 1) * n_lon).reshape(n_lat + 1, n_lon)
    f = []
    for i in range(n_lat):
        a, b = vid[i], vid[i + 1]
        an, bn = np.roll(a, -1), np.roll(b, -1)
        if i > 0:
            f.append(np.stack([a, b, an], -1))
        if i < n_lat - 1:
            f.append(np.stack([an, b, bn], -1))
    f = np.concatenate(f).astype(np.int64)
    mesh = Mesh(vertices=v * 1.3, uv=np.zeros((0, 2)), faces=f,
                uv_faces=np.full_like(f, -1))
    world = rt.with_material(
        rt.isotropic(rt.constant_texture(0.5)),
        rt.constant_medium(1.5, rt.triangle_mesh(mesh)))
    scene = rt.compile_scene(world, accel="dense")
    vols = scene.volumes
    slices = tuple(zip(vols.starts, vols.counts))
    assert pack_sub_boxes(vols.prims, slices) is not None
    assert any(len(c) > 1 for plan in _sub_plans(slices) for c in plan)

    rg = np.random.default_rng(9)
    n = 384
    o = jnp.asarray(rg.uniform(-3, 3, (n, 3)), jnp.float32)
    d = jnp.asarray(rg.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = o.at[:64].set(0.0)   # inside the sphere boundary
    time = jnp.zeros((n,), jnp.float32)
    t_min = jnp.full((n,), 1e-3, jnp.float32)
    u = jnp.asarray(rg.uniform(0, 1, (n, 1)), jnp.float32)
    t_x, v_x = volume_candidates(vols, o, d, time, t_min, u)
    t_b, v_b = volume_candidates_pallas(vols, o, d, time, t_min, u, 1e-3,
                                        interpret=True, use_bcast=True)
    assert (np.asarray(v_x) == np.asarray(v_b)).all()
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_x),
                               rtol=1e-5, atol=1e-5)
    assert int(np.asarray(v_x).sum()) > 0
