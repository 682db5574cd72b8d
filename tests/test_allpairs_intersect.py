"""All-pairs broadcast intersect kernel vs the XLA oracle (interpret
mode on CPU).  Scenes must be kind-segmented (>= 65 prims)."""
import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu.ops.intersect import make_hit_record, nearest_hit_t
from raytrace_tpu.ops.pallas.allpairs_kernel import allpairs_nearest_record
from raytrace_tpu.ops.pallas.intersect_kernel import pack_prims

M = rt.lambertian(rt.constant_texture(0.5))
M2 = rt.metal(0.1, rt.constant_texture(0.9))


def _run_both(scene, n=1024, seed=0, t_min=1e-3, with_skip=False):
    rng_ = np.random.default_rng(seed)
    o = jnp.asarray(rng_.uniform(-6, 6, (n, 3)), jnp.float32)
    d = jnp.asarray(rng_.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    time = jnp.asarray(rng_.uniform(0, 1, n), jnp.float32)

    tmin = jnp.full(n, t_min)
    tmax = jnp.full(n, jnp.inf)
    t_ref, i_ref = nearest_hit_t(scene.prims, None, o, d, time, tmin, tmax)
    rec = make_hit_record(scene.prims, i_ref, o, d, time,
                          jnp.where(jnp.isfinite(t_ref), t_ref, 1.0))

    g = n // 128
    resh = lambda x: x.reshape(g, 128)
    tbl = pack_prims(scene.prims)
    if with_skip:
        from raytrace_tpu.ops.pallas.intersect_kernel import pack_clusters
        ctbl = pack_clusters(scene.prims)
    else:
        ctbl = None
    t, idx, nx, ny, nz, fr, uu, vv, mat = allpairs_nearest_record(
        tbl, resh(o[:, 0]), resh(o[:, 1]), resh(o[:, 2]),
        resh(d[:, 0]), resh(d[:, 1]), resh(d[:, 2]), resh(time),
        n_prims=scene.prims.kind.shape[0], t_min=t_min,
        has_motion=scene.prims.has_motion,
        segments=scene.prims.kind_segments, ctbl=ctbl, interpret=True)
    flat = lambda x: np.asarray(x).reshape(n)
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


def _compare(ref, pal, t_rtol=2e-5, t_atol=1e-5):
    hit = np.isfinite(ref["t"])
    assert (hit == np.isfinite(pal["t"])).all()
    np.testing.assert_allclose(pal["t"][hit], ref["t"][hit], rtol=t_rtol,
                               atol=t_atol)
    assert (pal["i"][hit] == ref["i"][hit]).all()
    assert (pal["m"][hit] == ref["m"][hit]).all()
    assert (pal["f"][hit] == ref["f"][hit]).all()
    np.testing.assert_allclose(pal["n"][hit], ref["n"][hit], rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(pal["uv"][hit], ref["uv"][hit], rtol=1e-3,
                               atol=2e-3)


def _mixed_scene(motion: bool):
    rng_ = np.random.default_rng(11)
    items = []
    for i in range(40):
        c = rng_.uniform(-8, 8, 3)
        items.append(rt.with_material(M, rt.sphere(c, rng_.uniform(0.3, 1.0))))
    for i in range(30):
        q = rng_.uniform(-8, 8, 3)
        g = rt.with_material(M2, rt.parallelogram(
            q, rng_.uniform(-1.5, 1.5, 3), rng_.uniform(-1.5, 1.5, 3)))
        if motion and i % 3 == 0:
            g = rt.moving([0, 0, 0], rng_.uniform(-1, 1, 3), g)
        items.append(g)
        tq = rng_.uniform(-8, 8, 3)
        items.append(rt.with_material(M, rt.triangle(
            tq, tq + rng_.uniform(-2, 2, 3), tq + rng_.uniform(-2, 2, 3),
            uv0=(0, 0), uv1=(1, 0), uv2=(0.3, 0.9))))
    for i in range(10):
        lo = rng_.uniform(-8, 8, 3)
        items.append(rt.with_material(M, rt.cuboid(
            lo, lo + rng_.uniform(0.5, 2.0, 3))))
    return rt.compile_scene(rt.group(items), accel="dense")


def test_allpairs_mixed_static():
    scene = _mixed_scene(motion=False)
    assert scene.prims.kind_segments is not None
    ref, pal = _run_both(scene, seed=3)
    assert np.isfinite(ref["t"]).sum() > 100
    _compare(ref, pal, t_rtol=2e-4)


def test_allpairs_mixed_motion():
    scene = _mixed_scene(motion=True)
    assert scene.prims.has_motion
    ref, pal = _run_both(scene, seed=5)
    assert np.isfinite(ref["t"]).sum() > 100
    _compare(ref, pal, t_rtol=2e-4)


def test_allpairs_sphere_only_large():
    """Multi-chunk single-kind segment (chunk boundary crossing)."""
    rng_ = np.random.default_rng(2)
    items = [rt.with_material(M, rt.sphere(rng_.uniform(-10, 10, 3),
                                           rng_.uniform(0.2, 0.8)))
             for _ in range(700)]
    scene = rt.compile_scene(rt.group(items), accel="dense")
    ref, pal = _run_both(scene, seed=7)
    assert np.isfinite(ref["t"]).sum() > 200
    # t_atol: grazing hits (disc ~ 0) carry f32 association noise in the
    # direct oc form; winner indices still match exactly
    _compare(ref, pal, t_rtol=2e-4, t_atol=3e-5)


def test_allpairs_chunk_skip_matches():
    """Chunk-AABB row skipping (phase 1 cond + phase 2 matmul skip) must
    be invisible: identical winners/attrs to the unskipped sweep."""
    scene = _mixed_scene(motion=True)
    ref, pal = _run_both(scene, seed=9, with_skip=True)
    assert np.isfinite(ref["t"]).sum() > 100
    _compare(ref, pal, t_rtol=2e-4)


def test_allpairs_chunk_skip_multi_chunk():
    rng_ = np.random.default_rng(4)
    items = [rt.with_material(M, rt.sphere(rng_.uniform(-10, 10, 3),
                                           rng_.uniform(0.2, 0.8)))
             for _ in range(700)]
    scene = rt.compile_scene(rt.group(items), accel="dense")
    ref, pal = _run_both(scene, seed=8, with_skip=True)
    assert np.isfinite(ref["t"]).sum() > 200
    _compare(ref, pal, t_rtol=2e-4, t_atol=3e-5)


def test_allpairs_dynamic_chunk_kernel(monkeypatch):
    """Dynamic-chunk kernel (mesh-scale path: fori over chunks with
    AABB conds and dynamic table slices) must match the XLA oracle.
    CHUNK shrunk so a 700-sphere scene spans many chunks; DYN_MIN_CHUNKS
    lowered so the dynamic path engages in interpret mode."""
    import raytrace_tpu.ops.pallas.allpairs_kernel as ak
    monkeypatch.setattr(ak, "CHUNK", 64)
    monkeypatch.setattr(ak, "DYN_MIN_CHUNKS", 2)
    rng_ = np.random.default_rng(21)
    items = [rt.with_material(M, rt.sphere(rng_.uniform(-10, 10, 3),
                                           rng_.uniform(0.2, 0.8)))
             for _ in range(700)]
    # mixed kinds so seg_plan has several segments + boundary overruns
    for _ in range(80):
        q = rng_.uniform(-10, 10, 3)
        items.append(rt.with_material(M2, rt.parallelogram(
            q, rng_.uniform(-1.5, 1.5, 3), rng_.uniform(-1.5, 1.5, 3))))
    for _ in range(30):
        lo = rng_.uniform(-10, 10, 3)
        items.append(rt.with_material(M, rt.cuboid(
            lo, lo + rng_.uniform(0.5, 2.0, 3))))
    scene = rt.compile_scene(rt.group(items), accel="dense")
    ref, pal = _run_both(scene, seed=17, with_skip=True)
    assert np.isfinite(ref["t"]).sum() > 200
    _compare(ref, pal, t_rtol=2e-4, t_atol=3e-5)


def test_allpairs_dynamic_chunk_motion(monkeypatch):
    import raytrace_tpu.ops.pallas.allpairs_kernel as ak
    monkeypatch.setattr(ak, "CHUNK", 64)
    monkeypatch.setattr(ak, "DYN_MIN_CHUNKS", 2)
    scene = _mixed_scene(motion=True)
    ref, pal = _run_both(scene, seed=19, with_skip=True)
    assert np.isfinite(ref["t"]).sum() > 100
    _compare(ref, pal, t_rtol=2e-4)


def test_streamed_dyn_matches_oracle(monkeypatch):
    """HBM-streamed chunk mode (tables past MAX_PRIMS) must match the
    XLA oracle; force streaming by shrinking MAX_PRIMS."""
    import raytrace_tpu.ops.pallas.allpairs_kernel as ap
    monkeypatch.setattr(ap, "MAX_PRIMS", 64)
    rng_ = np.random.default_rng(21)
    items = []
    for _ in range(120):
        items.append(rt.with_material(
            M, rt.sphere(rng_.uniform(-8, 8, 3), rng_.uniform(0.3, 1.0))))
    for _ in range(80):
        items.append(rt.with_material(M2, rt.parallelogram(
            rng_.uniform(-8, 8, 3), rng_.uniform(-1.5, 1.5, 3),
            rng_.uniform(-1.5, 1.5, 3))))
    scene = rt.compile_scene(rt.group(items), accel="dense")
    assert scene.prims.kind.shape[0] > 64
    ref, pal = _run_both(scene, n=512, seed=9, with_skip=True)
    hit = np.isfinite(ref["t"])
    assert hit.sum() > 50
    assert (hit == np.isfinite(pal["t"])).all()
    # near-tie winners may differ (two overlapping prims within f32
    # noise of each other); demand equal-quality t everywhere and exact
    # winner parity off the ties
    np.testing.assert_allclose(pal["t"][hit], ref["t"][hit], rtol=5e-4,
                               atol=5e-5)
    same = pal["i"] == ref["i"]
    tie = hit & ~same
    assert tie.mean() < 0.005
    cmp = hit & same
    assert (pal["m"][cmp] == ref["m"][cmp]).all()
    np.testing.assert_allclose(pal["n"][cmp], ref["n"][cmp], rtol=1e-3,
                               atol=5e-3)
