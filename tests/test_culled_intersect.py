"""Visit-list streamed intersect engine vs the XLA oracle.

The round-3 engine (ops/cull.py prepass + intersect_kernel
pallas_nearest_record_culled) hoists cluster consensus out of the kernel
into a per-block cone/origin-bound prepass and streams the primitive
table from HBM per visited cluster.  These tests check, in interpret
mode on CPU:

* exact winner parity with the XLA dense path for incoherent rays
  (wide cones — everything visited: pure mechanics),
* parity AND a real cull rate for coherent ray bundles (the prepass
  must never cull a cluster that owns a winner),
* multi-kind segmented tables, motion blur, boxes,
* the conservativeness of the cone test in isolation (property test).
"""
import jax
import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu.ops.cull import visit_lists
from raytrace_tpu.ops.intersect import make_hit_record, nearest_hit_t
from raytrace_tpu.ops.pallas.intersect_kernel import (
    CLUSTER, LANES, pack_clusters, pack_prims, pallas_nearest_record_culled,
)

M = rt.lambertian(rt.constant_texture(0.5))
M2 = rt.metal(0.1, rt.constant_texture(0.9))

BLOCK_G = 4                       # small blocks for interpret mode


def _rays(n, seed, coherent=False):
    rng_ = np.random.default_rng(seed)
    if coherent:
        # tight one-octant bundle (all direction components same sign —
        # the case the ray-binned driver produces): the interval slab
        # test then bounds a corridor and the prepass can cull laterally
        o = rng_.uniform(-0.5, 0.5, (n, 3)) + [8, 8, 14]
        d = rng_.normal(size=(n, 3)) * 0.03 + [-0.25, -0.25, -1.0]
    else:
        o = rng_.uniform(-6, 6, (n, 3))
        d = rng_.normal(size=(n, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    time = rng_.uniform(0, 1, n)
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            jnp.asarray(time, jnp.float32))


def _run_culled(scene, o, d, time, t_min=1e-3, stream=True):
    n = o.shape[0]
    g = n // LANES
    resh = lambda x: x.reshape(g, LANES)
    tbl = pack_prims(scene.prims)
    ctbl = pack_clusters(scene.prims)
    n_prims = scene.prims.kind.shape[0]
    n_clusters = -(-n_prims // CLUSTER)
    segs = scene.prims.kind_segments
    ids, nvis, tent = visit_lists(
        ctbl, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        block_lanes=BLOCK_G * LANES, segments=segs, t_min=t_min,
        n_clusters=n_clusters)
    t, idx, nx, ny, nz, fr, uu, vv, mat, nproc = pallas_nearest_record_culled(
        tbl, ids, nvis, tent,
        resh(o[:, 0]), resh(o[:, 1]), resh(o[:, 2]),
        resh(d[:, 0]), resh(d[:, 1]), resh(d[:, 2]), resh(time),
        n_prims=n_prims, t_min=t_min,
        has_motion=scene.prims.has_motion, has_box=scene.prims.has_box,
        segments=segs, block_g=BLOCK_G, stream=stream, interpret=True)
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
    res = dict(t=flat(t), i=flat(idx), n=normal, f=front, uv=uv,
               m=flat(mat))
    return res, np.asarray(nproc).ravel()


def _run_oracle(scene, o, d, time, t_min=1e-3):
    n = o.shape[0]
    tmin = jnp.full(n, t_min)
    tmax = jnp.full(n, jnp.inf)
    t_ref, i_ref = nearest_hit_t(scene.prims, None, o, d, time, tmin, tmax)
    rec = make_hit_record(scene.prims, i_ref, o, d, time,
                          jnp.where(jnp.isfinite(t_ref), t_ref, 1.0))
    return dict(t=np.asarray(t_ref), i=np.asarray(i_ref),
                n=np.asarray(rec.normal), f=np.asarray(rec.front),
                uv=np.asarray(rec.uv), m=np.asarray(rec.mat))


def _compare(ref, pal, t_rtol=2e-4):
    hit = np.isfinite(ref["t"])
    assert (hit == np.isfinite(pal["t"])).all()
    # The culled kernel visits clusters in t_entry order (not index
    # order), so lanes whose two best candidates differ by ~f32 noise
    # can legitimately pick the other, equally-near winner.  Demand
    # exact winner parity for all but those near-tie lanes, and t
    # agreement within association noise everywhere.
    np.testing.assert_allclose(pal["t"][hit], ref["t"][hit], rtol=5e-4,
                               atol=5e-5)
    same = pal["i"] == ref["i"]
    near = np.abs(pal["t"] - ref["t"]) <= 5e-5 + 5e-4 * np.abs(ref["t"])
    assert (same | near)[hit].all()
    tie = hit & ~same
    assert tie.mean() < 0.005, f"too many near-tie winners: {tie.mean()}"
    cmp = hit & same
    np.testing.assert_allclose(pal["t"][cmp], ref["t"][cmp], rtol=t_rtol,
                               atol=5e-5)
    assert (pal["m"][cmp] == ref["m"][cmp]).all()
    assert (pal["f"][cmp] == ref["f"][cmp]).all()
    # atol: a grazing hit's record is evaluated at a hit point that
    # inherits the (accepted) t noise — normals/uv move by ~|dt|/r
    np.testing.assert_allclose(pal["n"][cmp], ref["n"][cmp], rtol=1e-3,
                               atol=5e-3)
    np.testing.assert_allclose(pal["uv"][cmp], ref["uv"][cmp], rtol=1e-3,
                               atol=5e-3)


def _mesh_scene(n_spheres=200):
    rng_ = np.random.default_rng(5)
    centers = rng_.uniform(-10, 10, (n_spheres, 3))
    radii = rng_.uniform(0.3, 1.0, n_spheres)
    return rt.compile_scene(rt.with_material(M, rt.spheres(centers, radii)),
                            accel="dense")


def _segmented_scene():
    rng_ = np.random.default_rng(9)
    items = []
    for _ in range(80):
        items.append(rt.with_material(
            M, rt.sphere(rng_.uniform(-8, 8, 3), rng_.uniform(0.3, 1.0))))
    for i in range(60):
        g = rt.with_material(M2, rt.parallelogram(
            rng_.uniform(-8, 8, 3), rng_.uniform(-1.5, 1.5, 3),
            rng_.uniform(-1.5, 1.5, 3)))
        if i % 3 == 0:
            g = rt.moving([0, 0, 0], rng_.uniform(-1, 1, 3), g)
        items.append(g)
    for _ in range(20):
        lo = rng_.uniform(-8, 8, 3)
        items.append(rt.with_material(M, rt.cuboid(
            lo, lo + rng_.uniform(0.5, 2.0, 3))))
    return rt.compile_scene(rt.group(items), accel="dense")


def test_incoherent_matches_oracle():
    scene = _mesh_scene()
    o, d, time = _rays(1024, 2)
    ref = _run_oracle(scene, o, d, time)
    assert np.isfinite(ref["t"]).sum() > 100
    for stream in (True, False):   # HBM-streamed and VMEM-resident table
        pal, _ = _run_culled(scene, o, d, time, stream=stream)
        _compare(ref, pal)


def test_coherent_culls_and_matches_oracle():
    scene = _mesh_scene(n_spheres=1000)    # 16 clusters
    o, d, time = _rays(1024, 3, coherent=True)
    ref = _run_oracle(scene, o, d, time)
    pal, nproc = _run_culled(scene, o, d, time)
    assert np.isfinite(ref["t"]).sum() > 100
    # t_rtol: one grazing sphere hit (disc ~ 0) amplifies f32 noise
    # through the sqrt; winner and record still agree
    _compare(ref, pal, t_rtol=5e-4)
    n_clusters = -(-scene.prims.kind.shape[0] // CLUSTER)
    # a ~5-degree corner bundle: culling + t-ordered early exit must
    # process well under the full cluster list
    assert nproc.max() < n_clusters


def test_segmented_motion_boxes_match_oracle():
    scene = _segmented_scene()
    assert scene.prims.kind_segments is not None
    assert len(scene.prims.kind_segments) == 3
    for coherent in (False, True):
        o, d, time = _rays(1024, 7 + coherent, coherent=coherent)
        ref = _run_oracle(scene, o, d, time)
        pal, _ = _run_culled(scene, o, d, time)
        _compare(ref, pal)


def test_cone_test_is_conservative():
    """Property: any (ray, cluster) whose exact slab test passes within
    the current interval must come from a (block, cluster) pair the
    prepass marked visited."""
    from raytrace_tpu.ops.cull import _cull_matrix, block_ray_bounds
    rng_ = np.random.default_rng(11)
    n, block = 256, 64
    o = jnp.asarray(rng_.uniform(-5, 5, (n, 3)), jnp.float32)
    d = rng_.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    k = 100
    lo = rng_.uniform(-8, 8, (k, 3)).astype(np.float32)
    hi = lo + rng_.uniform(0.2, 3.0, (k, 3)).astype(np.float32)
    ctbl = jnp.zeros((k, 8), jnp.float32)
    ctbl = ctbl.at[:, 0:3].set(lo).at[:, 3:6].set(hi)
    olo, ohi, axis, cosh, dlo_d, dhi_d = block_ray_bounds(
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], block)
    visit, t_entry = _cull_matrix(ctbl, olo, ohi, axis, cosh, 1e-3,
                                  dlo_d, dhi_d)
    visit = np.asarray(visit)
    t_entry = np.asarray(t_entry)
    # exact per-ray slab test
    on = np.asarray(o)[:, None, :]
    dn = np.asarray(d)[:, None, :]
    inv = 1.0 / np.where(np.abs(dn) < 1e-20, 1e-20, dn)
    t0 = (lo[None] - on) * inv
    t1 = (hi[None] - on) * inv
    tn = np.maximum(np.minimum(t0, t1).max(-1), 1e-3)
    tf = np.maximum(t0, t1).min(-1)
    ray_hits = tn <= tf                      # [n, k]
    blk = np.repeat(np.arange(n // block), block)
    for r in range(n):
        hit_k = np.nonzero(ray_hits[r])[0]
        assert visit[blk[r], hit_k].all(), (
            f"ray {r}: cluster(s) {hit_k[~visit[blk[r], hit_k]]} culled "
            "despite an exact slab hit")
        # t_entry must lower-bound the exact slab entry
        assert (t_entry[blk[r], hit_k] <= tn[r, hit_k] + 1e-4).all()


def _run_broadcast(scene, o, d, time, t_min=1e-3, w=512):
    from raytrace_tpu.ops.pallas.allpairs_kernel import visit_nearest_record
    n = o.shape[0]
    g = n // LANES
    resh = lambda x: x.reshape(g, LANES)
    tbl = pack_prims(scene.prims)
    ctbl = pack_clusters(scene.prims)
    n_prims = scene.prims.kind.shape[0]
    segs = scene.prims.kind_segments or ((None, 0, -(-n_prims // CLUSTER)),)
    ids, nvis, tent = visit_lists(
        ctbl, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        block_lanes=w, segments=scene.prims.kind_segments, t_min=t_min,
        n_clusters=-(-n_prims // CLUSTER))
    out = visit_nearest_record(
        tbl, ids, nvis, tent,
        resh(o[:, 0]), resh(o[:, 1]), resh(o[:, 2]),
        resh(d[:, 0]), resh(d[:, 1]), resh(d[:, 2]), resh(time),
        n_prims=n_prims, t_min=t_min,
        has_motion=scene.prims.has_motion, segments=segs, w=w, rg=2,
        interpret=True)
    t, idx, nx, ny, nz, fr, uu, vv, mat, nproc = out
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
    res = dict(t=flat(t), i=flat(idx), n=normal, f=front, uv=uv,
               m=flat(mat))
    return res, np.asarray(nproc).ravel()


def test_broadcast_incoherent_matches_oracle():
    """Visit-list broadcast kernel vs the XLA oracle (shuffled rays:
    everything visited, pure mechanics)."""
    scene = _mesh_scene()
    o, d, time = _rays(1024, 2)
    ref = _run_oracle(scene, o, d, time)
    pal, _ = _run_broadcast(scene, o, d, time)
    assert np.isfinite(ref["t"]).sum() > 100
    _compare(ref, pal)


def test_broadcast_coherent_culls_and_matches():
    scene = _mesh_scene(n_spheres=1000)
    o, d, time = _rays(1024, 3, coherent=True)
    ref = _run_oracle(scene, o, d, time)
    pal, nproc = _run_broadcast(scene, o, d, time)
    _compare(ref, pal, t_rtol=5e-4)
    n_clusters = -(-scene.prims.kind.shape[0] // CLUSTER)
    assert nproc.max() < n_clusters


def test_broadcast_segmented_matches():
    scene = _segmented_scene()
    for coherent in (False, True):
        o, d, time = _rays(1024, 7 + coherent, coherent=coherent)
        ref = _run_oracle(scene, o, d, time)
        pal, _ = _run_broadcast(scene, o, d, time)
        _compare(ref, pal)


def test_rank_kernel_matches_argsort():
    """The O(K^2) rank-based list builder (Pallas) must reproduce the
    XLA argsort lists: same nvis, same t-ordered visited prefix (ids may
    permute only among exact-tie t_entry values)."""
    from raytrace_tpu.ops.cull import PAD_COLS
    from raytrace_tpu.ops.pallas.rank_kernel import rank_visit_lists
    rng_ = np.random.default_rng(3)
    b, k = 16, 100
    visit = rng_.uniform(size=(b, k)) < 0.3
    t_entry = np.where(rng_.uniform(size=(b, k)) < 0.2, 1e-3,
                       rng_.uniform(1, 50, (b, k))).astype(np.float32)
    segments = ((0, 60), (60, 100))
    ids, nvis, tent = rank_visit_lists(
        jnp.asarray(visit), jnp.asarray(t_entry), segments=segments,
        n_clusters=k, rg=8, interpret=True)
    ids = np.asarray(ids)
    nvis = np.asarray(nvis)
    tent = np.asarray(tent)
    assert ids.shape == (b, k + PAD_COLS)
    for r in range(b):
        for si, (k0, k1) in enumerate(segments):
            v = visit[r, k0:k1]
            te = np.where(v, t_entry[r, k0:k1], np.inf)
            order = np.argsort(te, kind="stable")
            nv = int(v.sum())
            assert nvis[r, si] == nv
            ref_ids = k0 + order[:nv]
            got_ids = ids[r, k0:k0 + nv]
            # t values must match exactly in order
            np.testing.assert_allclose(tent[r, k0:k0 + nv], te[order[:nv]],
                                       rtol=1e-6)
            # ids match (stable tie-break by index in both)
            assert (got_ids == ref_ids).all(), (r, si)
            # beyond the list: +inf tent
            assert np.isinf(tent[r, k0 + nv:k1]).all()
    assert np.isinf(tent[:, k + PAD_COLS - 1]).all()
