"""Visit-list engine diagnostics on REAL wavefront ray populations.

Builds the bigmesh scene, traces camera rays one XLA bounce to get a
genuine second-bounce population, bins it exactly like
trace_wavefront_sorted, and then measures, per engine and population:

* wall time per 2^18-lane bounce (value-fetch timing),
* the per-row visited-cluster distribution (nproc p50/p90/max) vs the
  796-cluster table.

Usage: python tools/prof_visit_stats.py [--reps 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--lat", type=int, default=160)
    args = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_bigmesh import build_scene

    from raytrace_tpu.core import rng
    from raytrace_tpu.ops.cull import visit_lists
    from raytrace_tpu.ops.pallas.allpairs_kernel import (
        VISIT_W, visit_nearest_record,
    )
    from raytrace_tpu.ops.pallas.intersect_kernel import (
        CLUSTER, pack_clusters, pack_prims,
    )
    from raytrace_tpu.render.camera import (
        camera_frame, generate_ray_components,
    )
    from raytrace_tpu.render.integrator import (
        _tile_maps, bounce, n_bounce_uniforms,
    )

    scene, settings, n_tris = build_scene(args.lat, args.lat)
    R = 1 << 16
    n_pix = settings.image_width * settings.image_height
    frame = camera_frame(settings)
    l2p, _ = _tile_maps(n_pix, settings.image_width, n_pix)
    lane_pixel = jnp.asarray(l2p)[jnp.arange(R, dtype=jnp.int32) % n_pix]
    keys = rng.ray_keys_fast(rng.base_key(0), lane_pixel,
                             jnp.zeros(R, jnp.int32))
    n_u = n_bounce_uniforms(scene)
    u = rng.uniform_block(keys, n_u + 6)
    ox, oy, oz, dx, dy, dz, tm = generate_ray_components(
        settings, frame, lane_pixel, u[:, n_u:n_u + 5])

    # one real XLA bounce -> second-bounce population
    o3 = jnp.stack([ox, oy, oz], -1)
    d3 = jnp.stack([dx, dy, dz], -1)
    o2, d2, _, _, alive2, _ = jax.jit(
        lambda o, d: bounce(scene, settings, o, d, tm, u,
                            jnp.zeros((R, 3)), jnp.ones((R, 3)),
                            jnp.ones((R,), bool)))(o3, d3)
    alive_np = np.asarray(alive2)
    print(f"bounce survivors: {alive_np.mean():.3f}", flush=True)

    # bin exactly like trace_wavefront_sorted (octant, origin cell)
    p = scene.prims
    ext = jnp.abs(p.e1) + jnp.abs(p.e2)
    blo = jnp.min(p.p0 - ext, axis=0)
    bhi = jnp.max(p.p0 + ext, axis=0)
    binv = 1.0 / jnp.maximum(bhi - blo, 1e-6)

    def spread3(x):
        x = (x | (x << 16)) & jnp.int32(0x030000FF)
        x = (x | (x << 8)) & jnp.int32(0x0300F00F)
        x = (x | (x << 4)) & jnp.int32(0x030C30C3)
        x = (x | (x << 2)) & jnp.int32(0x09249249)
        return x

    b2 = (o2[:, 0], o2[:, 1], o2[:, 2], d2[:, 0], d2[:, 1], d2[:, 2], tm)
    octk = ((b2[3] < 0).astype(jnp.int32) * 4
            + (b2[4] < 0).astype(jnp.int32) * 2
            + (b2[5] < 0).astype(jnp.int32))
    q = lambda o, k: jnp.clip(((o - blo[k]) * binv[k] * 64)
                              .astype(jnp.int32), 0, 63)
    cell = (spread3(q(b2[0], 0)) | (spread3(q(b2[1], 1)) << 1)
            | (spread3(q(b2[2], 2)) << 2))
    key_live = octk * (64 ** 3) + cell
    order = jnp.argsort(jnp.where(alive2, key_live, jnp.int32(1 << 30)))
    binned = tuple(a[order] for a in b2)

    tbl = pack_prims(p)
    ctbl = pack_clusters(p)
    n_prims = p.kind.shape[0]
    n_clusters = -(-n_prims // CLUSTER)
    segs = p.kind_segments
    g = R // 128
    resh = lambda x: x.reshape(g, 128)

    def run(a):
        ox, oy, oz, dx, dy, dz, tm = a
        ids, nvis, tent = visit_lists(
            ctbl, ox, oy, oz, dx, dy, dz, block_lanes=VISIT_W,
            segments=segs, t_min=float(settings.t_min),
            n_clusters=n_clusters)
        out = visit_nearest_record(
            tbl, ids, nvis, tent, resh(ox), resh(oy), resh(oz),
            resh(dx), resh(dy), resh(dz), resh(tm),
            n_prims=n_prims, t_min=float(settings.t_min),
            has_motion=p.has_motion, segments=segs)
        return out[0], out[9], jnp.sum(nvis, axis=1)

    fn = jax.jit(run)
    for label, a in (("camera", (ox, oy, oz, dx, dy, dz, tm)),
                     ("bounce-binned", binned)):
        t_, nproc, nvis = fn(a)
        _ = float(t_[0, 0])
        best = float("inf")
        for r in range(args.reps):
            a2 = tuple(x + r * 1e-4 for x in a[:3]) + a[3:]
            t0 = time.time()
            t_, nproc, nvis = fn(a2)
            _ = float(t_[0, 0])
            best = min(best, time.time() - t0)
        npr = np.asarray(nproc).ravel()
        nvi = np.asarray(nvis).ravel()
        print(f"{label:14s}: {best*1e3:7.2f} ms  "
              f"nproc p50/p90/max = {np.percentile(npr, 50):.0f}/"
              f"{np.percentile(npr, 90):.0f}/{npr.max()}  "
              f"nvis p50/p90/max = {np.percentile(nvi, 50):.0f}/"
              f"{np.percentile(nvi, 90):.0f}/{nvi.max()}  "
              f"(K={n_clusters})", flush=True)


if __name__ == "__main__":
    if os.environ.get("RT_SPLIT"):
        pass  # handled below
    else:
        main()


def split_timing():
    """Time visit_lists (prepass) and the kernel separately."""
    import argparse
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_bigmesh import build_scene
    from raytrace_tpu.core import rng
    from raytrace_tpu.ops.cull import visit_lists
    from raytrace_tpu.ops.pallas.allpairs_kernel import (
        VISIT_W, visit_nearest_record,
    )
    from raytrace_tpu.ops.pallas.intersect_kernel import (
        CLUSTER, pack_clusters, pack_prims,
    )
    from raytrace_tpu.render.camera import (
        camera_frame, generate_ray_components,
    )
    from raytrace_tpu.render.integrator import _tile_maps

    scene, settings, n_tris = build_scene(160, 160)
    R = 1 << 18
    n_pix = settings.image_width * settings.image_height
    frame = camera_frame(settings)
    l2p, _ = _tile_maps(n_pix, settings.image_width, n_pix)
    lane_pixel = jnp.asarray(l2p)[jnp.arange(R, dtype=jnp.int32) % n_pix]
    keys = rng.ray_keys_fast(rng.base_key(0), lane_pixel,
                             jnp.zeros(R, jnp.int32))
    u = rng.uniform_block(keys, 5)
    ox, oy, oz, dx, dy, dz, tm = generate_ray_components(
        settings, frame, lane_pixel, u)
    p = scene.prims
    tbl = pack_prims(p)
    ctbl = pack_clusters(p)
    n_prims = p.kind.shape[0]
    n_clusters = -(-n_prims // CLUSTER)
    segs = p.kind_segments
    g = R // 128
    resh = lambda x: x.reshape(g, 128)

    pre = jax.jit(lambda a: visit_lists(
        ctbl, a[0], a[1], a[2], a[3], a[4], a[5], block_lanes=VISIT_W,
        segments=segs, t_min=float(settings.t_min),
        n_clusters=n_clusters))
    a = (ox, oy, oz, dx, dy, dz)
    ids, nvis, tent = pre(a)
    _ = int(nvis[0, 0])
    best = float("inf")
    for r in range(4):
        a2 = tuple(x + r * 1e-4 for x in a[:3]) + a[3:]
        t0 = time.time()
        ids, nvis, tent = pre(a2)
        _ = int(nvis[0, 0])
        best = min(best, time.time() - t0)
    print(f"prepass (visit_lists): {best*1e3:.2f} ms / 2^18 lanes",
          flush=True)

    kern = jax.jit(lambda ids, nvis, tent, a: visit_nearest_record(
        tbl, ids, nvis, tent, resh(a[0]), resh(a[1]), resh(a[2]),
        resh(a[3]), resh(a[4]), resh(a[5]), resh(tm),
        n_prims=n_prims, t_min=float(settings.t_min),
        has_motion=p.has_motion, segments=segs))
    out = kern(ids, nvis, tent, a)
    _ = float(out[0][0, 0])
    best = float("inf")
    for r in range(4):
        a2 = tuple(x + r * 1e-4 for x in a[:3]) + a[3:]
        t0 = time.time()
        out = kern(ids, nvis, tent, a2)
        _ = float(out[0][0, 0])
        best = min(best, time.time() - t0)
    print(f"kernel (visit_nearest_record): {best*1e3:.2f} ms / 2^18 lanes",
          flush=True)


if os.environ.get("RT_SPLIT"):
    split_timing()
    sys.exit(0)
