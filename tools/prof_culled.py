"""Culled visit-list engine vs the clustered consensus engine at mesh
scale (~50k tris), at three coherence levels: tile-ordered primary rays,
fully shuffled bounce rays, and shuffled-then-BINNED rays ((direction
octant, origin Morton cell) — what trace_wavefront_sorted feeds the
kernels).  Value-fetch timing per CLAUDE.md.

Usage: python tools/prof_culled.py [--lat 160] [--engines culled,clustered]
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
    ap.add_argument("--lat", type=int, default=160)
    ap.add_argument("--lon", type=int, default=160)
    ap.add_argument("--engines", default="culled,clustered")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bg", type=int, default=None,
                    help="kernel block rows for the culled engine")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_bigmesh import build_scene

    from raytrace_tpu.core import rng
    from raytrace_tpu.ops.cull import visit_lists
    from raytrace_tpu.ops.pallas.intersect_kernel import (
        BLOCK_G_CLUSTERED, CLUSTER, LANES, pack_clusters, pack_prims,
        pallas_nearest_record, pallas_nearest_record_culled,
    )
    from raytrace_tpu.render.camera import (
        camera_frame, generate_ray_components,
    )
    from raytrace_tpu.render.integrator import _tile_maps

    scene, settings, n_tris = build_scene(args.lat, args.lon)
    R = 1 << 18
    n_pix = settings.image_width * settings.image_height
    frame = camera_frame(settings)
    lane_pixel = jnp.arange(R, dtype=jnp.int32) % n_pix
    # tile-ordered (the stationary driver's layout)
    l2p, _ = _tile_maps(n_pix, settings.image_width, n_pix)
    lane_pixel = jnp.asarray(l2p)[lane_pixel % n_pix]
    keys = rng.ray_keys_fast(rng.base_key(0), lane_pixel,
                             jnp.zeros(R, jnp.int32))
    u = rng.uniform_block(keys, 5)
    ox, oy, oz, dx, dy, dz, tm = generate_ray_components(
        settings, frame, lane_pixel, u)
    perm = jax.random.permutation(jax.random.key(7), R)
    shuf = tuple(a[perm] for a in (ox, oy, oz, dx, dy, dz, tm))

    # binned: the sorted driver's (octant, origin Morton cell) key over
    # the SHUFFLED rays — distribution-equal to a bounced wavefront
    # re-binned each iteration.  For a primary-ray population origins
    # are all at the camera, so bin mostly by octant.
    def spread3(x):
        x = (x | (x << 16)) & jnp.int32(0x030000FF)
        x = (x | (x << 8)) & jnp.int32(0x0300F00F)
        x = (x | (x << 4)) & jnp.int32(0x030C30C3)
        x = (x | (x << 2)) & jnp.int32(0x09249249)
        return x

    sx, sy, sz, sdx, sdy, sdz, stm = shuf
    p = scene.prims
    ext = jnp.abs(p.e1) + jnp.abs(p.e2)
    blo = jnp.min(p.p0 - ext, axis=0)
    bhi = jnp.max(p.p0 + ext, axis=0)
    binv = 1.0 / jnp.maximum(bhi - blo, 1e-6)
    octk = ((sdx < 0).astype(jnp.int32) * 4 + (sdy < 0).astype(jnp.int32) * 2
            + (sdz < 0).astype(jnp.int32))
    q = lambda o, k: jnp.clip(((o - blo[k]) * binv[k] * 64).astype(jnp.int32),
                              0, 63)
    cell = (spread3(q(sx, 0)) | (spread3(q(sy, 1)) << 1)
            | (spread3(q(sz, 2)) << 2))
    order = jnp.argsort(octk * (64 ** 3) + cell)
    binned = tuple(a[order] for a in shuf)

    tbl = pack_prims(p)
    ctbl = pack_clusters(p)
    n_prims = scene.prims.kind.shape[0]
    n_clusters = -(-n_prims // CLUSTER)
    segs = p.kind_segments
    g = R // LANES
    resh = lambda x: x.reshape(g, LANES)
    print(f"tris={n_tris} rows={n_prims} clusters={n_clusters} "
          f"segments={segs}", file=sys.stderr, flush=True)

    bg = args.bg or BLOCK_G_CLUSTERED

    def run_culled(a):
        ox, oy, oz, dx, dy, dz, tm = a
        ids, nvis, tent = visit_lists(
            ctbl, ox, oy, oz, dx, dy, dz,
            block_lanes=bg * LANES, segments=segs,
            t_min=float(settings.t_min), n_clusters=n_clusters)
        out = pallas_nearest_record_culled(
            tbl, ids, nvis, tent, resh(ox), resh(oy), resh(oz),
            resh(dx), resh(dy), resh(dz), resh(tm),
            n_prims=n_prims, t_min=float(settings.t_min),
            has_motion=p.has_motion, has_box=p.has_box, segments=segs,
            block_g=bg)
        # return raw outputs: reduction consumers let XLA place the
        # pallas outputs in VMEM and blow the scoped limit
        return out[0], jnp.sum(out[9])

    def run_broadcast(a):
        from raytrace_tpu.ops.pallas.allpairs_kernel import (
            VISIT_W, visit_nearest_record,
        )
        ox, oy, oz, dx, dy, dz, tm = a
        ids, nvis, tent = visit_lists(
            ctbl, ox, oy, oz, dx, dy, dz,
            block_lanes=VISIT_W, segments=segs,
            t_min=float(settings.t_min), n_clusters=n_clusters)
        out = visit_nearest_record(
            tbl, ids, nvis, tent, resh(ox), resh(oy), resh(oz),
            resh(dx), resh(dy), resh(dz), resh(tm),
            n_prims=n_prims, t_min=float(settings.t_min),
            has_motion=p.has_motion, segments=segs)
        return out[0], jnp.sum(out[9])

    def run_clustered(a):
        ox, oy, oz, dx, dy, dz, tm = a
        out = pallas_nearest_record(
            tbl, ctbl, resh(ox), resh(oy), resh(oz),
            resh(dx), resh(dy), resh(dz), resh(tm),
            n_prims=n_prims, t_min=float(settings.t_min),
            has_motion=p.has_motion, has_box=p.has_box, segments=segs,
            kinds=p.kinds_present)
        return out[0], jnp.zeros((), jnp.int32)

    engines = {"culled": run_culled, "clustered": run_clustered,
               "broadcast": run_broadcast}
    for name in args.engines.split(","):
        fn = jax.jit(engines[name])
        for label, a in (("coherent  ", (ox, oy, oz, dx, dy, dz, tm)),
                         ("incoherent", shuf), ("binned    ", binned)):
            s, nv = fn(a)
            _ = float(s[0, 0])
            best = float("inf")
            for r in range(args.reps):
                a2 = tuple(x + r * 1e-4 for x in a[:3]) + a[3:]
                t0 = time.time()
                s, nv = fn(a2)
                _ = float(s[0, 0])
                best = min(best, time.time() - t0)
            if name == "culled":
                extra = f"  clusters/block={float(nv)/ (g//bg):.1f}"
            elif name == "broadcast":
                from raytrace_tpu.ops.pallas.allpairs_kernel import VISIT_W
                extra = f"  clusters/row={float(nv)/(R//VISIT_W):.1f}"
            else:
                extra = ""
            print(f"{name:10s} {label}: {best*1e3:7.2f} ms / 2^18 rays -> "
                  f"{R/best/1e6:6.2f}M rays/s{extra}", flush=True)


if __name__ == "__main__":
    main()
