"""Mesh-scale capability benchmark: a ~50k-triangle icosphere rendered by
the dense Pallas engines (two-level cluster consensus).

The reference BVH handles arbitrary mesh sizes (Geometry.hs:352-377); the
round-1 framework fell off a ~1000x cliff past 8 192 primitives (the
per-lane XLA BVH path).  This measures the replacement: the two-level
clustered intersect loop (ops/pallas/intersect_kernel.py GROUP consensus)
at 50k+ triangles, plus an end-to-end render.

Usage: python tools/bench_bigmesh.py [--subdiv 4] [--width 512] [--spp 16]
Prints one JSON line with intersect and render rays/s.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def uv_sphere(n_lat: int, n_lon: int):
    """Lat-lon sphere triangulation: 2 * n_lat * n_lon triangles (with
    degenerate pole quads collapsed into single triangles)."""
    th = np.linspace(0, np.pi, n_lat + 1)
    ph = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")        # [n_lat+1, n_lon]
    v = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt),
                  np.sin(tt) * np.sin(pp)], -1).reshape(-1, 3)
    vid = np.arange((n_lat + 1) * n_lon).reshape(n_lat + 1, n_lon)
    f = []
    for i in range(n_lat):
        a = vid[i]
        b = vid[i + 1]
        an = np.roll(a, -1)
        bn = np.roll(b, -1)
        if i > 0:
            f.append(np.stack([a, b, an], -1))
        if i < n_lat - 1:
            f.append(np.stack([an, b, bn], -1))
    return v, np.concatenate(f).astype(np.int64)


def build_scene(n_lat: int, n_lon: int):
    import raytrace_tpu as rt
    v, f = uv_sphere(n_lat, n_lon)
    mesh = rt.Mesh(vertices=v * 1.5, uv=np.zeros((0, 2)), faces=f,
                   uv_faces=np.full_like(f, -1))
    world = rt.group([
        rt.with_material(rt.lambertian(rt.constant_texture([0.7, 0.6, 0.5])),
                         rt.triangle_mesh(mesh)),
        rt.with_material(rt.lambertian(rt.constant_texture([0.5, 0.5, 0.5])),
                         rt.parallelogram([-50, -1.51, -50], [100, 0, 0],
                                          [0, 0, 100])),
        rt.with_material(rt.light_source(rt.constant_texture(8.0)),
                         rt.parallelogram([-3, 8, -3], [6, 0, 0],
                                          [0, 0, 6])),
    ])
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        center=jnp.asarray([0.0, 1.5, -7.0]),
        look_at=jnp.asarray([0.0, 0.0, 0.0]),
        vfov=0.7, aspect_ratio=1.0, image_width=512,
        samples_per_pixel=16, max_depth=8,
        background=rt.const_background(0.05))
    return scene, settings, f.shape[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lat", type=int, default=160)   # 160x160 ~ 50.9k tris
    ap.add_argument("--lon", type=int, default=160)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--width", type=int, default=512)
    args = ap.parse_args()

    from raytrace_tpu.core import rng
    from raytrace_tpu.render.render import render_accumulate

    scene, settings, n_tris = build_scene(args.lat, args.lon)
    settings = settings.replace(image_width=args.width,
                                samples_per_pixel=args.spp)
    n_rows = scene.prims.kind.shape[0]
    print(f"tris={n_tris} rows={n_rows} bvh={scene.bvh is not None} "
          f"segments={scene.prims.kind_segments}", file=sys.stderr,
          flush=True)

    n_pix = settings.image_width * settings.image_height
    acc, _ = render_accumulate(scene, settings, seed=0, spp=args.spp)
    _ = float(acc[0, 0])
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        acc, _ = render_accumulate(scene, settings, seed=r + 1,
                                   spp=args.spp)
        # end the timed region by FETCHING a value — block_until_ready can
        # return before execution on the tunnel (CLAUDE.md)
        _ = float(acc[0, 0])
        best = min(best, time.time() - t0)
    rays_s = n_pix * args.spp / best
    img = np.asarray(acc / args.spp).reshape(settings.image_height,
                                             settings.image_width, 3)
    from raytrace_tpu.render.image import write_image
    write_image("/tmp/bigmesh.png", img)
    print(json.dumps({
        "metric": "bigmesh_primary_rays_per_sec",
        "tris": n_tris, "rows": n_rows,
        "wall_s": round(best, 3),
        "value": round(rays_s, 1),
        "target": 1e6,
    }))


if __name__ == "__main__":
    main()
