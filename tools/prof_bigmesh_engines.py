"""Compare the two dense Pallas intersect engines at mesh scale (~50k
tris): all-pairs dynamic-chunk sweep vs two-level clustered consensus
loop, at primary-ray coherence and shuffled (incoherent) rays.  Decides
the engine-selection gate in render/integrator.py:_surface_hit for
mesh-scale tables.  Run on the real chip."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from bench_bigmesh import build_scene  # noqa: E402  (tools/ on path)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from raytrace_tpu.core import rng
from raytrace_tpu.render.camera import camera_frame, generate_ray_components

scene, settings, n_tris = build_scene(160, 160)
print(f"tris={n_tris} rows={scene.prims.kind.shape[0]} "
      f"segments={scene.prims.kind_segments}", flush=True)

R = 1 << 18
n_pix = settings.image_width * settings.image_height
frame = camera_frame(settings)
lane_pixel = jnp.arange(R, dtype=jnp.int32) % n_pix
key = rng.base_key(0)
keys = rng.ray_keys_fast(key, lane_pixel, jnp.zeros(R, jnp.int32))
u = rng.uniform_block(keys, 5)
comps = generate_ray_components(settings, frame, lane_pixel, u)
ox, oy, oz, dx, dy, dz, tm = comps

perm = jax.random.permutation(jax.random.key(7), R)
shuf = lambda x: x[perm]

from raytrace_tpu.ops.pallas.allpairs_kernel import allpairs_nearest_record
from raytrace_tpu.ops.pallas.intersect_kernel import (
    pack_clusters, pack_prims, pallas_nearest_record,
)

tbl = pack_prims(scene.prims)
ctbl = pack_clusters(scene.prims)
n_prims = scene.prims.kind.shape[0]
g = R // 128
resh = lambda x: x.reshape(g, 128)


def run_allpairs(args):
    ox, oy, oz, dx, dy, dz, tm = (resh(a) for a in args)
    return allpairs_nearest_record(
        tbl, ox, oy, oz, dx, dy, dz, tm, n_prims=n_prims, t_min=1e-3,
        has_motion=scene.prims.has_motion,
        segments=scene.prims.kind_segments, ctbl=ctbl)[0]


def run_clustered(args):
    ox, oy, oz, dx, dy, dz, tm = (resh(a) for a in args)
    return pallas_nearest_record(
        tbl, ctbl, ox, oy, oz, dx, dy, dz, tm, n_prims=n_prims, t_min=1e-3,
        has_motion=scene.prims.has_motion, has_box=scene.prims.has_box,
        segments=scene.prims.kind_segments,
        kinds=scene.prims.kinds_present)[0]


def timeit(label, f, args, reps=3):
    jf = jax.jit(f)
    out = jf(args)
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(reps):
        # vary inputs: nudge origins by r (CLAUDE.md: never repeat
        # identical calls on the tunnel)
        a2 = tuple(x + r * 1e-4 for x in args[:3]) + args[3:]
        t0 = time.time()
        out = jf(a2)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1e3:.2f} ms / 2^18 rays "
          f"-> {R/best/1e6:.2f}M rays/s", flush=True)


coh = (ox, oy, oz, dx, dy, dz, tm)
inc = tuple(shuf(a) for a in coh)
timeit("allpairs  coherent  ", run_allpairs, coh)
timeit("clustered coherent  ", run_clustered, coh)
timeit("allpairs  incoherent", run_allpairs, inc)
timeit("clustered incoherent", run_clustered, inc)
