"""A/B the segmented clustered vs segmented-flat Pallas intersect on the
demo2 primitive table (1408 rows: boxes + spheres + planes, motion), with
three ray populations:
  coherent    — scanline camera rays (tile-ordered primary bounce)
  semi        — origins in one small surface patch, hemisphere dirs
                (what a post-first-bounce block really looks like)
  incoherent  — random origins in the scene bounds, uniform sphere dirs
Run on the real chip (one process per mode -- jit trace caches can't
be reliably cleared in-process):
  for m in "" flat clustered; do RT_FORCE_LOOP=$m python tools/prof_demo2_intersect.py; done
"""
import argparse
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scenes"))

import raytrace_tpu.ops.pallas.intersect_kernel as ik

mod = __import__("demo2")
args = argparse.Namespace(width=400, spp=250, depth=4, seed=1)
scene, settings, seed = mod.build(args)
prims = scene.prims
n_prims = prims.kind.shape[0]
print(f"n_prims={n_prims} segments={prims.kind_segments} "
      f"motion={prims.has_motion} box={prims.has_box}", flush=True)

R = 704 * 128   # demo2 wavefront lane count at 400px
ITERS = 20
g = R // 128

tbl = ik.pack_prims(prims)
ctbl = ik.pack_clusters(prims)

rng = np.random.default_rng(0)
# coherent: pinhole scanline rays from the demo2 camera area
W, H = 512, 176
ii = np.arange(R) % W
jj = np.arange(R) // W % H
o_c = np.tile(np.asarray([[3.0, 1.5, -4.5]], np.float32), (R, 1))
d_c = np.stack([
    0.4 - ii / W * 0.8 - 0.45,
    0.3 - jj / H * 0.6 + 0.1,
    np.full((R,), 1.0),
], axis=-1)
# semi-coherent: origins in a 2-unit patch on the ground, cosine-ish dirs
o_s = rng.uniform([-1, 0, -1], [1, 0.4, 1], (R, 3))
d_s = rng.normal(size=(R, 3)) + np.asarray([0.0, 1.2, 0.0])
# incoherent: origins anywhere in the scene bounds, any direction
o_i = rng.uniform([-11, 0, -11], [11, 8, 11], (R, 3))
d_i = rng.normal(size=(R, 3))

f32 = lambda x: jnp.asarray(x, jnp.float32)
norm = lambda d: d / np.linalg.norm(d, axis=-1, keepdims=True)
tm = f32(rng.uniform(0, 1, R))


def bench(label, o, d):
    o = f32(o)
    d = f32(norm(d))
    resh = lambda x: x.reshape(g, 128)

    def run_once(i):
        oo = o + 0.001 * i
        if mode == "allpairs":
            from raytrace_tpu.ops.pallas.allpairs_kernel import (
                allpairs_nearest_record,
            )
            t, idx, *_ = allpairs_nearest_record(
                tbl, resh(oo[:, 0]), resh(oo[:, 1]), resh(oo[:, 2]),
                resh(d[:, 0]), resh(d[:, 1]), resh(d[:, 2]), resh(tm),
                n_prims=n_prims, t_min=1e-3, has_motion=prims.has_motion,
                segments=prims.kind_segments)
        else:
            t, idx, *_ = ik.pallas_nearest_record(
                tbl, ctbl, resh(oo[:, 0]), resh(oo[:, 1]), resh(oo[:, 2]),
                resh(d[:, 0]), resh(d[:, 1]), resh(d[:, 2]), resh(tm),
                n_prims=n_prims, t_min=1e-3, has_motion=prims.has_motion,
                has_box=prims.has_box, segments=prims.kind_segments,
                kinds=prims.kinds_present)
        return (jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)),
                jnp.sum(jnp.isfinite(t)))

    f = jax.jit(lambda: [run_once(jnp.float32(i)) for i in range(ITERS)])
    out = f()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = f()
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / ITERS)
    hits = int(out[0][1])
    print(f"{label}: {best*1e3:.2f} ms/iter ({R/best/1e6:.0f}M rays/s, "
          f"{hits}/{R} hit)", flush=True)


mode = os.environ.get("RT_FORCE_LOOP") or None
ik.FORCE_LOOP = mode
name = mode or "adaptive"
bench(f"{name:9s} coherent  ", o_c, d_c)
bench(f"{name:9s} semi      ", o_s, d_s)
bench(f"{name:9s} incoherent", o_i, d_i)
