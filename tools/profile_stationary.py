"""Occupancy/timing probe of trace_wavefront_stationary at bench configs.

Usage: python tools/profile_stationary.py [scene] [--spp N] [--rot k1,k2,..]
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scenes"))

from raytrace_tpu.core import rng
from raytrace_tpu.render.integrator import trace_wavefront_stationary

p = argparse.ArgumentParser()
p.add_argument("scene", nargs="?", default="demo2")
p.add_argument("--width", type=int, default=400)
p.add_argument("--spp", type=int, default=50)
p.add_argument("--depth", type=int, default=4)
p.add_argument("--rot", default="1,5,8")
cli = p.parse_args()

mod = __import__(cli.scene)
args = argparse.Namespace(width=cli.width, spp=cli.spp, depth=cli.depth,
                          seed=1)
scene, settings, seed = mod.build(args)
n_pix = settings.image_width * settings.image_height
print(f"scene={cli.scene} n_pix={n_pix} spp={cli.spp}", flush=True)

for k in [int(x) for x in cli.rot.split(",")]:
    if cli.spp % k:
        print(f"rot={k}: skipped (spp % k != 0)", flush=True)
        continue
    f = jax.jit(lambda key, k=k: trace_wavefront_stationary(
        scene, settings, key, n_pix, cli.spp, with_stats=True, rotate_k=k))
    acc, stats = f(rng.base_key(0))
    jax.block_until_ready(acc)
    best = None
    for rep in range(2):
        t0 = time.time()
        acc, stats = f(rng.base_key(rep + 1))
        jax.block_until_ready(acc)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    it = int(stats["iterations"])
    seg = int(stats["segments"])
    lanes = int(stats["lanes"])
    print(f"rot={k}: {best:.2f}s iters={it} {best*1e3/it:.2f} ms/iter "
          f"occ={seg/(it*lanes):.3f} mean={float(acc.mean())/cli.spp:.4f} "
          f"rays/s={n_pix*cli.spp/best/1e6:.2f}M", flush=True)
