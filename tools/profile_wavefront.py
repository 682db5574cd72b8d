"""Wall-clock per-iteration cost of the REAL trace_wavefront loop.

Compares against tools/profile_demo2.py's isolated stage costs to find
overhead that only exists in the production loop (regeneration, scatter
accumulation, SoA<->AoS conversion, RR, ...).

Usage: python tools/profile_wavefront.py [scene] [--spp N] [--lanes N]
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
from raytrace_tpu.render.integrator import trace_wavefront

p = argparse.ArgumentParser()
p.add_argument("scene", nargs="?", default="demo2")
p.add_argument("--width", type=int, default=400)
p.add_argument("--spp", type=int, default=64)
p.add_argument("--depth", type=int, default=4)
p.add_argument("--lanes", type=int, default=704 * 128)
cli = p.parse_args()

mod = __import__(cli.scene)
args = argparse.Namespace(width=cli.width, spp=cli.spp, depth=cli.depth,
                          seed=1)
scene, settings, seed = mod.build(args)
n_pix = settings.image_width * settings.image_height
print(f"scene={cli.scene} n_pix={n_pix} spp={cli.spp} lanes={cli.lanes}",
      flush=True)

f = jax.jit(lambda k: trace_wavefront(scene, settings, k, n_pix, cli.spp,
                                      cli.lanes, with_stats=True))
acc, stats = f(rng.base_key(0))
jax.block_until_ready(acc)
best = None
for rep in range(3):
    t0 = time.time()
    acc, stats = f(rng.base_key(rep + 1))
    jax.block_until_ready(acc)
    dt = time.time() - t0
    it = int(stats["iterations"])
    seg = int(stats["segments"])
    line = (f"rep{rep}: {dt:.2f}s iters={it} {dt*1e3/it:.2f} ms/iter "
            f"segments={seg} occ={seg/(it*cli.lanes):.3f} "
            f"rays/s={n_pix*cli.spp/dt/1e6:.2f}M")
    print(line, flush=True)
    best = min(best, dt) if best else dt
