"""Completion fraction + fwd+bwd time of the diff wavefront vs
(n_iters, rotate_k) at bench.py's Cornell config."""
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

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.diff.gradients import partition, render_loss_wavefront

scene, settings = _cornell_scene_and_settings(width=600, spp=200, depth=50)
settings = settings.replace(rr_depth=2)
params, statics = partition(scene)
key = rng.base_key(0)
bwd_pix = 1 << 18
bwd_spp = 64
n_pix = settings.image_width * settings.image_height
pix = jnp.arange(bwd_pix, dtype=jnp.int32) % n_pix
target = jnp.zeros((bwd_pix, 3), jnp.float32)

vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
             static_argnames=("spp", "n_iters", "remat", "rotate_k"))

for rot, iters in [(1, 195), (8, 195), (8, 170), (8, 155), (8, 145)]:
    (l, f), g = vg(params, statics, settings, key, pix, target,
                   spp=bwd_spp, n_iters=iters, remat=False, rotate_k=rot)
    jax.block_until_ready((l, g))
    t0 = time.time()
    for r in range(2):
        (l, f), g = vg(params, statics, settings, rng.base_key(r + 1), pix,
                       target, spp=bwd_spp, n_iters=iters, remat=False,
                       rotate_k=rot)
    jax.block_until_ready((l, g))
    dt = (time.time() - t0) / 2
    print(f"rot={rot} iters={iters}: {dt:.3f}s frac={float(f):.4f} "
          f"rays/s={bwd_pix*bwd_spp/dt/1e6:.1f}M", flush=True)
