"""Split the diff-wavefront cost into forward vs backward at the bench
config: times loss-only (no grad), value_and_grad, and the marginal cost
per scan iteration of each.  Run on the real chip."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.diff.gradients import partition, render_loss_wavefront

scene, settings = _cornell_scene_and_settings(width=600, spp=200, depth=50)
settings = settings.replace(rr_depth=2)
params, statics = partition(scene)
bwd_pix = 1 << 18
bwd_spp = 64
n_pix = settings.image_width * settings.image_height
pix = jnp.arange(bwd_pix, dtype=jnp.int32) % n_pix
target = jnp.zeros((bwd_pix, 3), jnp.float32)

loss_fn = jax.jit(render_loss_wavefront,
                  static_argnames=("spp", "n_iters", "remat"))
vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
             static_argnames=("spp", "n_iters", "remat"))


def timed(f, label, reps=3):
    outs = f(rng.base_key(0))
    jax.block_until_ready(outs)
    t0 = time.time()
    for r in range(reps):
        outs = f(rng.base_key(r + 1))
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


results = {}
for iters in (155, 195):
    results[("fwd", iters)] = timed(
        lambda k: loss_fn(params, statics, settings, k, pix, target,
                          spp=bwd_spp, n_iters=iters, remat=False),
        f"loss-only  iters={iters}")
    results[("vg", iters)] = timed(
        lambda k: vg(params, statics, settings, k, pix, target,
                     spp=bwd_spp, n_iters=iters, remat=False),
        f"fwd+bwd    iters={iters}")

fwd_per = (results[("fwd", 195)] - results[("fwd", 155)]) / 40
vg_per = (results[("vg", 195)] - results[("vg", 155)]) / 40
print(f"marginal per-iteration: fwd {fwd_per*1e3:.3f} ms, "
      f"fwd+bwd {vg_per*1e3:.3f} ms, bwd {(vg_per-fwd_per)*1e3:.3f} ms "
      f"(ratio bwd/fwd {(vg_per-fwd_per)/max(fwd_per,1e-9):.2f})",
      flush=True)
