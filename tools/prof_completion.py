"""Completion fraction + cost of the diff wavefront vs n_iters, the
lax.cond skip-when-done wrapper, and lane count, at bench.py's Cornell
config.  Decides how bench.py reaches samples_completed == 1.0 without
paying worst-case iterations.  Run on the real chip."""
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
bwd_spp = 64
n_pix = settings.image_width * settings.image_height
from raytrace_tpu.render.integrator import lane_cost_estimate

vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
             static_argnames=("spp", "n_iters", "remat", "skip_done",
                              "rotate_k"))
cost_jit = jax.jit(lane_cost_estimate, static_argnames=("spp_est",))


def run(n_lanes, iters, skip, rot=1, bal=False, reps=2):
    pix = jnp.arange(n_lanes, dtype=jnp.int32) % n_pix
    target = jnp.zeros((n_lanes, 3), jnp.float32)
    cost = (cost_jit(scene, settings, rng.base_key(0), pix, spp_est=4)
            if bal else None)

    def go(seed):
        return vg(params, statics, settings, rng.base_key(seed), pix,
                  target, spp=bwd_spp, n_iters=iters, remat=False,
                  skip_done=skip, rotate_k=rot, pixel_cost=cost)

    (l, f), g = go(0)
    jax.block_until_ready((l, g))
    best = float("inf")
    for r in range(reps):
        t0 = time.time()
        (l, f), g = go(r + 1)
        jax.block_until_ready((l, g))
        best = min(best, time.time() - t0)
    print(f"lanes=2^{n_lanes.bit_length()-1} iters={iters} skip={int(skip)} "
          f"rot={rot} bal={int(bal)}: {best:.3f}s frac={float(f):.5f} "
          f"rays/s={n_lanes*bwd_spp/best/1e6:.1f}M", flush=True)


# cost-balanced antithetic assignment: completion-vs-iters curve
# (prepass cost is inside the timed region, as in bench.py)
for it in (152, 168, 184, 208):
    run(1 << 18, it, False, rot=4, bal=True)
# reference points: unbalanced full-completion + old default
run(1 << 18, 275, False)
run(1 << 18, 195, False)
