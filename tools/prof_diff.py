"""Profile the differentiable wavefront: forward-only vs fwd+bwd.

Uses the exact bench.py shapes so compiles hit .jax_cache.
Run on the default platform (real TPU).
"""
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from __graft_entry__ import _cornell_scene_and_settings
    from raytrace_tpu.core import rng
    from raytrace_tpu.diff.gradients import (
        combine, partition, render_loss_wavefront,
    )
    from raytrace_tpu.render.integrator import trace_wavefront_diff

    scene, settings = _cornell_scene_and_settings(width=600, spp=200,
                                                  depth=50)
    settings_rr = settings.replace(rr_depth=2)
    log(f"devices: {jax.devices()}")
    key = rng.base_key(0)
    n_pix = settings.image_width * settings.image_height
    bwd_pix = 1 << 17
    bwd_spp = 64
    n_iters = int(2.2 * bwd_spp) + 55

    params, statics = partition(scene)

    # ---- forward-only diff wavefront (same fn, no grad) ----
    def fwd_only(params, statics, s, key, pix, target, spp, n_iters):
        from raytrace_tpu.diff.gradients import render_loss_wavefront
        return render_loss_wavefront(params, statics, s, key, pix, target,
                                     spp=spp, n_iters=n_iters)

    f_jit = jax.jit(fwd_only, static_argnames=("spp", "n_iters"))
    vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
                 static_argnames=("spp", "n_iters"))

    def run(fn, i, tag):
        start = (i * 131) % max(n_pix - bwd_pix, 1)
        pix = jnp.arange(start, start + bwd_pix, dtype=jnp.int32)
        target = jnp.zeros((bwd_pix, 3), jnp.float32)
        return fn(params, statics, settings_rr, key, pix, target,
                  spp=bwd_spp, n_iters=n_iters)

    # compile
    out = run(f_jit, 0, "fwd")
    jax.block_until_ready(out)
    log("fwd compiled")
    t0 = time.time()
    for i in range(3):
        out = run(f_jit, i, "fwd")
    jax.block_until_ready(out)
    dt_f = (time.time() - t0) / 3
    rays = bwd_pix * bwd_spp
    log(f"diff-forward only: {dt_f*1e3:.1f} ms  {rays/dt_f/1e6:.1f}M rays/s")

    out = run(vg, 0, "vg")
    jax.block_until_ready(out)
    log("vg compiled")
    t0 = time.time()
    for i in range(3):
        out = run(vg, i, "vg")
    jax.block_until_ready(out)
    dt_g = (time.time() - t0) / 3
    log(f"fwd+bwd: {dt_g*1e3:.1f} ms  {rays/dt_g/1e6:.1f}M rays/s")
    log(f"bwd/fwd ratio: {dt_g/dt_f - 1:.2f}x extra")

    # ---- also: non-diff stationary wavefront on same work (reference) ----
    from raytrace_tpu.render.render import render_accumulate
    acc, _ = render_accumulate(scene, settings_rr, spp=64, spp_chunk=64)
    acc.block_until_ready()
    t0 = time.time()
    acc, _ = render_accumulate(scene, settings_rr, spp=64, spp_chunk=64)
    acc.block_until_ready()
    dt_p = time.time() - t0
    log(f"production fwd (mega): {dt_p*1e3:.1f} ms  "
        f"{n_pix*64/dt_p/1e6:.1f}M rays/s")


if __name__ == "__main__":
    main()
