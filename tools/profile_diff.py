"""Profile the differentiable wavefront: forward-only vs loss-only vs
value_and_grad, to see where fwd+bwd time goes. Run on TPU (default)."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.diff.gradients import partition, render_loss_wavefront

WIDTH = 600
SPP = 200
DEPTH = 50
BWD_PIX = 1 << 17
BWD_SPP = 64


def timeit(label, f, n=2):
    out = f()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt, out


def main():
    scene, settings = _cornell_scene_and_settings(width=WIDTH, spp=SPP,
                                                  depth=DEPTH)
    print("devices:", jax.devices(), flush=True)
    n_pix = settings.image_width * settings.image_height
    key = rng.base_key(0)
    params, statics = partition(scene)
    n_iters = int(3.3 * BWD_SPP) + DEPTH
    pix = jnp.arange(BWD_PIX, dtype=jnp.int32)
    target = jnp.zeros((BWD_PIX, 3), jnp.float32)

    # 1. production forward wavefront (megakernel), same ray count
    from raytrace_tpu.render.render import render_accumulate
    dt, _ = timeit("fwd mega wavefront (600px x 64spp)",
                   lambda: render_accumulate(scene, settings, spp=BWD_SPP,
                                             spp_chunk=BWD_SPP))
    print(f"  -> {n_pix*BWD_SPP/dt/1e6:.2f} M rays/s", flush=True)

    # 2. diff wavefront loss only (no grad)
    loss_fn = jax.jit(render_loss_wavefront,
                      static_argnames=("spp", "n_iters"))
    dt, (l, frac) = timeit(
        "diff wavefront fwd only (131k pix x 64spp)",
        lambda: loss_fn(params, statics, settings, key, pix, target,
                        spp=BWD_SPP, n_iters=n_iters))
    print(f"  -> {BWD_PIX*BWD_SPP/dt/1e6:.2f} M rays/s  done={float(frac):.4f}",
          flush=True)

    # 3. value_and_grad at several lane counts / spp / remat
    vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
                 static_argnames=("spp", "n_iters", "remat"))
    for log_pix, spp, remat in ((17, 64, True), (16, 64, False),
                                (17, 64, False), (17, 128, False),
                                (18, 64, False)):
        bp = 1 << log_pix
        ni = int(3.3 * spp) + DEPTH
        p = jnp.arange(bp, dtype=jnp.int32)
        tg = jnp.zeros((bp, 3), jnp.float32)
        try:
            dt, ((l, frac), _g) = timeit(
                f"vg pix=2^{log_pix} spp={spp} remat={remat}",
                lambda: vg(params, statics, settings, key, p, tg,
                           spp=spp, n_iters=ni, remat=remat))
        except Exception as e:
            print(f"vg pix=2^{log_pix} spp={spp} remat={remat}: "
                  f"FAILED {type(e).__name__}", flush=True)
            continue
        print(f"  -> {bp*spp/dt/1e6:.2f} M rays/s done={float(frac):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
