"""Sweep remat x lane-count for the diff wavefront on the real chip."""
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
    from raytrace_tpu.diff.gradients import partition, render_loss_wavefront

    scene, settings = _cornell_scene_and_settings(width=600, spp=200,
                                                  depth=50)
    settings_rr = settings.replace(rr_depth=2)
    key = rng.base_key(0)
    n_pix = settings.image_width * settings.image_height
    params, statics = partition(scene)
    spp = 64

    vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
                 static_argnames=("spp", "n_iters", "remat"))

    for pix_pow in (17, 18):
        for remat in (True, False):
            bwd_pix = 1 << pix_pow
            n_iters = int(2.2 * spp) + 55
            pix = jnp.arange(0, bwd_pix, dtype=jnp.int32) % n_pix
            target = jnp.zeros((bwd_pix, 3), jnp.float32)
            try:
                (loss, frac), grads = vg(params, statics, settings_rr, key,
                                         pix, target, spp=spp,
                                         n_iters=n_iters, remat=remat)
                jax.block_until_ready((loss, grads))
                t0 = time.time()
                for _ in range(2):
                    (loss, frac), grads = vg(params, statics, settings_rr,
                                             key, pix, target, spp=spp,
                                             n_iters=n_iters, remat=remat)
                jax.block_until_ready((loss, grads))
                dt = (time.time() - t0) / 2
                log(f"pix=2^{pix_pow} remat={remat}: {dt*1e3:.1f} ms  "
                    f"{bwd_pix*spp/dt/1e6:.1f}M rays/s  "
                    f"frac={float(frac):.4f}")
            except Exception as e:
                log(f"pix=2^{pix_pow} remat={remat}: FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}")
                raise


if __name__ == "__main__":
    main()
