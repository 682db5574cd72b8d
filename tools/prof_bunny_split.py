"""Bunny diff cost split: loss-only (forward scan) vs value_and_grad at
the prof_bunny_grad config.  The difference is the backward's marginal
cost (replay kernel + gathers + residual traffic)."""
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
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "scenes"))

import argparse

import bunny_test
from raytrace_tpu.core import rng
from raytrace_tpu.diff.gradients import partition, render_loss_wavefront


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1 << 17)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    sargs = argparse.Namespace(width=600, spp=args.spp, depth=10)
    scene, settings, _ = bunny_test.build(sargs)
    settings = settings.replace(rr_depth=2)
    params, statics = partition(scene)
    n_pix = settings.image_width * settings.image_height
    pix = jnp.arange(args.lanes, dtype=jnp.int32) % n_pix
    target = jnp.zeros((args.lanes, 3), jnp.float32)
    schedule = ((30, 1 << 15), (70, 1 << 13)) if args.iters <= 64 else None

    loss_fn = jax.jit(render_loss_wavefront,
                      static_argnames=("spp", "n_iters", "remat",
                                      "schedule"))
    vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
                 static_argnames=("spp", "n_iters", "remat", "schedule"))

    def timed(f, label, reps=4):
        # every timed region must end by FETCHING a value (CLAUDE.md:
        # block_until_ready can return before execution on the tunnel)
        float(f(0))
        best = float("inf")
        for r in range(reps):
            t0 = time.time()
            lv = float(f(r + 1))
            assert lv == lv
            best = min(best, time.time() - t0)
        rays = args.lanes * args.spp
        print(f"{label}: {best:.3f}s  {rays/best/1e6:.2f}M rays/s",
              flush=True)
        return best

    def run_loss(seed):
        l, f = loss_fn(params, statics, settings, rng.base_key(seed), pix,
                       target, spp=args.spp, n_iters=args.iters,
                       remat=False, schedule=schedule)
        return l

    def run_vg(seed):
        (l, f), g = vg(params, statics, settings, rng.base_key(seed), pix,
                       target, spp=args.spp, n_iters=args.iters,
                       remat=False, schedule=schedule)
        # fold a grad leaf into the fetched scalar so the backward is
        # actually drained before the clock stops
        return l + jnp.sum(g.prims.p0) * 1e-30 + jnp.sum(g.prims.e1) * 1e-30

    t_f = timed(run_loss, "loss-only (fwd scan)")
    t_vg = timed(run_vg, "value_and_grad     ")
    print(f"backward marginal: {t_vg - t_f:.3f}s "
          f"({100 * (t_vg - t_f) / t_vg:.0f}% of fwd+bwd)", flush=True)


if __name__ == "__main__":
    main()
