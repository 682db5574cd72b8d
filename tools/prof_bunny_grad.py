"""Mesh-scale differentiable rendering rate: fwd+bwd rays/s on the
4,968-tri bunny.  Default path (round 5): fused-iteration forward with
the in-kernel broadcast all-pairs intersect stage (RT_ITER_AP_MIN) +
pre-gathered regen backward (diff/fused_iter.py) + two-phase completion
— measured 10.4-10.6 M fwd+bwd rays/s (28 full + 10:32768,28:8192
peak; the default 30 full + 12:32768,30:8192 keeps completion margin)
vs 5.25-5.44 M for the clustered in-kernel loop, 2.71 M generic XLA
replay (--generic), and 1.78 M for the deleted round-4 self-gathering
kernel.

Usage: python tools/prof_bunny_grad.py [--generic]
"""
import argparse
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--generic", action="store_true",
                    help="force the generic XLA replay backward (the "
                         "pre-round-4 mesh-scale path) for the A/B")
    ap.add_argument("--lanes", type=int, default=1 << 17)
    ap.add_argument("--spp", type=int, default=16)
    # two-phase completion: full-width + compacted tail phases keeps
    # frac = 1.0; retuned for the ap intersect stage (round-5 sweep:
    # 28+10:32768,28:8192 = 10.56 M, 30-full default keeps margin)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--schedule", type=str, default=None,
                    help="comma list 'n1:w1,n2:w2' of compacted tail "
                         "phases (default 30:32768,70:8192)")
    args = ap.parse_args()

    if args.generic:
        # disable the fused driver so the wavefront falls back to the
        # unfused mega forward + generic XLA replay backward
        os.environ["RT_NO_FUSED_ITER"] = "1"

    import argparse as _ap
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "scenes"))
    import raytrace_tpu as rt
    import bunny_test
    from raytrace_tpu.core import rng
    from raytrace_tpu.diff.gradients import partition, render_loss_wavefront

    sargs = _ap.Namespace(width=600, spp=args.spp, depth=10)
    scene, settings, _ = bunny_test.build(sargs)
    settings = settings.replace(rr_depth=2)
    n = scene.prims.kind.shape[0]
    from raytrace_tpu.utils.engines import engine_report
    eng = engine_report(scene, settings, diff=True)
    print(f"prims={n} engines={eng}", file=sys.stderr, flush=True)

    params, statics = partition(scene)
    n_pix = settings.image_width * settings.image_height
    pix = jnp.arange(args.lanes, dtype=jnp.int32) % n_pix
    target = jnp.zeros((args.lanes, 3), jnp.float32)
    vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
                 static_argnames=("spp", "n_iters", "remat", "schedule"))
    if args.schedule:
        schedule = tuple(
            (int(p.split(":")[0]), int(p.split(":")[1]))
            for p in args.schedule.split(","))
    else:
        schedule = ((12, 1 << 15), (30, 1 << 13)) \
            if args.iters <= 64 else None

    def go(seed):
        return vg(params, statics, settings, rng.base_key(seed), pix,
                  target, spp=args.spp, n_iters=args.iters, remat=False,
                  schedule=schedule)

    (l, f), g = go(0)
    jax.block_until_ready((l, g))
    best = float("inf")
    frac = 1.0
    for r in range(3):
        t0 = time.time()
        (l, f), g = go(r + 1)
        jax.block_until_ready(g)
        lv = float(l)
        assert lv == lv
        best = min(best, time.time() - t0)
        frac = min(frac, float(f))
    rays = args.lanes * args.spp
    label = "generic-XLA-replay" if args.generic else "fused-pre"
    print(f"bunny fwd+bwd [{label}]: {rays/best/1e6:.2f}M rays/s "
          f"({best:.3f}s, frac={frac:.4f})", flush=True)


if __name__ == "__main__":
    main()
