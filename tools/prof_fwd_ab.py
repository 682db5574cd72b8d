"""Quick A/B of forward Cornell throughput to diagnose the r02 bench drop.

Run on the real chip:  python tools/prof_fwd_ab.py [reps]
Prints best-of-N forward exact + RR numbers with value-fetch timing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from __graft_entry__ import _cornell_scene_and_settings
    from raytrace_tpu.render.render import render_accumulate

    scene, settings = _cornell_scene_and_settings(width=600, spp=200, depth=50)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    n_pix = settings.image_width * settings.image_height
    fwd_spp = 64

    for label, s in [("exact", settings),
                     ("rr2", settings.replace(rr_depth=2))]:
        acc, _ = render_accumulate(scene, s, spp=fwd_spp, spp_chunk=fwd_spp)
        _ = float(acc[0, 0])
        best = float("inf")
        times = []
        for r in range(reps):
            t0 = time.time()
            acc, _ = render_accumulate(scene, s, seed=r + 1, spp=fwd_spp,
                                       spp_chunk=fwd_spp)
            _ = float(acc[0, 0])
            dt = time.time() - t0
            times.append(dt)
            best = min(best, dt)
        rays = n_pix * fwd_spp
        print(f"{label}: best {rays/best/1e6:.2f}M rays/s  "
              f"times={[f'{t:.3f}' for t in times]}", flush=True)


if __name__ == "__main__":
    main()
