"""Two-phase completion schedule A/B at bench.py's Cornell config.

Measures wall time + completion fraction of the diff wavefront for
candidate (n_iters_A, schedule) splits vs the single-phase 275-iteration
baseline, and reports the unfinished-lane count at candidate phase-A
cuts (to size the phase-B width).  Run on the real chip.
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

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.diff.gradients import partition, render_loss_wavefront

scene, settings = _cornell_scene_and_settings(width=600, spp=200, depth=50)
settings = settings.replace(rr_depth=2)
params, statics = partition(scene)
# Lane-shape sweep (RT_SPP/RT_LANES): the completion tail is the max
# over lanes of an spp-path sum, so its DEVIATION grows ~sqrt(spp)
# while the useful work grows ~spp — taller lanes (more spp, fewer
# lanes) spend a smaller fraction of iterations on the tail.
bwd_spp = int(os.environ.get("RT_SPP", "64"))
n_pix = settings.image_width * settings.image_height
N_LANES = 1 << int(os.environ.get("RT_LANES_LOG2", "18"))

vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
             static_argnames=("spp", "n_iters", "remat", "schedule"))


def run(iters, schedule=None, reps=3):
    pix = jnp.arange(N_LANES, dtype=jnp.int32) % n_pix
    target = jnp.zeros((N_LANES, 3), jnp.float32)

    def go(seed):
        return vg(params, statics, settings, rng.base_key(seed), pix,
                  target, spp=bwd_spp, n_iters=iters, remat=False,
                  schedule=schedule)

    (l, f), g = go(0)
    jax.block_until_ready((l, g))
    best = float("inf")
    fmin = 1.0
    for r in range(reps):
        t0 = time.time()
        (l, f), g = go(r + 1)
        jax.block_until_ready(g)
        lv = float(l)               # value fetch (CLAUDE.md)
        assert lv == lv
        best = min(best, time.time() - t0)
        fmin = min(fmin, float(f))
    print(f"iters={iters} sched={schedule}: {best:.3f}s frac={fmin:.5f} "
          f"rays/s={N_LANES*bwd_spp/best/1e6:.1f}M", flush=True)


def width_cost(widths=(1 << 18, 1 << 17, 1 << 16, 1 << 15, 1 << 13),
               iters=100, reps=3):
    """Per-iteration fwd+bwd cost vs lane width (fixed-overhead floor)."""
    target_cache = {}
    for w in widths:
        pix = jnp.arange(w, dtype=jnp.int32) % n_pix
        target = target_cache.setdefault(w, jnp.zeros((w, 3), jnp.float32))

        def go(seed):
            return vg(params, statics, settings, rng.base_key(seed), pix,
                      target, spp=bwd_spp, n_iters=iters, remat=False)

        (l, f), g = go(0)
        jax.block_until_ready((l, g))
        best = float("inf")
        for r in range(reps):
            t0 = time.time()
            (l, f), g = go(r + 1)
            jax.block_until_ready(g)
            assert float(l) == float(l)
            best = min(best, time.time() - t0)
        print(f"width=2^{w.bit_length()-1}: {best/iters*1e3:.3f} ms/iter "
              f"({best:.3f}s / {iters} iters)", flush=True)


def interleaved(cands, reps=5):
    """Round-robin timing of schedule candidates to cancel contention."""
    pix = jnp.arange(N_LANES, dtype=jnp.int32) % n_pix
    target = jnp.zeros((N_LANES, 3), jnp.float32)

    def make(iters, schedule):
        def go(seed):
            return vg(params, statics, settings, rng.base_key(seed), pix,
                      target, spp=bwd_spp, n_iters=iters, remat=False,
                      schedule=schedule)
        return go

    gos = [make(i, s) for i, s in cands]
    for go in gos:                       # compile
        (l, f), g = go(0)
        jax.block_until_ready((l, g))
    best = [float("inf")] * len(cands)
    frac = [1.0] * len(cands)
    for r in range(reps):
        for k, go in enumerate(gos):
            t0 = time.time()
            (l, f), g = go(r + 1)
            jax.block_until_ready(g)
            assert float(l) == float(l)
            best[k] = min(best[k], time.time() - t0)
            frac[k] = min(frac[k], float(f))
    for k, (i, s) in enumerate(cands):
        print(f"iters={i} sched={s}: {best[k]:.3f}s frac={frac[k]:.5f} "
              f"rays/s={N_LANES*bwd_spp/best[k]/1e6:.1f}M", flush=True)


def unfinished_counts(cuts):
    """Forward-only: how many of the 2^18 lanes are unfinished after
    each candidate phase-A iteration count (sizes the phase-B width)."""
    from raytrace_tpu.render.integrator import trace_wavefront_diff

    pix = jnp.arange(N_LANES, dtype=jnp.int32) % n_pix

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def done_at(seed, n):
        _, done = trace_wavefront_diff(
            scene, settings, rng.base_key(seed), pix, bwd_spp, n_iters=n,
            remat=False)
        return jnp.sum(done < bwd_spp)

    for n in cuts:
        cnt = max(int(done_at(s, n)) for s in range(3))
    # NB: done<spp counts lanes with ANY sample missing == unfinished
        print(f"  phase-A cut {n}: unfinished lanes <= {cnt} "
              f"({cnt/N_LANES*100:.3f}%)", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "width":
        width_cost()
    if mode == "inter":
        interleaved([
            (210, ((30, 1 << 14), (95, 1 << 12))),     # current bench
            (200, ((25, 1 << 15), (110, 1 << 13))),
            (195, ((20, 1 << 16), (25, 1 << 14), (95, 1 << 12))),
            (190, ((15, 1 << 16), (20, 1 << 15), (30, 1 << 13),
                   (80, 1 << 12))),
            (205, ((25, 1 << 14), (100, 1 << 12))),
            (275, None),                               # single-phase ref
        ])
    if mode in ("counts", "all"):
        unfinished_counts([150, 160, 170, 185, 200])
    if mode in ("ab", "all"):
        # measured unfinished-lane counts (max over 3 seeds, 2^18 lanes):
        # 185:68.7k 190:50.9k 200:23.5k 210:8.6k 220:2.5k 230:598
        # 240:116 250:30 260:3 — widths sized with >=1.4x margin
        run(275)                                     # single-phase baseline
        run(185, ((15, 1 << 17), (20, 1 << 15), (30, 1 << 13),
                  (60, 1 << 12)))
        run(190, ((20, 1 << 17), (30, 1 << 15), (80, 1 << 13)))
        run(200, ((20, 1 << 15), (30, 1 << 13), (80, 1 << 12)))
