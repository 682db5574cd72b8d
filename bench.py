"""Benchmark: Cornell-box 200 spp forward+backward rays/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference renders Cornell 600px/200spp/depth50
with redirection in ~60 s on a laptop — ~1.2 M primary rays/s, CPU,
forward only.  ``vs_baseline`` is our fwd+bwd primary-rays/s over that
forward-only 1.2 M/s.

Runs on the default JAX platform (the driver provides the real TPU chip).
Extra diagnostics go to stderr; stdout carries only the JSON line.
"""
import json
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

BASELINE_RAYS_PER_S = 1.2e6

WIDTH = 600          # Cornell config (test/Main.hs:188-218)
SPP = 200
DEPTH = 50
BATCH_RAYS = 1 << 16
FWD_BATCHES = 12
BWD_BATCHES = 2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from __graft_entry__ import _cornell_scene_and_settings
    from raytrace_tpu.core import rng
    from raytrace_tpu.diff.gradients import (
        combine, partition, render_loss, render_tile,
    )

    scene, settings = _cornell_scene_and_settings(
        width=WIDTH, spp=SPP, depth=DEPTH)
    log(f"devices: {jax.devices()}")

    n_pix = settings.image_width * settings.image_height
    s_per = 4                       # samples per launch
    pix_per = BATCH_RAYS // s_per   # pixels per launch
    key = rng.base_key(0)
    sample_ids = jnp.arange(s_per, dtype=jnp.int32)

    def pix_batch(i):
        start = (i * pix_per * 9973) % max(n_pix - pix_per, 1)
        return jnp.arange(start, start + pix_per, dtype=jnp.int32)

    # ---- forward: the production persistent-wavefront path ----
    # Russian roulette from depth 2 (opt-in; unbiased, mean brightness
    # matches the exact estimator to 4 decimals — see
    # tests/test_integrator.py::test_russian_roulette_unbiased).  The
    # no-RR number (the reference's exact estimator) is also reported.
    from raytrace_tpu.render.render import render_accumulate

    # time the forward at the metric's OWN spp (200): the per-launch
    # drain tail (long-path lanes finishing last) amortizes over the
    # sample count, and a 64-spp probe under-reports the 200-spp
    # config's true rate by ~25% (97 vs 122 M measured round 5) —
    # consistent with tools/bench_scenes.py's end-to-end cornell row
    fwd_spp = SPP

    def time_fwd(s):
        acc, _ = render_accumulate(scene, s, spp=fwd_spp, spp_chunk=fwd_spp)
        acc.block_until_ready()
        best = float("inf")
        # vary the seed per rep (identical (program, inputs) repeats can
        # come back implausibly fast on the tunnel — CLAUDE.md)
        for r in range(3):
            t0 = time.time()
            acc, _ = render_accumulate(scene, s, seed=r + 1, spp=fwd_spp,
                                       spp_chunk=fwd_spp)
            # fetch a VALUE: the tunnel's block_until_ready can return
            # before execution (CLAUDE.md benchmarking notes); must not
            # be an assert — `python -O` would strip it
            v = float(acc[0, 0])
            if v != v:
                raise RuntimeError("NaN in forward accumulator")
            best = min(best, time.time() - t0)
        return n_pix * fwd_spp / best

    fwd_rays_s_exact = time_fwd(settings)
    log(f"forward (exact estimator): {fwd_rays_s_exact/1e6:.2f}M primary rays/s")
    settings_rr = settings.replace(rr_depth=2)
    fwd_rays_s = time_fwd(settings_rr)
    log(f"forward (RR from depth 2): {fwd_rays_s/1e6:.2f}M primary rays/s")

    # ---- forward+backward: differentiable regenerative wavefront ----
    from raytrace_tpu.diff.gradients import render_loss_wavefront

    params, statics = partition(scene)
    vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
                 static_argnames=("spp", "n_iters", "remat", "schedule"))
    bwd_pix = 1 << 18
    bwd_spp = 64
    # Two-phase completion schedule (tools/prof_twophase.py): the
    # completion tail is per-SAMPLE path-length variance — the max over
    # 262k lanes of a 64-path sum — so 99%+ of lanes finish by ~205
    # full-width iterations while guaranteed completion needs 275+.
    # Running the tail compacted (25 iters at 2^14 lanes, then 100 at
    # 2^12: unfinished-lane counts measured 210:8.6k 240:116 260:3, so
    # both widths carry >=1.4x margin) keeps frac=1.0 at ~14% less wall
    # time than the single-phase 275 (0.200 s vs 0.231 s interleaved
    # A/B on the fused-iteration kernel).  Estimator-exact: compacted
    # lanes keep their absolute (pixel, sample) RNG coordinates.
    n_iters = 205
    schedule = ((25, 1 << 14), (100, 1 << 12))

    def run_bwd(i):
        start = (i * 131) % max(n_pix - bwd_pix, 1)
        pix = jnp.arange(start, start + bwd_pix, dtype=jnp.int32) % n_pix
        target = jnp.zeros((bwd_pix, 3), jnp.float32)
        # remat=False: with the megakernel custom-VJP bounce the stored
        # residuals (~3 GB at these shapes) beat recomputing the forward
        # (tools/prof_diff2.py: 46.5M vs 36.9M rays/s)
        return vg(params, statics, settings_rr, key, pix, target,
                  spp=bwd_spp, n_iters=n_iters, remat=False,
                  schedule=schedule)

    (loss, frac), grads = run_bwd(0)
    jax.block_until_ready((loss, grads))
    log("fwd+bwd compiled")
    # the chip is shared and throughput swings 2-10x with contention:
    # take the best of three timed rounds (CLAUDE.md benchmarking notes)
    best_dt = float("inf")
    for r in range(3):
        t0 = time.time()
        for i in range(BWD_BATCHES):
            (loss, frac), grads = run_bwd(r * BWD_BATCHES + i)
        jax.block_until_ready(grads)
        lv = float(loss)                    # value fetch (CLAUDE.md)
        if lv != lv:
            raise RuntimeError("NaN loss in fwd+bwd bench")
        dt = time.time() - t0
        log(f"fwd+bwd round {r}: {dt:.3f}s")
        best_dt = min(best_dt, dt)
    dt = best_dt
    bwd_rays = BWD_BATCHES * bwd_pix * bwd_spp
    bwd_rays_s = bwd_rays / dt
    log(f"fwd+bwd: {bwd_rays_s/1e6:.2f}M primary rays/s "
        f"({bwd_rays} rays in {dt:.2f}s)  loss={float(loss):.4f} "
        f"samples_completed={float(frac):.4f}")

    # mesh-scale differentiability (VERDICT r4 #1: bunny >= 10 M): the
    # 4,968-tri bunny fwd+bwd rate, in its OWN subprocess so a tunnel
    # fault there cannot take down the headline metric above
    bunny_rays_s = None
    try:
        import re
        import subprocess
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "prof_bunny_grad.py")],
            capture_output=True, text=True, timeout=900)
        m = re.search(r"bunny fwd\+bwd \[fused-pre\]: ([0-9.]+)M",
                      out.stdout + out.stderr)
        if m:
            bunny_rays_s = float(m.group(1)) * 1e6
            log(f"bunny fwd+bwd: {m.group(1)}M rays/s")
    except Exception as e:              # pragma: no cover - best effort
        log(f"bunny sub-bench skipped ({type(e).__name__}: {e})")

    from raytrace_tpu.utils.engines import engine_report
    print(json.dumps({
        "metric": "cornell600_200spp_depth50_fwd_bwd_primary_rays_per_sec_per_chip",
        "value": round(bwd_rays_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(bwd_rays_s / BASELINE_RAYS_PER_S, 2),
        "forward_only_rays_per_sec": round(fwd_rays_s, 1),
        "forward_only_exact_estimator_rays_per_sec":
            round(fwd_rays_s_exact, 1),
        "samples_completed": round(float(frac), 4),
        "russian_roulette": "depth>=2 (unbiased; exact-estimator numbers also reported)",
        "bunny_mesh_fwd_bwd_rays_per_sec": bunny_rays_s,
        "engines": engine_report(scene, settings_rr, diff=True),
        "engines_fwd": engine_report(scene, settings_rr),
    }))


if __name__ == "__main__":
    # The tunnel TPU intermittently faults ("TPU worker crashed"); a JAX
    # client that saw a fault cannot recover in-process, so re-exec this
    # script in a fresh process (compiles are cached) up to 2 retries.
    try:
        main()
    except Exception as e:
        retries = int(os.environ.get("BENCH_RETRIES", "0"))
        log(f"bench failed ({type(e).__name__}: {e}); retry {retries}")
        if retries >= 2:
            raise
        os.environ["BENCH_RETRIES"] = str(retries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
