"""Empirical v5e roofline + where the bounce megakernel sits on it.

Measures, on the real chip:
  1. HBM stream bandwidth (read+write of a large f32 array),
  2. VPU f32 elementwise peak (chained FMA),
  3. MXU bf16 matmul peak,
  4. the Cornell-bench forward megakernel per-iteration time,
then reports the kernel's arithmetic intensity and achieved fraction of
the relevant ceiling.  Feeds docs/ROOFLINE.md (VERDICT round-1 item 10).

Each repetition varies inputs (CLAUDE.md: never time identical calls).
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def best_time(f, args_fn, reps=5):
    """Times f(args) until a VALUE is fetched: the tunnel's
    block_until_ready can return before execution (measured: a 1 GiB
    stream "completed" in 0.06 ms, then a 394 s backlog surfaced on the
    first float() fetch), so every micro-kernel here returns a scalar
    and the clock stops only when its value arrives."""
    float(f(args_fn(0)))
    best = float("inf")
    for r in range(reps):
        a = args_fn(r + 1)
        jax.block_until_ready(a)
        t0 = time.time()
        v = float(f(a))
        best = min(best, time.time() - t0)
        assert v == v  # NaN guard: the value must be real
    return best


# Every micro-kernel is a data-dependent fori_loop of NON-collapsible
# ops: a plain repeated x*a+b chain is affine (XLA folds it to one FMA)
# and jnp.full matmul operands are rank-1 (foldable) -- both measured
# "impossibly fast" through the tunnel before this was fixed.

# ---- 1. HBM bandwidth: read+write 1 GiB per loop iteration ---------------
N = 1 << 28  # 268M f32 = 1 GiB
S_ITERS = 20


@jax.jit
def stream(x):
    def it(i, y):
        # nonlinear: a repeated affine add would fold to one pass
        return y * 1.0000001 + y * y * 1e-12
    return jax.lax.fori_loop(0, S_ITERS, it, x)[::1 << 20].sum()


t = best_time(stream, lambda r: jnp.full((N,), float(r), jnp.float32))
hbm_gbs = 2 * N * 4 * S_ITERS / t / 1e9
print(f"HBM stream: {hbm_gbs:.0f} GB/s  ({t*1e3:.2f} ms for "
      f"{2*S_ITERS} GiB)", flush=True)

# ---- 2. VPU f32 peak: nonlinear chain, VMEM-resident working set ---------
M = 1 << 20  # 4 MB working set stays in VMEM across the unrolled chain
K = 256
V_ITERS = 400   # long enough that the ~20 ms tunnel fetch latency is noise


@jax.jit
def fma_chain(x):
    def it(i, y):
        y = y + i.astype(jnp.float32) * 1e-12
        for _ in range(K):
            y = y * 0.999999 + y * y * 1e-9   # 3 flops, non-affine
        return y
    return jax.lax.fori_loop(0, V_ITERS, it, x)[::1 << 16].sum()


t = best_time(fma_chain,
              lambda r: jnp.full((M,), 0.1 + r * 1e-3, jnp.float32))
vpu_tflops = 3 * K * V_ITERS * M / t / 1e12
print(f"VPU f32 chain: {vpu_tflops:.2f} TFLOP/s  ({t*1e3:.2f} ms)",
      flush=True)

# ---- 3. MXU bf16 peak: chained matmuls on full-rank operands -------------
D = 4096
MM_ITERS = 40


@jax.jit
def mm(ab):
    a, b = ab

    def it(i, x):
        return ((x + i.astype(jnp.bfloat16) * 1e-3) @ b) * jnp.bfloat16(
            1.0 / D)
    return jax.lax.fori_loop(0, MM_ITERS, it, a).astype(jnp.float32)[::64, ::64].sum()


def mk(r):
    k = jax.random.key(r)
    a = jax.random.normal(k, (D, D), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(r + 100), (D, D), jnp.bfloat16)
    return a, b


t = best_time(mm, mk, reps=4)
mxu_tflops = 2 * D**3 * MM_ITERS / t / 1e12
print(f"MXU bf16 matmul: {mxu_tflops:.1f} TFLOP/s  ({t*1e3:.2f} ms)",
      flush=True)

# ---- 4. Cornell forward megakernel per-iteration -------------------------
from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.render.camera import camera_frame, generate_ray_components
from raytrace_tpu.render.integrator import (
    bounce_mega_soa, n_bounce_uniforms,
)

scene, settings = _cornell_scene_and_settings(width=600, spp=200, depth=50)
LANES_N = 1 << 18
ITERS = 50
n_u = n_bounce_uniforms(scene)
frame = camera_frame(settings)
n_pix = settings.image_width * settings.image_height
lane_pixel = jnp.arange(LANES_N, dtype=jnp.int32) % n_pix
n_prims = int(scene.prims.kind.shape[0])


def mega_loop(seed):
    key = rng.base_key(0)
    keys0 = rng.ray_keys_fast(key, lane_pixel, jnp.full((LANES_N,), seed,
                                                        jnp.int32))

    def it(i, st):
        comps, rad, thr, alive = st
        dkeys = rng.mix_depth(keys0, jnp.full((LANES_N,), i, jnp.int32))
        uniforms = rng.uniform_block(dkeys, n_u + 5)
        nc = generate_ray_components(settings, frame, lane_pixel,
                                     uniforms[:, n_u:])
        comps = tuple(jnp.where(alive, c, n) for c, n in zip(comps, nc))
        comps, rad, thr, alive, died = bounce_mega_soa(
            scene, settings, comps, uniforms, rad, thr, alive)
        return comps, rad, thr, alive | died

    z = jnp.zeros((LANES_N,), jnp.float32)
    o = jnp.ones((LANES_N,), jnp.float32)
    st = ((z, z, z, z, z, o, z), (z, z, z), (o, o, o),
          jnp.ones((LANES_N,), bool))
    st = jax.lax.fori_loop(0, ITERS, it, st)
    return st[1][0][:: 1 << 12].sum()


t = best_time(jax.jit(mega_loop), lambda r: jnp.int32(r), reps=3)
per_iter = t / ITERS
print(f"full bounce iteration (mega, {n_prims} prims, 2^18 lanes): "
      f"{per_iter*1e6:.0f} us/iter", flush=True)

# arithmetic accounting (counted from bounce_kernel.py dataflow):
#   intersect: ~40 f32 ops per (lane, prim) incl. slab/quadratic + argmin
#   shading/sampling/MIS: ~250 f32 ops per lane
flops = LANES_N * (40 * n_prims + 250)
# HBM traffic/lane: SoA state in+out (7 comps, rad 3, thr 3, alive) x4B x2
#   + uniforms (n_u+5 cols) + keys --> ~220 B/lane/iter
bytes_ = LANES_N * 220
print(f"  est. {flops/1e6:.0f} MFLOP/iter, {bytes_/1e6:.0f} MB/iter -> "
      f"intensity {flops/bytes_:.1f} flop/B", flush=True)
print(f"  achieved {flops/per_iter/1e12:.2f} TFLOP/s "
      f"= {flops/per_iter/1e12/vpu_tflops*100:.0f}% of VPU peak; "
      f"HBM {bytes_/per_iter/1e9:.0f} GB/s "
      f"= {bytes_/per_iter/hbm_gbs/1e9*100:.0f}% of stream", flush=True)
