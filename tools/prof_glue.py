"""Split one diff-wavefront iteration into kernel vs XLA-glue cost.

Times, each as a 200-iteration lax.scan with carried state (inputs vary
per iteration; value-fetch at the end — CLAUDE.md):
  A. the forward bounce megakernel alone;
  B. the full forward iteration body (regen + RNG + camera + kernel);
  C. the backward replay kernel alone (bounce_bwd_megakernel);
  D. the full fwd+bwd via jax.grad over a scan of B-bodies.
B-A = forward glue; (D-B)-C = backward glue.  Sizes the payoff of fusing
regeneration/RNG/accumulation into the kernels (docs/ROADMAP.md §1).
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
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.diff.gradients import partition, render_loss_wavefront

scene, settings = _cornell_scene_and_settings(width=600, spp=200, depth=50)
settings = settings.replace(rr_depth=2)
R = 1 << 18
N_ITERS = 200
n_pix = settings.image_width * settings.image_height
rnd = np.random.RandomState(0)


def timed(make, label, reps=3):
    f = jax.jit(make)
    out = f(0)
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.time()
        v = float(jnp.asarray(f(r + 1)).ravel()[0])
        assert v == v
        best = min(best, time.time() - t0)
    print(f"{label}: {best/N_ITERS*1e3:.3f} ms/iter ({best:.3f}s "
          f"/ {N_ITERS})", flush=True)
    return best


def scan_fwd_kernel(seed):
    """A: forward bounce megakernel alone, carried comps."""
    from raytrace_tpu.render.integrator import (
        bounce_mega_soa, n_bounce_uniforms,
    )
    n_u = n_bounce_uniforms(scene)
    key = rng.base_key(seed)
    o = jnp.asarray(rnd.uniform(100, 400, (3, R)), jnp.float32)
    d = jnp.asarray(rnd.normal(size=(3, R)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    comps0 = (o[0], o[1], o[2], d[0], d[1], d[2], jnp.zeros((R,)))
    thr0 = tuple(jnp.ones((R,)) for _ in range(3))

    def body(carry, i):
        comps, thr = carry
        keys = rng.ray_keys_fast(key, jnp.arange(R, dtype=jnp.int32), i)
        uni = rng.uniform_block(keys, n_u)
        z = jnp.zeros((R,))
        comps2, contrib, thr2, alive2, died, idx = bounce_mega_soa(
            scene, settings, comps, uni, (z, z, z), thr,
            jnp.ones((R,), bool), with_idx=True)
        # keep rays inside the box so the scan stays busy
        comps2 = tuple(jnp.where(jnp.isfinite(c), c, cc)
                       for c, cc in zip(comps2, comps))
        thr2 = tuple(jnp.maximum(t, 0.05) for t in thr2)
        return (comps2, thr2), None

    (comps, thr), _ = jax.lax.scan(body, (comps0, thr0), jnp.arange(N_ITERS))
    return comps[0].sum() + thr[0].sum()


def scan_fwd_body(seed):
    """B: the full forward iteration body via trace_wavefront_diff."""
    from raytrace_tpu.render.integrator import trace_wavefront_diff
    pix = jnp.arange(R, dtype=jnp.int32) % n_pix
    mean, done = trace_wavefront_diff(
        scene, settings, rng.base_key(seed), pix, 64, n_iters=N_ITERS,
        remat=False)
    return mean.sum() + done.sum()


def scan_bwd_kernel(seed):
    """C: backward replay kernel alone (Cornell rows), carried cts."""
    from raytrace_tpu.diff.lane_replay import replay_bwd_soa
    from raytrace_tpu.render.integrator import n_bounce_uniforms
    n_u = n_bounce_uniforms(scene)
    key = rng.base_key(seed)
    o = jnp.asarray(rnd.uniform(100, 400, (3, R)), jnp.float32)
    d = jnp.asarray(rnd.normal(size=(3, R)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    comps = (o[0], o[1], o[2], d[0], d[1], d[2], jnp.zeros((R,)))
    thr = tuple(jnp.ones((R,)) for _ in range(3))
    idx = jnp.asarray(rnd.randint(0, scene.prims.kind.shape[0], (R,)),
                      jnp.int32)
    alive = jnp.ones((R,), bool)

    def body(ct, i):
        keys = rng.ray_keys_fast(key, jnp.arange(R, dtype=jnp.int32), i)
        uni = rng.uniform_block(keys, n_u)
        u_cols = tuple(uni[:, k] for k in range(8))
        g_scene, g_lane = replay_bwd_soa(
            scene, settings, comps, u_cols, thr, alive, idx, ct,
            has_motion=False, t_min=float(settings.t_min),
            use_pallas=True)
        ct2 = tuple(jnp.clip(g, -1.0, 1.0) + c * 0.5
                    for g, c in zip(g_lane[:12] + (ct[-1],)[:0]
                                    if len(g_lane) >= 12 else g_lane,
                                    ct))
        # g_lane has 10 entries; recycle into 12 cts
        ct2 = tuple(jnp.clip(g_lane[k % 10], -1.0, 1.0) + ct[k] * 0.5
                    for k in range(12))
        return ct2, None

    ct0 = tuple(jnp.ones((R,)) * 0.1 for _ in range(12))
    ct, _ = jax.lax.scan(body, ct0, jnp.arange(N_ITERS))
    return ct[0].sum()


def full_fwd_bwd(seed):
    """D: full fwd+bwd (the bench path) at N_ITERS, no schedule."""
    params, statics = partition(scene)
    pix = jnp.arange(R, dtype=jnp.int32) % n_pix
    target = jnp.zeros((R, 3), jnp.float32)
    (l, f), g = jax.value_and_grad(render_loss_wavefront, has_aux=True)(
        params, statics, settings, rng.base_key(seed), pix, target,
        spp=64, n_iters=N_ITERS, remat=False)
    return l


if __name__ == "__main__":
    which = sys.argv[1:] or ["A", "B", "C", "D"]
    if "A" in which:
        timed(scan_fwd_kernel, "A fwd kernel-only")
    if "B" in which:
        timed(scan_fwd_body, "B fwd full body")
    if "C" in which:
        timed(scan_bwd_kernel, "C bwd kernel-only")
    if "D" in which:
        timed(full_fwd_bwd, "D fwd+bwd full")
