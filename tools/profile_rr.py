"""Measure Russian roulette effect on forward wavefront + fwd/bwd."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.diff.gradients import partition, render_loss_wavefront
from raytrace_tpu.render.integrator import trace_wavefront_stationary

scene, settings = _cornell_scene_and_settings(width=600, spp=64, depth=50)
n_pix = 600 * 600
key = rng.base_key(0)


def timeit(label, f, n=2):
    out = f(); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt, out


for rrd in (None, 3, 5):
    s = settings.replace(rr_depth=rrd) if rrd else settings
    fw = jax.jit(lambda s=s: trace_wavefront_stationary(
        scene, s, key, n_pix, 64, with_stats=True))
    dt, (acc, st) = timeit(f"fwd wavefront rr_depth={rrd}", fw)
    it = int(st["iterations"]); seg = int(st["segments"]); ln = int(st["lanes"])
    mean_b = float(jnp.mean(acc)) / 64
    print(f"  iters={it} occ={seg/(it*ln):.3f} "
          f"rays/s={n_pix*64/dt/1e6:.1f}M mean={mean_b:.4f}", flush=True)

params, statics = partition(scene)
vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
             static_argnames=("spp", "n_iters", "remat"))
bp, spp = 1 << 17, 64
pix = jnp.arange(bp, dtype=jnp.int32)
tgt = jnp.zeros((bp, 3), jnp.float32)
for rrd, ni_f in ((None, 3.3), (3, 2.6), (5, 2.9)):
    s = settings.replace(rr_depth=rrd) if rrd else settings
    ni = int(ni_f * spp) + (50 if rrd is None else 15)
    dt, ((l, frac), _g) = timeit(
        f"vg rr_depth={rrd} n_iters={ni}",
        lambda s=s, ni=ni: vg(params, statics, s, key, pix, tgt,
                              spp=spp, n_iters=ni))
    print(f"  -> {bp*spp/dt/1e6:.2f} M rays/s done={float(frac):.4f}",
          flush=True)
