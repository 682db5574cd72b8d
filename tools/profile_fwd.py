"""Profile the forward wavefront: megakernel alone vs full iteration."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.render.integrator import (
    bounce_mega_soa, n_bounce_uniforms, trace_wavefront_stationary,
)

scene, settings = _cornell_scene_and_settings(width=600, spp=64, depth=50)
n_pix = 600 * 600
key = rng.base_key(0)


def timeit(label, f, n=3):
    out = f(); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt, out


# full wavefront with stats
fw = jax.jit(lambda: trace_wavefront_stationary(scene, settings, key, n_pix,
                                                64, with_stats=True))
dt, (acc, stats) = timeit("wavefront 600px x 64spp", fw, n=2)
iters = int(stats["iterations"])
segs = int(stats["segments"])
lanes = int(stats["lanes"])
print(f"  iters={iters} segments={segs/1e6:.1f}M lanes={lanes} "
      f"occupancy={segs/(iters*lanes):.3f} "
      f"ms/iter={dt*1e3/iters:.3f}", flush=True)

# megakernel alone, same lane count
n_u = n_bounce_uniforms(scene)
lanes_al = lanes
z = jnp.zeros((lanes_al,), jnp.float32)
o = jnp.ones((lanes_al,), jnp.float32)
comps = (z, z, z + 278.0, z, z, o, z)
uniforms = jax.random.uniform(jax.random.key(1), (lanes_al, n_u + 5))
alive = jnp.ones((lanes_al,), bool)

mk = jax.jit(lambda: bounce_mega_soa(scene, settings, comps, uniforms,
                                     (z, z, z), (o, o, o), alive))
dtk, _ = timeit(f"megakernel alone ({lanes_al} lanes)", mk, n=10)
print(f"  kernel share of iter: {dtk/(dt/iters)*100:.0f}%", flush=True)

# RNG block alone
keys = rng.ray_keys_fast(key, jnp.arange(lanes_al, dtype=jnp.int32),
                         jnp.zeros(lanes_al, jnp.int32))
ub = jax.jit(lambda: rng.uniform_block(rng.mix_depth(keys, jnp.zeros(lanes_al, jnp.int32)), n_u + 5))
dtu, _ = timeit("uniform_block alone", ub, n=10)
print(f"  rng share of iter: {dtu/(dt/iters)*100:.0f}%", flush=True)
