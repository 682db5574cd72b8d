"""On-device per-iteration cost breakdown: fori_loop over body variants."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.render.camera import camera_frame, generate_ray_components
from raytrace_tpu.render.integrator import bounce_mega_soa, n_bounce_uniforms

scene, settings = _cornell_scene_and_settings(width=600, spp=64, depth=50)
LANES = 360064
ITERS = 200
n_u = n_bounce_uniforms(scene)
key = rng.base_key(0)
frame = camera_frame(settings)
lane_pixel = jnp.minimum(jnp.arange(LANES, dtype=jnp.int32), 600 * 600 - 1)
keys0 = rng.ray_keys_fast(key, lane_pixel, jnp.zeros(LANES, jnp.int32))


def timeit(label, f, n=2):
    out = f(); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1e3/ITERS:.3f} ms/iter", flush=True)


z = jnp.zeros((LANES,), jnp.float32)
o = jnp.ones((LANES,), jnp.float32)
comps0 = (z, z, z + 278.0, z, z, o, z)
uni0 = jax.random.uniform(jax.random.key(1), (n_u + 5, LANES)).T


def loop(body):
    def f():
        def it(i, st):
            return body(i, st)
        init = (comps0, (z, z, z), (o, o, o), jnp.ones((LANES,), bool))
        return jax.lax.fori_loop(0, ITERS, it, init)
    return jax.jit(f)


# 1. mega kernel only (constant uniforms)
def body_mega(i, st):
    comps, rad, thr, alive = st
    comps, rad, thr, alive, died = bounce_mega_soa(
        scene, settings, comps, uni0, rad, thr, alive)
    alive = alive | died  # keep lanes hot
    return comps, rad, thr, alive


# 2. rng only
def body_rng(i, st):
    comps, rad, thr, alive = st
    dkeys = rng.mix_depth(keys0, jnp.full((LANES,), i, jnp.int32))
    uniforms = rng.uniform_block(dkeys, n_u + 5)
    rad = tuple(r + uniforms[:, k] for k, r in enumerate(rad))
    return comps, rad, thr, alive


# 3. rng + camera regen
def body_rng_cam(i, st):
    comps, rad, thr, alive = st
    dkeys = rng.mix_depth(keys0, jnp.full((LANES,), i, jnp.int32))
    uniforms = rng.uniform_block(dkeys, n_u + 5)
    nc = generate_ray_components(settings, frame, lane_pixel, uniforms[:, n_u:])
    comps = tuple(jnp.where(alive, a, b) for a, b in zip(nc, comps))
    return comps, rad, thr, alive


# 4. full: rng + camera + mega
def body_full(i, st):
    comps, rad, thr, alive = st
    dkeys = rng.mix_depth(keys0, jnp.full((LANES,), i, jnp.int32))
    uniforms = rng.uniform_block(dkeys, n_u + 5)
    nc = generate_ray_components(settings, frame, lane_pixel, uniforms[:, n_u:])
    comps = tuple(jnp.where(alive, a, b) for a, b in zip(nc, comps))
    comps, rad, thr, alive, died = bounce_mega_soa(
        scene, settings, comps, uniforms, rad, thr, alive)
    alive = alive | died
    return comps, rad, thr, alive


timeit("mega only       ", loop(body_mega))
timeit("rng only        ", loop(body_rng))
timeit("rng+camera      ", loop(body_rng_cam))
timeit("rng+camera+mega ", loop(body_full))
