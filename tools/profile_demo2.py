"""On-device cost breakdown of one demo2 wavefront iteration.

demo2 is the weakest scene vs the reference (~3400 prims, 2 media,
image + marble textures -> XLA bounce).  Times each stage in a
fori_loop so per-iteration costs are isolated from launch overhead.
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
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scenes"))

import argparse

from raytrace_tpu.core import rng
from raytrace_tpu.render.camera import camera_frame, generate_ray_components
from raytrace_tpu.render.integrator import (
    _surface_hit, bounce, n_bounce_uniforms,
)
from raytrace_tpu.render.volumes import (
    volume_candidates, volume_candidates_pallas,
)
from raytrace_tpu.textures.textures import eval_texture

mod = __import__("demo2")
args = argparse.Namespace(width=400, spp=250, depth=4, seed=1)
scene, settings, seed = mod.build(args)

LANES = 704 * 128   # ~ n_pix of the 400px demo2 config
ITERS = 50
n_u = n_bounce_uniforms(scene)
key = rng.base_key(0)
frame = camera_frame(settings)
n_pix = settings.image_width * settings.image_height
lane_pixel = jnp.minimum(jnp.arange(LANES, dtype=jnp.int32), n_pix - 1)
keys0 = rng.ray_keys_fast(key, lane_pixel, jnp.zeros(LANES, jnp.int32))

print(f"prims={scene.prims.kind.shape[0]} mats={scene.materials.kind.shape[0]} "
      f"texkinds={scene.textures.kinds_present} "
      f"volumes={scene.volumes.counts if scene.volumes else None} "
      f"lanes={LANES}", flush=True)


def timeit(label, f, n=2):
    out = f()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1e3/ITERS:.3f} ms/iter", flush=True)


z = jnp.zeros((LANES,), jnp.float32)
o3 = jnp.stack([z, z, z + 10.0], axis=-1)
d3 = jnp.stack([z, z, z - 1.0], axis=-1)
uni0 = jax.random.uniform(jax.random.key(1), (LANES, n_u + 5))


def loop(body):
    def f():
        def it(i, st):
            return body(i, st)
        init = (o3, d3, z, jnp.zeros((LANES, 3)), jnp.ones((LANES, 3)),
                jnp.ones((LANES,), bool))
        return jax.lax.fori_loop(0, ITERS, it, init)
    return jax.jit(f)


def regen(i, st):
    o, d, time_, rad, thr, alive = st
    dkeys = rng.mix_depth(keys0, jnp.full((LANES,), i, jnp.int32))
    uniforms = rng.uniform_block(dkeys, n_u + 5)
    nc = generate_ray_components(settings, frame, lane_pixel,
                                 uniforms[:, n_u:])
    o = jnp.stack(nc[0:3], axis=-1)
    d = jnp.stack(nc[3:6], axis=-1)
    return o, d, nc[6], rad, thr, alive, uniforms


def body_rng_cam(i, st):
    o, d, time_, rad, thr, alive, uniforms = regen(i, st)
    rad = rad + uniforms[:, :3]
    return o, d, time_, rad, thr, alive


def body_intersect(clustered):
    def b(i, st):
        o, d, time_, rad, thr, alive, _ = regen(i, st)
        # diff=True routes through the flat loop for volume scenes
        # (clustered gate in _surface_hit), so it doubles as the
        # flat-loop timing here
        t, idx, nrm, fr, uv, m = _surface_hit(
            scene, settings, o, d, time_, True, diff=not clustered)
        rad = rad + nrm * jnp.where(jnp.isfinite(t), t, 0.0)[:, None]
        return o, d, time_, rad, thr, alive
    return b


def body_volumes(pallas):
    def b(i, st):
        o, d, time_, rad, thr, alive, uniforms = regen(i, st)
        tmin = jnp.full((LANES,), settings.t_min, jnp.float32)
        u_sc = uniforms[:, 0:scene.volumes.n_volumes]
        if pallas:
            t_vol, _ = volume_candidates_pallas(
                scene.volumes, o, d, time_, tmin, u_sc,
                float(settings.t_min))
        else:
            t_vol, _ = volume_candidates(scene.volumes, o, d, time_, tmin,
                                         u_sc)
        rad = rad + jnp.where(jnp.isfinite(t_vol), t_vol, 0.0) @ jnp.ones(
            (scene.volumes.n_volumes, 3), jnp.float32)
        return o, d, time_, rad, thr, alive
    return b


def body_textures(i, st, marble_pallas=False, sparse=False):
    o, d, time_, rad, thr, alive, uniforms = regen(i, st)
    nt = scene.textures.kind.shape[0]
    if sparse:
        # realistic pattern: marble appears only in a small lane range
        # (the marble sphere covers a small screen fraction) — measures
        # the per-block cond skip.  Fallback ids must come from rows that
        # are NOT marble, or the A/B would silently measure nothing.
        assert scene.textures.marble_rows, "sparse mode needs a marble row"
        mrow = scene.textures.marble_rows[0]
        non_marble = [i for i in range(nt)
                      if i not in scene.textures.marble_rows][:2]
        assert len(non_marble) == 2
        tex_id = jnp.where(
            lane_pixel < 4096, mrow,
            jnp.where(lane_pixel % 2 == 0, non_marble[0],
                      non_marble[1])).astype(jnp.int32)
    else:
        tex_id = (lane_pixel % nt).astype(jnp.int32)
    alb = eval_texture(scene.textures, tex_id, o, uniforms[:, 0:2],
                       onehot=False, marble_pallas=marble_pallas)
    rad = rad + alb
    return o, d, time_, rad, thr, alive


def body_full(i, st):
    o, d, time_, rad, thr, alive, uniforms = regen(i, st)
    o, d, rad, thr, alive, died = bounce(
        scene, settings, o, d, time_, uniforms, rad, thr, alive,
        use_pallas=True)
    alive = alive | died
    return o, d, time_, rad, thr, alive


timeit("rng+camera          ", loop(body_rng_cam))
timeit("intersect (flat)    ", loop(body_intersect(False)))
timeit("intersect (clustered)", loop(body_intersect(True)))
timeit("volumes XLA         ", loop(body_volumes(False)))
timeit("volumes pallas      ", loop(body_volumes(True)))
import functools

timeit("textures (all lanes)", loop(body_textures))
timeit("textures mkernel striped",
       loop(functools.partial(body_textures, marble_pallas=True)))
timeit("textures xla sparse ",
       loop(functools.partial(body_textures, sparse=True)))
timeit("textures mkernel sparse",
       loop(functools.partial(body_textures, marble_pallas=True,
                              sparse=True)))
timeit("full bounce         ", loop(body_full))
