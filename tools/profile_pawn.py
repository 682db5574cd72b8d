"""On-device cost breakdown of one pawn wavefront iteration.

pawn (reference test/Main.hs:323-344) is the slowest scene per ray
(VERDICT r3 weak #3, never profiled as a unit): ~1200-tri glass shell +
an isotropic constant medium bounded by the SAME mesh.  Stage timings
isolate: intersect engine, the volume crossing scan (which must scan
every mesh triangle per ray), shading, and the full bounce.
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

mod = __import__("pawn_test")
args = argparse.Namespace(width=600, spp=100, depth=10, seed=55)
scene, settings, seed = mod.build(args)

LANES = 1 << 17
ITERS = 20
n_u = n_bounce_uniforms(scene)
key = rng.base_key(0)
frame = camera_frame(settings)
n_pix = settings.image_width * settings.image_height
lane_pixel = jnp.minimum(jnp.arange(LANES, dtype=jnp.int32), n_pix - 1)
keys0 = rng.ray_keys_fast(key, lane_pixel, jnp.zeros(LANES, jnp.int32))

p = scene.prims
print(f"prims={p.kind.shape[0]} mats={scene.materials.kind.shape[0]} "
      f"volumes={scene.volumes.counts if scene.volumes else None} "
      f"vol_rows={scene.volumes.prims.kind.shape if scene.volumes else None} "
      f"lanes={LANES} bvh={scene.bvh is not None} "
      f"segments={p.kind_segments}", flush=True)


def timeit(label, f, n=2):
    out = f()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = f()
        v = float(jax.tree_util.tree_leaves(out)[3][0, 0])  # value fetch
        assert v == v
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1e3/ITERS:.3f} ms/iter", flush=True)


z = jnp.zeros((LANES,), jnp.float32)
o3 = jnp.stack([z, z + 3.0, z + 5.0], axis=-1)
d3 = jnp.stack([z, z, z - 1.0], axis=-1)


def loop(body):
    def f():
        init = (o3, d3, z, jnp.zeros((LANES, 3)), jnp.ones((LANES, 3)),
                jnp.ones((LANES,), bool))
        return jax.lax.fori_loop(0, ITERS, body, init)
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


def body_intersect(diff):
    def b(i, st):
        o, d, time_, rad, thr, alive, _ = regen(i, st)
        t, idx, nrm, fr, uv, m = _surface_hit(
            scene, settings, o, d, time_, True, diff=diff)
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


def body_full(i, st):
    o, d, time_, rad, thr, alive, uniforms = regen(i, st)
    o, d, rad, thr, alive, died = bounce(
        scene, settings, o, d, time_, uniforms, rad, thr, alive,
        use_pallas=True)
    alive = alive | died
    return o, d, time_, rad, thr, alive


timeit("rng+camera           ", loop(body_rng_cam))
timeit("surface intersect    ", loop(body_intersect(False)))
timeit("surface intersect/dif", loop(body_intersect(True)))
timeit("volumes XLA          ", loop(body_volumes(False)))
timeit("volumes pallas       ", loop(body_volumes(True)))
timeit("full bounce          ", loop(body_full))
