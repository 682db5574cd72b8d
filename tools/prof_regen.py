"""Per-iteration cost of the out-of-kernel regen stage (RNG uniforms +
camera ray components) at the bench lane count, comparing the [R, C]
uniform block layout against a column-major [C, R] prototype.  [R, 14]
has minor dim 14 in (8, 128) tiles — the project's own layout rule says
that is ~9x padded traffic; this quantifies the win before refactoring
every consumer.  Run on the real chip."""
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

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.render.camera import camera_frame, generate_ray_components
from raytrace_tpu.render.integrator import n_bounce_uniforms

scene, settings = _cornell_scene_and_settings(width=600, spp=200, depth=50)
R = 1 << 18
ITERS = 100
n_u = n_bounce_uniforms(scene)
N_C = n_u + 6
frame = camera_frame(settings)
n_pix = settings.image_width * settings.image_height
lane_pixel = jnp.arange(R, dtype=jnp.int32) % n_pix
keys0 = rng.ray_keys_fast(rng.base_key(0), lane_pixel,
                          jnp.zeros(R, jnp.int32))
kd = jax.random.key_data(keys0).astype(jnp.uint32)
K0, K1 = kd[:, 0], kd[:, 1]


def uniform_cols(k0, k1, n):
    """Column-major prototype: returns [n, R] (minor dim = lanes)."""
    cols = jnp.arange(n, dtype=jnp.uint32)[:, None]
    h = k0[None, :] + cols * jnp.uint32(0x9E3779B9)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x21F0AAAD)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x735A2D97)
    h = h ^ (h >> 15)
    h = h ^ k1[None, :]
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0xD35A2D97)
    h = h ^ (h >> 15)
    return (h >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))


def timeit(label, step):
    def loop(seed):
        def it(i, acc):
            return acc + step(i + seed)
        return jax.lax.fori_loop(0, ITERS, it, jnp.zeros((R,), jnp.float32))
    jl = jax.jit(loop)
    jax.block_until_ready(jl(jnp.uint32(0)))
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        jax.block_until_ready(jl(jnp.uint32(1000 * (r + 1))))
        best = min(best, time.time() - t0)
    print(f"{label}: {best/ITERS*1e6:.0f} us/iter", flush=True)


def mixd(i):
    d = jnp.broadcast_to(i, K0.shape).astype(jnp.uint32)
    return K0 + d * jnp.uint32(0xC2B2AE3D), K1 ^ (d * jnp.uint32(0x27D4EB2F))


def step_block(i):
    k0, k1 = mixd(i)
    keys = jax.random.wrap_key_data(jnp.stack([k0, k1], axis=-1))
    u = rng.uniform_block(keys, N_C)
    c = generate_ray_components(settings, frame, lane_pixel, u[:, n_u:n_u + 5])
    return sum(c[:6]) + u[:, 0] + u[:, n_u + 5]


def step_cols(i):
    k0, k1 = mixd(i)
    u = uniform_cols(k0, k1, N_C)
    c = generate_ray_components(settings, frame, lane_pixel,
                                u[n_u:n_u + 5].T)
    return sum(c[:6]) + u[0] + u[n_u + 5]


def step_cols_soa(i):
    # fully SoA: camera consumes 1-D rows, no transpose anywhere
    k0, k1 = mixd(i)
    u = uniform_cols(k0, k1, N_C)
    w = settings.image_width
    ii = (lane_pixel % w).astype(jnp.float32) + u[n_u + 2]
    jj = (lane_pixel // w).astype(jnp.float32) + u[n_u + 3]
    r = jnp.sqrt(u[n_u])
    th = (2.0 * jnp.pi) * u[n_u + 1]
    da = r * jnp.cos(th) * frame["defocus_radius"]
    db = r * jnp.sin(th) * frame["defocus_radius"]
    uu, vv = frame["u"], frame["v"]
    tl, pu, pv = frame["top_left"], frame["pixel_u"], frame["pixel_v"]
    acc = u[0] + u[n_u + 5]
    for k in range(3):
        ok = settings.center[k] + da * uu[k] + db * vv[k]
        tk = tl[k] + ii * pu[k] + jj * pv[k]
        acc = acc + ok + (tk - ok)
    return acc


def step_rng_only_block(i):
    k0, k1 = mixd(i)
    keys = jax.random.wrap_key_data(jnp.stack([k0, k1], axis=-1))
    u = rng.uniform_block(keys, N_C)
    return u.sum(axis=1)


def step_rng_only_cols(i):
    k0, k1 = mixd(i)
    return uniform_cols(k0, k1, N_C).sum(axis=0)


timeit("rng [R,C] block      ", step_rng_only_block)
timeit("rng [C,R] cols       ", step_rng_only_cols)
timeit("rng+camera [R,C]     ", step_block)
timeit("rng+camera [C,R]+T   ", step_cols)
timeit("rng+camera [C,R] SoA ", step_cols_soa)
