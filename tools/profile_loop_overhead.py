"""Micro-costs of trace_wavefront's per-iteration bookkeeping on TPU.

The demo2 production loop costs ~29 ms/iter while the isolated bounce
costs ~10.8; this times each non-bounce stage of the loop body in the
same fori_loop harness as tools/profile_demo2.py.
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
from raytrace_tpu.core import rng

LANES = 704 * 128
N_PIX = 160000
ITERS = 50

key = rng.base_key(0)
keys0 = rng.ray_keys_fast(key, jnp.arange(LANES, dtype=jnp.int32) % N_PIX,
                          jnp.zeros(LANES, jnp.int32))


def timeit(label, f, n=2):
    out = f(0)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(n):
        out = f(i + 1)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1e3/ITERS:.3f} ms/iter", flush=True)


def loop(body, extra_init=()):
    def f(seed):
        z = jnp.full((LANES,), jnp.float32(seed) * 1e-6)
        init = (z, z + 1.0, jnp.zeros((N_PIX,), jnp.float32),
                (jnp.arange(LANES, dtype=jnp.int32) + seed) % N_PIX,
                keys0) + tuple(extra_init)
        return jax.lax.fori_loop(0, ITERS, body, init)
    return jax.jit(f)


def body_base(i, st):
    x, y, acc, pixel, keys = st
    return (x + 1e-7, y, acc, pixel, keys)


def body_scatter3(i, st):
    x, y, acc, pixel, keys = st
    died_f = jnp.where(x > 0, 1.0, 0.0)
    acc = acc.at[pixel].add(x * died_f, mode="drop")
    acc = acc.at[pixel].add(y * died_f, mode="drop")
    acc = acc.at[pixel].add((x + y) * died_f, mode="drop")
    return (x + 1e-7, y, acc, pixel, keys)


def body_regen(i, st):
    x, y, acc, pixel, keys = st
    dead = x > 0.5
    rank = jnp.cumsum(dead.astype(jnp.int32)) - dead.astype(jnp.int32)
    wi = i + rank
    can = dead & (wi < N_PIX * 64)
    new_pixel = (wi % N_PIX).astype(jnp.int32)
    new_sample = (wi // N_PIX).astype(jnp.int32)
    nk = rng.ray_keys_fast(key, new_pixel, new_sample)
    keys = jax.random.wrap_key_data(jnp.where(
        can[:, None], jax.random.key_data(nk), jax.random.key_data(keys)))
    pixel = jnp.where(can, new_pixel, pixel)
    return (x + 1e-7, y, acc, pixel, keys)


def body_uniforms(n_u):
    def b(i, st):
        x, y, acc, pixel, keys = st
        dkeys = rng.mix_depth(keys, jnp.full((LANES,), i, jnp.int32))
        uniforms = rng.uniform_block(dkeys, n_u)
        return (x + uniforms[:, 0] * 1e-7, y, acc, pixel, keys)
    return b


timeit("baseline (carry only)   ", loop(body_base))
timeit("3x scatter-add 90k->160k", loop(body_scatter3))
timeit("regen (cumsum+keys+where)", loop(body_regen))
timeit("uniform_block n=8       ", loop(body_uniforms(8)))
timeit("uniform_block n=20      ", loop(body_uniforms(20)))
