"""Costs of the pieces of wavefront ray-binning at 2^18 lanes: full
argsort, cheap 64-bucket counting-rank (one-hot cumsum + MXU), applying
a permutation as 17 separate [R] gathers vs one packed [C, R] take.
Decides how trace_wavefront_sorted re-bins (the naive argsort+17-gather
version measured SLOWER than not sorting at all on bigmesh).
Run on the real chip."""
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

R = 1 << 18
ITERS = 20


def timeit(label, step):
    def loop(seed):
        def it(i, carry):
            key, acc = carry
            # per-lane LCG: keys vary across lanes AND iterations
            key = key * jnp.uint32(1664525) + jnp.uint32(1013904223) + i
            out = step(key ^ (key >> 13))
            return (key, acc + out)
        lane0 = jnp.arange(R, dtype=jnp.uint32) * jnp.uint32(2654435761)
        return jax.lax.fori_loop(
            0, ITERS, it,
            (lane0 + seed, jnp.zeros((R,), jnp.float32)))
    jl = jax.jit(loop)
    jax.block_until_ready(jl(jnp.uint32(0)))
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        jax.block_until_ready(jl(jnp.uint32(r + 1)))
        best = min(best, time.time() - t0)
    print(f"{label}: {best/ITERS*1e3:.2f} ms/iter", flush=True)


STATE = [jnp.arange(R, dtype=jnp.float32) * (1.0 + i) for i in range(17)]


def argsort_only(key):
    perm = jnp.argsort(key & jnp.uint32(0xFFF))
    return perm.astype(jnp.float32)


def rank64_only(key):
    k = (key & jnp.uint32(63)).astype(jnp.int32)
    oh = jax.nn.one_hot(k, 64, dtype=jnp.float32)          # [R, 64]
    within = jnp.cumsum(oh, axis=0)                        # rank+1 in bucket
    counts = within[-1]
    offs = jnp.concatenate([jnp.zeros(1), jnp.cumsum(counts)[:-1]])
    pos = (jnp.take(offs, k) + jnp.sum(oh * (within - 1.0), axis=1))
    return pos


def gathers17(key):
    perm = (key & jnp.uint32(0x3FFFF)).astype(jnp.int32) % R
    out = jnp.zeros((R,), jnp.float32)
    for s in STATE:
        out = out + s[perm]
    return out


def packed_take(key):
    perm = (key & jnp.uint32(0x3FFFF)).astype(jnp.int32) % R
    packed = jnp.stack(STATE, axis=0)                      # [17, R]
    g = jnp.take(packed, perm, axis=1)
    return g.sum(axis=0)


def gather1(key):
    perm = (key & jnp.uint32(0x3FFFF)).astype(jnp.int32) % R
    return STATE[0][perm]


timeit("argsort 12-bit keys ", argsort_only)
timeit("rank64 onehot-cumsum", rank64_only)
timeit("1 gather [R]        ", gather1)
timeit("17 gathers [R]      ", gathers17)
timeit("packed take [17,R]  ", packed_take)
