"""Pallas TPU kernel that builds t-ordered cluster visit lists.

The ops/cull.py prepass produces per-row ``(visit, t_entry)`` over K
clusters; turning that into a compact, t-sorted id list is a sort — and
XLA's TPU sort costs ~22 ms for [512, 804] (53 ns/element, measured),
swamping the culled intersect it feeds.  This kernel replaces the sort
with brute-force vector math, the classic TPU trade:

* rank[k] = #{j : key_j < key_k, ties broken by index} via a [K, K]
  comparison tile and a sublane reduction — O(K^2) elementwise ops at
  1024 lanes/cycle beat O(K log K) compare-exchanges at XLA-sort
  constants by ~10x;
* the permutation is applied with one-hot MXU matmuls:
  ids[j] = k_vec @ P, tent[j] = key @ P with P[k, j] = (rank_k == j) —
  scatter-free, exact (counts < 2^24 in f32).

Keys are ``t_entry`` where visited, +inf otherwise, so visited clusters
rank first in t order and ``nvis`` = row-sum of visit; unvisited ids
ride after position nvis (never read by the consumer).  Kind segments
sort independently within their own column ranges (the consumer's
per-segment math specialization needs segment-local lists).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cull import PAD_COLS


def _rank_kernel(visit_ref, tent_ref, ids_out, tent_out, nvis_out, *,
                 segments, k_total: int, rg: int):
    inf = jnp.float32(jnp.inf)
    # constant tie-break tile per segment size (hoisted: building the
    # [S, S] iota comparison per row measured as real VPU time)
    tie_lt = {}
    for _, (k0, k1) in enumerate(segments):
        s_ = k1 - k0
        if s_ not in tie_lt:
            ij = jax.lax.broadcasted_iota(jnp.int32, (s_, s_), 0)
            ik = jax.lax.broadcasted_iota(jnp.int32, (s_, s_), 1)
            tie_lt[s_] = ij < ik

    def row_body(r, _):
        id_parts = []
        tn_parts = []
        for si, (k0, k1) in enumerate(segments):
            kseg = k1 - k0
            v = visit_ref[pl.ds(r, 1), pl.ds(k0, kseg)]       # [1, S]
            te = tent_ref[pl.ds(r, 1), pl.ds(k0, kseg)]
            key = jnp.where(v > 0.0, te, inf)                 # [1, S]
            kb = jnp.broadcast_to(key, (kseg, kseg))          # key[k] @ (j, k)
            key_col = jnp.transpose(key)                      # [S, 1]
            kj = jnp.broadcast_to(key_col, (kseg, kseg))      # key[j] @ (j, k)
            less = (kj < kb) | ((kj == kb) & tie_lt[kseg])
            # rank[k] = sum over j — [1, S]
            rank = jnp.sum(less.astype(jnp.float32), axis=0,
                           keepdims=True)
            # P[k, j] = (rank_k == j): one-hot permutation [S, S]
            pj = jax.lax.broadcasted_iota(jnp.int32, (kseg, kseg), 1)
            rank_col = jnp.transpose(rank)                    # [S, 1]
            p = (jnp.broadcast_to(rank_col, (kseg, kseg))
                 == pj.astype(jnp.float32)).astype(jnp.float32)
            kvec = jax.lax.broadcasted_iota(
                jnp.int32, (1, kseg), 1).astype(jnp.float32) \
                + jnp.float32(k0)
            ids = jax.lax.dot_general(
                kvec, p, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)           # [1, S]
            # tent through the same permutation; inf keys would produce
            # inf * 0 NaNs in the matmul — feed a 0-masked copy and
            # re-inf the tail positions by nvis comparison
            key_f = jnp.where(key < inf, key, 0.0)
            tnt = jax.lax.dot_general(
                key_f, p, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            nv = jnp.sum(v, axis=1, keepdims=True)            # [1, 1]
            posi = jax.lax.broadcasted_iota(
                jnp.int32, (1, kseg), 1).astype(jnp.float32)
            tnt = jnp.where(posi < nv, tnt, inf)
            id_parts.append(ids.astype(jnp.int32))
            tn_parts.append(tnt)
            nvis_out[r, si] = nv[0, 0].astype(jnp.int32)
        # assemble and store whole rows (sub-row stores at segment
        # offsets are "unaligned dynamic stores" Mosaic rejects); the
        # +inf pad columns terminate the consumer's early-exit reads
        padn = k_total + PAD_COLS - segments[-1][1]
        id_parts.append(jnp.zeros((1, padn), jnp.int32))
        tn_parts.append(jnp.full((1, padn), inf, jnp.float32))
        ids_out[pl.ds(r, 1), :] = jnp.concatenate(id_parts, axis=1)
        tent_out[pl.ds(r, 1), :] = jnp.concatenate(tn_parts, axis=1)
        return 0

    jax.lax.fori_loop(0, rg, row_body, 0)


@functools.partial(jax.jit, static_argnames=("segments", "n_clusters",
                                             "rg", "interpret"))
def rank_visit_lists(visit, t_entry, *, segments, n_clusters: int,
                     rg: int = 8, interpret: bool = False):
    """[B, K] (visit bool, t_entry f32) -> (ids [B, K+PAD_COLS] i32,
    nvis [B, n_seg] i32, tent [B, K+PAD_COLS] f32), per-segment
    t-ordered — the same contract as ops/cull.visit_lists' tail.

    ``segments`` are cluster-index ranges ``((k0, k1), ...)``."""
    b, k = visit.shape
    assert k == n_clusters
    rg = min(rg, b)
    if b % rg:
        raise ValueError(f"rows={b} not a multiple of rg={rg}")
    n_seg = len(segments)
    kp = k + PAD_COLS
    grid = (b // rg,)
    vspec = pl.BlockSpec((rg, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((rg, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rg, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rg, n_seg), lambda i: (i, 0),
                     memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, kp), jnp.int32),
        jax.ShapeDtypeStruct((b, kp), jnp.float32),
        jax.ShapeDtypeStruct((b, n_seg), jnp.int32),
    ]
    kernel = functools.partial(_rank_kernel, segments=segments,
                               k_total=k, rg=rg)
    ids, tent, nvis = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vspec, vspec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(visit.astype(jnp.float32), t_entry)
    return ids, nvis, tent
