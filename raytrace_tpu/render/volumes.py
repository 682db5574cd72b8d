"""Constant-density medium sampling for the wavefront integrator.

Reference semantics (``constantMedium``, Geometry.hs:298-330): per bounce,
find where the ray enters and exits the medium's closed boundary surface —
entry is the first boundary crossing if it is front-facing, else the ray
starts inside and entry is t_min; exit is the next crossing — then scatter
at ``entry - log(U)/density`` if that lies before the exit.

TPU re-design: instead of nesting stochastic geometry inside traversal,
every volume produces an *independent scatter candidate t* per ray, and
the integrator takes the global argmin against the surface hit.  This is
distribution-equivalent to the reference's shrinking-t_max group fold
(see SURVEY.md: the fold's ``min tmax`` clipping only rejects candidates
that would lose the argmin anyway).

Boundary crossings reuse :func:`..ops.intersect.chunk_roots`: both sphere
roots and plane hits are crossings.  Two chunked min-scans give first and
second crossing without materializing an [R, all-crossings] buffer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vecmath import DTYPE
from ..ops.intersect import INF, chunk_roots, _chunk_size
from ..scene.types import PRIM_SPHERE, Primitives, Volumes


def _crossing_scan(prims: Primitives, start: int, count: int, o, d, time,
                   greater_than, want_front: bool):
    """Min crossing strictly greater than ``greater_than[R]`` within the
    static prim slice [start, start+count).  Returns (t[R], front[R])."""
    r = o.shape[0]
    c = _chunk_size(count, r)
    steps = -(-count // c)

    def step(carry, i):
        best_t, best_front = carry
        cs = start + jnp.minimum(i * c, count - c)
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, cs, c, 0)
        kind = sl(prims.kind)
        r1, r2 = chunk_roots(kind, sl(prims.p0), sl(prims.e1), sl(prims.e2),
                             sl(prims.mv0), sl(prims.mv1), prims.has_motion,
                             o, d, time)
        gt = greater_than[:, None]
        # Crossing front-ness: spheres enter at r1 / exit at r2
        # (t <= h criterion); planes are front iff approached from the
        # normal side — but for crossing selection we need the front flag
        # of the *first* crossing only, so compute per-candidate flags.
        t1 = jnp.where(r1 > gt, r1, INF)
        t2 = jnp.where(r2 > gt, r2, INF)
        is_sphere = (kind == PRIM_SPHERE)[None, :]
        if want_front:
            # plane front side: denom < 0. Recover sign cheaply: the plane
            # candidate lives in r1 only; recompute denom sign via normal.
            cp = jnp.cross(sl(prims.e1), sl(prims.e2))
            denom = jax.lax.dot_general(
                d, cp, (((1,), (1,)), ((), ())), preferred_element_type=DTYPE)
            f1 = jnp.where(is_sphere, True, denom < 0.0)
            f2 = jnp.zeros_like(f1)  # sphere far root is always back-facing
        else:
            f1 = jnp.zeros(t1.shape, bool)
            f2 = f1
        # reduce over this chunk: min of t1/t2 jointly. No argmin +
        # take_along_axis — a TPU gather with per-call-varying indices
        # costs ~1 ms per 100k lanes; select the front flag of the FIRST
        # minimal entry with a cumsum first-match mask instead.
        both_t = jnp.concatenate([t1, t2], axis=1)
        both_f = jnp.concatenate([f1, f2], axis=1)
        ct = jnp.min(both_t, axis=1)
        is_min = both_t == ct[:, None]
        first = is_min & (jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1)
        cf = jnp.any(both_f & first, axis=1)
        better = ct < best_t
        best_front = jnp.where(better, cf, best_front)
        best_t = jnp.where(better, ct, best_t)
        return (best_t, best_front), None

    init = (jnp.full((r,), INF, DTYPE), jnp.zeros((r,), bool))
    (t, front), _ = jax.lax.scan(step, init, jnp.arange(steps))
    return t, front


def volume_candidates(volumes: Volumes, o, d, time, t_min, u_scatter):
    """Scatter candidate per volume: returns (t_cand[R, V], valid[R, V]).

    ``u_scatter[R, V]`` are uniform draws for the exponential free-flight
    distance (Geometry.hs:316-319: ``-log U / density``).
    """
    cands = []
    valids = []
    for v in range(volumes.n_volumes):
        start = volumes.starts[v]
        count = volumes.counts[v]
        t1, front1 = _crossing_scan(volumes.prims, start, count, o, d, time,
                                    t_min, want_front=True)
        # entry/exit (Geometry.hs:306-315)
        entry = jnp.where(front1, t1, t_min)
        need_second = front1
        t2, _ = _crossing_scan(volumes.prims, start, count, o, d, time,
                               jnp.where(need_second, t1, -INF),
                               want_front=False)
        exit_t = jnp.where(front1, t2, t1)
        has_segment = jnp.isfinite(t1) & jnp.isfinite(exit_t)
        dist_in = exit_t - entry
        neg_inv_density = -1.0 / volumes.density[v]
        hit_dist = neg_inv_density * jnp.log(jnp.maximum(u_scatter[:, v], 1e-38))
        scatter = has_segment & (hit_dist < dist_in)
        cands.append(jnp.where(scatter, entry + hit_dist, INF))
        valids.append(scatter)
    return jnp.stack(cands, axis=1), jnp.stack(valids, axis=1)
