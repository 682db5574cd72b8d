"""Per-kernel-block cluster culling prepass (XLA side).

The clustered Pallas intersect loop skips a 64-prim cluster only when NO
lane of a kernel block hits its AABB (block-consensus ``lax.cond``).
That consensus fires for coherent (tile-ordered primary) blocks but dies
on bounced wavefronts: 4096 incoherent rays collectively reach every
cluster, so mesh-scale bounces cost 3.4-7x coherent ones
(tools/prof_bigmesh_engines.py) — the reference's unbounded BVH
(Geometry.hs:352-377) has no such cliff.

This module is the round-3 answer: *hoist the consensus out of the
kernel*.  For each kernel block we compute a conservative bound of its
rays — an origin AABB ``O`` plus a direction cone ``(axis a, cos
half-angle)`` — and test it against every cluster AABB ``C`` in one
vectorized [blocks, clusters] XLA pass:

* Minkowski difference ``D = C - O`` (``lo_D = C.lo - O.hi``,
  ``hi_D = C.hi - O.lo``): the set of ``p = hit - origin`` vectors.
* A ray (unit dir d in the cone) can hit iff some ``p in D`` has
  ``p . d = |p|`` i.e. ``p`` inside the cone: conservative test
  ``max_D(p . a) >= min_D |p| * cos`` (interval arithmetic for the dot,
  distance-to-box for the norm), or ``0 in D`` (origin inside cluster).
* ``t_entry = max(t_min, min_D |p|)`` lower-bounds any hit t (unit
  direction), which both orders the visit list near-to-far and powers
  the kernel's early exit: once every lane's best t is below the next
  cluster's ``t_entry``, the remaining list cannot improve any lane.

The kernel then walks exactly the clusters in its list — no slab tests,
no per-cluster conds — and stops early.  Lists are per kind-segment
(compile_scene's kind-major cluster layout), each sorted by ``t_entry``,
occupying its own column range of the [B, K] tables so the kernel's
per-segment math specialization survives.

Correctness does not depend on lane coherence (the bounds are computed
from whatever rays the block holds); only the cull *rate* does.  The
ray-binned driver (render/integrator.py trace_wavefront_sorted) orders
lanes by (direction octant, origin cell) precisely so these cones are
narrow.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Padding columns appended to the [B, K] tables so the kernel's
# look-ahead reads (ids[j+1], t_entry[j] at j == n_visit) stay in
# bounds; t_entry pads are +inf, which also terminates the early-exit
# while condition without a separate bound check.
PAD_COLS = 8


def block_ray_bounds(ox, oy, oz, dx, dy, dz, block_lanes: int):
    """Conservative per-block ray bounds.

    Inputs are flat [R] lane components (R a multiple of
    ``block_lanes``; directions unit).  Returns ``(olo, ohi, axis,
    cos_half, dlo, dhi)`` with shapes [B, 3] x2, [B, 3], [B], [B, 3] x2
    where B = R // block_lanes.
    """
    b = ox.shape[0] // block_lanes
    r3 = lambda x: x.reshape(b, block_lanes)
    o = jnp.stack([r3(ox), r3(oy), r3(oz)], axis=-1)      # [B, L, 3]
    d = jnp.stack([r3(dx), r3(dy), r3(dz)], axis=-1)
    olo = jnp.min(o, axis=1)
    ohi = jnp.max(o, axis=1)
    mean = jnp.sum(d, axis=1)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(mean * mean, -1), 1e-12))
    axis = mean / norm[:, None]
    cos_half = jnp.min(jnp.sum(d * axis[:, None, :], -1), axis=1)
    # cos <= 0 means the block's rays span a hemisphere or more: the
    # cone test then (correctly) passes almost everything
    return (olo, ohi, axis, jnp.clip(cos_half, -1.0, 1.0),
            jnp.min(d, axis=1), jnp.max(d, axis=1))


def _interval_div_bounds(nlo, nhi, dlo, dhi):
    """Conservative [lo, hi] of {n / d : n in [nlo, nhi], d in [dlo,
    dhi]} when 0 is outside [dlo, dhi]; (-inf, +inf) when d straddles 0
    (the axis then constrains nothing).  Elementwise over any shape."""
    inf = jnp.float32(jnp.inf)
    pos = dlo > 0.0
    neg = dhi < 0.0
    same = pos | neg
    # quotient extremes are at interval corners
    q = [nlo / dlo, nlo / dhi, nhi / dlo, nhi / dhi]
    qlo = jnp.minimum(jnp.minimum(q[0], q[1]), jnp.minimum(q[2], q[3]))
    qhi = jnp.maximum(jnp.maximum(q[0], q[1]), jnp.maximum(q[2], q[3]))
    return (jnp.where(same, qlo, -inf), jnp.where(same, qhi, inf))


def _cull_matrix(ctbl, olo, ohi, axis, cos_half, t_min: float,
                 dlo_d=None, dhi_d=None):
    """[B, K] (visit, t_entry) for every (block, cluster) pair.

    Two independent conservative tests are intersected:

    * **Cone test** — ``max_D(p . a) >= min_D |p| * cos`` over the
      Minkowski box ``D = C - O`` (decoupled bound: rejects clusters
      *behind* the block's direction cone).
    * **Interval slab test** — the per-ray slab test evaluated in
      interval arithmetic over origin box x direction box: lateral
      rejection that is tight when a direction component has one sign
      across the block (octant-binned rows), and vacuous (±inf)
      when it straddles zero.

    ``t_entry`` is the max of the two entry lower bounds.

    All math is per-axis SoA over [B, K] arrays — a stacked [B, K, 3]
    formulation tiles its minor dim 3 into (8, 128) vregs at 43x waste
    and measured ~27 ms at [512, 796] (CLAUDE.md layout rule).
    """
    inf = jnp.float32(jnp.inf)
    min_norm_sq = 0.0
    max_dot = 0.0
    tn_lo = jnp.float32(t_min)
    tf_hi = inf
    ax_ok = None
    for ax in range(3):
        clo = ctbl[None, :, ax]                           # [1, K]
        chi = ctbl[None, :, 3 + ax]
        dlo = clo - ohi[:, ax:ax + 1]                     # [B, K]
        dhi = chi - olo[:, ax:ax + 1]
        gap = jnp.maximum(jnp.maximum(dlo, -dhi), 0.0)
        min_norm_sq = min_norm_sq + gap * gap
        a = axis[:, ax:ax + 1]
        max_dot = max_dot + jnp.maximum(dlo * a, dhi * a)
        if dlo_d is not None:
            dl = dlo_d[:, ax:ax + 1]
            dh = dhi_d[:, ax:ax + 1]
            qlo, qhi = _interval_div_bounds(dlo, dhi, dl, dh)
            tn_lo = jnp.maximum(tn_lo, qlo)
            tf_hi = jnp.minimum(tf_hi, qhi)
    min_norm = jnp.sqrt(min_norm_sq)
    inside = min_norm <= 0.0
    visit = inside | (max_dot >= min_norm * cos_half[:, None])
    t_entry = jnp.maximum(min_norm, jnp.float32(t_min))
    if dlo_d is not None:
        visit = visit & (tn_lo <= tf_hi)
        t_entry = jnp.maximum(t_entry, tn_lo)

    # pad clusters (lo=+inf, hi=-inf) produce dlo=+inf rows: max_dot
    # = inf*a + ... may be NaN; kill them explicitly
    pad = ctbl[None, :, 0] > ctbl[None, :, 3]
    visit = visit & ~pad
    t_entry = jnp.where(visit, t_entry, jnp.inf)
    return visit, t_entry


@functools.partial(jax.jit, static_argnames=("block_lanes", "segments",
                                             "t_min", "n_clusters"))
def visit_lists(ctbl, ox, oy, oz, dx, dy, dz, *, block_lanes: int,
                segments, t_min: float, n_clusters: int):
    """Build per-block, per-segment t-ordered cluster visit lists.

    ``segments`` is compile_scene's kind segmentation
    ``((kind, k0, k1), ...)`` over cluster indices (``None`` → one
    generic segment spanning all clusters).  Returns

    * ``ids  [B, K + PAD_COLS] int32`` — segment s's list occupies
      columns ``[k0_s, k0_s + n_visit[b, s])`` (its own cluster-range
      width), sorted ascending by t_entry; remaining columns are k0_s
      (safe to read, never visited).
    * ``nvis [B, n_seg] int32`` — per-segment visited counts.
    * ``tent [B, K + PAD_COLS] f32`` — t_entry aligned with ``ids``;
      +inf beyond each list (terminates the kernel's early-exit
      condition with no separate bound check).
    """
    if segments is None:
        segments = ((None, 0, n_clusters),)
    olo, ohi, axis, cos_half, dlo_d, dhi_d = block_ray_bounds(
        ox, oy, oz, dx, dy, dz, block_lanes)
    visit, t_entry = _cull_matrix(ctbl, olo, ohi, axis, cos_half, t_min,
                                  dlo_d, dhi_d)
    b = visit.shape[0]

    if jax.default_backend() in ("tpu", "axon") and b % 8 == 0:
        # XLA's TPU sort costs ~22 ms for [512, 804] (measured,
        # tools/prof_visit_stats.py) — build the lists with the O(K^2)
        # rank kernel instead (comparison tile + one-hot MXU permute)
        from .pallas.rank_kernel import rank_visit_lists
        return rank_visit_lists(
            visit, t_entry,
            segments=tuple((k0, k1) for _, k0, k1 in segments),
            n_clusters=n_clusters)

    ids_parts = []
    tent_parts = []
    nvis_parts = []
    for _, k0, k1 in segments:
        v = visit[:, k0:k1]
        te = jnp.where(v, t_entry[:, k0:k1], jnp.inf)
        order = jnp.argsort(te, axis=1)                   # visited first
        ids_parts.append((k0 + order).astype(jnp.int32))
        tent_parts.append(jnp.take_along_axis(te, order, axis=1))
        nvis_parts.append(jnp.sum(v, axis=1).astype(jnp.int32))
    pad_i = jnp.zeros((b, PAD_COLS), jnp.int32)
    pad_f = jnp.full((b, PAD_COLS), jnp.inf, jnp.float32)
    ids = jnp.concatenate(ids_parts + [pad_i], axis=1)
    tent = jnp.concatenate(tent_parts + [pad_f], axis=1)
    nvis = jnp.stack(nvis_parts, axis=1)
    return ids, nvis, tent
