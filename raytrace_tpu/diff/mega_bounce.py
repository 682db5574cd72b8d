"""Differentiable full-bounce with a Pallas megakernel forward.

The differentiable wavefront was bottlenecked by its *forward*: the XLA
bounce is launch-bound (~60 small kernels per wavefront iteration), so
the diff path ran at ~45M rays/s while the production megakernel forward
ran at ~108M (measured, v5e, 131k lanes).  This module lifts the
custom-VJP pattern of ops/diff_intersect.py from the intersection stage
to the WHOLE bounce:

* forward: the full-bounce Pallas megakernel
  (ops/pallas/bounce_kernel.py), extended to emit the winner primitive
  index per lane;
* backward: with the winner index saved as a residual, the VJP
  reconstructs the surface hit differentiably from ONE one-hot gather of
  the primitive buffers (ops/diff_intersect.py:winner_surface_hit — no
  intersection loop at all) and re-runs the material/MIS math in XLA
  under ``jax.vjp``.

Gradients are therefore exactly those of the XLA bounce
(render/integrator.py:bounce), which the megakernel matches lane-by-lane
(tests/test_bounce_kernel.py); sampled directions and MIS denominators
stay detached exactly as in the XLA path (SURVEY.md §5
differentiability).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vecmath import DTYPE
from ..render.integrator import bounce, bounce_mega
from .gradients import combine, partition


def mega_bounce_diff(scene, s, o, d, time, uniforms, radiance, throughput,
                     alive, interpret: bool = False):
    """Drop-in for ``bounce(..., diff=True)`` on megakernel-eligible
    scenes (render/integrator.py:bounce_kernel_eligible); differentiable
    w.r.t. every float leaf of ``scene`` and ``s``.

    Returns ``(o', d', radiance', throughput', alive', died)`` with the
    same semantics as :func:`raytrace_tpu.render.integrator.bounce`.
    """
    params, statics = partition(scene)
    # custom_vjp closures must not capture tracers: non-float leaves ride
    # through as f32 args (exact for the small int id tables) and get
    # zero cotangents; only their dtypes (python data) are closed over.
    st_dtypes = jax.tree_util.tree_map(lambda x: x.dtype, statics)
    statics_f = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), statics)
    t_min = float(s.t_min)
    has_motion = scene.prims.has_motion

    def rebuild(params, statics_f):
        st = jax.tree_util.tree_map(lambda x, dt: x.astype(dt),
                                    statics_f, st_dtypes)
        return combine(params, st)

    # f takes only the N_U bounce uniform columns and NO radiance (it
    # returns the radiance CONTRIBUTION; the caller adds) — the scan's
    # backward stores every f argument per iteration, and slimming the
    # residual row from ~33 to ~23 floats/lane is a direct HBM win.
    def run_fwd(params, statics_f, s, o, d, time, uniforms, throughput,
                alive_f):
        scene = rebuild(params, statics_f)
        zero_rad = jnp.zeros_like(throughput)
        o2, d2, contrib, thr2, alive2, died2, idx = bounce_mega(
            scene, s, o, d, time, uniforms, zero_rad, throughput,
            alive_f > 0.5, interpret=interpret, with_idx=True)
        outs = (o2, d2, contrib, thr2,
                jnp.where(alive2, 1.0, 0.0).astype(DTYPE),
                jnp.where(died2, 1.0, 0.0).astype(DTYPE))
        return outs, idx

    @jax.custom_vjp
    def f(params, statics_f, s, o, d, time, uniforms, throughput,
          alive_f):
        return run_fwd(params, statics_f, s, o, d, time, uniforms,
                       throughput, alive_f)[0]

    def f_fwd(params, statics_f, s, o, d, time, uniforms, throughput,
              alive_f):
        outs, idx = run_fwd(params, statics_f, s, o, d, time, uniforms,
                            throughput, alive_f)
        res = (params, statics_f, s, o, d, time, uniforms,
               throughput, alive_f, idx)
        return outs, res

    from .lane_replay import replay_eligible
    use_replay = replay_eligible(scene)

    def f_bwd(res, cts):
        (params, statics_f, s, o, d, time, uniforms, throughput,
         alive_f, idx) = res
        ct_o, ct_d, ct_rad, ct_thr, _ct_alive, _ct_died = cts
        alive = alive_f > 0.5

        if use_replay:
            # SoA replay of the bounce from the winner index
            # (diff/lane_replay.py): on TPU the replay + its transpose
            # run fused in ONE Pallas kernel (machine-derived VJP inside
            # the kernel); elsewhere the same math runs as an XLA vjp.
            from .lane_replay import replay_bwd, replay_bwd_pallas
            scene_r = rebuild(params, statics_f)
            on_tpu = jax.default_backend() in ("tpu", "axon")
            if (on_tpu or interpret) and o.shape[0] % 128 == 0:
                g_scene, g_o, g_d, g_time, g_rad, g_thr = \
                    replay_bwd_pallas(
                        scene_r, s, o, d, time, uniforms, throughput,
                        alive, idx, (ct_o, ct_d, ct_rad, ct_thr),
                        has_motion=has_motion, t_min=t_min,
                        interpret=interpret)
            else:
                g_scene, g_o, g_d, g_time, g_rad, g_thr = replay_bwd(
                    scene_r, s, o, d, time, uniforms, throughput, alive,
                    idx, (ct_o, ct_d, ct_rad, ct_thr),
                    has_motion=has_motion, t_min=t_min)
            g_params = jax.tree_util.tree_map(
                lambda x: x if (hasattr(x, "dtype") and jnp.issubdtype(
                    x.dtype, jnp.floating)) else None, g_scene)
            g_s = jax.tree_util.tree_map(jnp.zeros_like, s)
            return (g_params,
                    jax.tree_util.tree_map(jnp.zeros_like, statics_f),
                    g_s, g_o, g_d, g_time, jnp.zeros_like(uniforms),
                    g_thr, jnp.zeros_like(alive_f))

        def g(params, s, o, d, time, throughput):
            scene = rebuild(params, statics_f)
            p = scene.prims
            from ..ops.diff_intersect import winner_surface_hit
            hit = winner_surface_hit(
                (p.p0, p.e1, p.e2, p.uvs, p.mv0, p.mv1), (p.kind, p.mat),
                o, d, time, idx, has_motion, t_min, has_box=p.has_box)
            o2, d2, contrib, thr2, _alive2, _died2 = bounce(
                scene, s, o, d, time, uniforms,
                jnp.zeros_like(throughput), throughput,
                alive, diff=True, hit_override=hit)
            return o2, d2, contrib, thr2

        _, vjp = jax.vjp(g, params, s, o, d, time, throughput)
        g_params, g_s, g_o, g_d, g_time, g_thr = vjp(
            (ct_o, ct_d, ct_rad, ct_thr))
        return (g_params, jax.tree_util.tree_map(jnp.zeros_like, statics_f),
                g_s, g_o, g_d, g_time, jnp.zeros_like(uniforms),
                g_thr, jnp.zeros_like(alive_f))

    f.defvjp(f_fwd, f_bwd)

    from ..ops.pallas.bounce_kernel import N_U
    o2, d2, contrib, thr2, alive_f2, died_f2 = f(
        params, statics_f, s, o, d, time, uniforms[:, :N_U], throughput,
        jnp.where(alive, 1.0, 0.0).astype(DTYPE))
    return (o2, d2, radiance + contrib, thr2, alive_f2 > 0.5,
            died_f2 > 0.5)
