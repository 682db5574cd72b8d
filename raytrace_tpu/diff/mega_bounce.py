"""Differentiable full-bounce with Pallas megakernels both ways.

* forward: the full-bounce Pallas megakernel
  (ops/pallas/bounce_kernel.py), extended to emit the winner primitive
  index per lane;
* backward: the bounce is replayed from the saved winner index with its
  transpose machine-derived INSIDE a second Pallas kernel
  (ops/pallas/bounce_bwd_kernel.py; the kernel body calls ``jax.vjp``
  over diff/lane_replay.py:lane_math at trace time) — on CPU / odd lane
  counts the same math runs as an XLA vjp (lane_replay.replay_bwd), and
  scenes too large for the one-hot gathers fall back to a generic XLA
  replay through render/integrator.py:bounce.

Gradients are exactly those of the XLA bounce (render/integrator.py),
which the megakernel matches lane-by-lane (tests/test_bounce_kernel.py);
sampled directions and MIS denominators stay detached exactly as in the
XLA path (SURVEY.md §5 differentiability).

Everything is SoA: the custom-VJP function takes 1-D lane components
([R, 3] arrays tile terribly on TPU, and every argument is stored per
scan iteration as a backward residual), takes only the N_U bounce
uniform columns, and returns the radiance CONTRIBUTION (the caller
adds) so the radiance carry never enters the residual set.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vecmath import DTYPE
from ..render.integrator import bounce, bounce_mega_soa
from .gradients import combine, partition


def mega_bounce_diff_soa(scene, s, comps, uniforms, thr, alive,
                         interpret: bool = False):
    """SoA differentiable bounce on megakernel-eligible scenes.

    ``comps`` = (ox, oy, oz, dx, dy, dz, time), ``thr`` an (r, g, b)
    tuple — all 1-D [R] arrays.  ``uniforms`` is [R, >=N_U] (only the
    first N_U columns enter the VJP).  Returns
    ``(comps', contrib (r, g, b), thr', alive', died)`` where ``contrib``
    is this bounce's radiance contribution (caller adds to its carry).
    Differentiable w.r.t. every float leaf of ``scene``.
    """
    from ..ops.pallas.bounce_kernel import N_U

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

    # Lane args cross the custom-VJP boundary shaped [G, 128]: the scan
    # backward stores every f argument per iteration as a stacked
    # [T, ...] buffer, and a [T, R] buffer's one-row update is a
    # partial-(8, 128)-tile read-modify-write (~8x write amplification —
    # measured 0.65 ms/iter of pure dynamic_update_slice at 2^18 lanes);
    # [T, G, 128] rows are whole tiles.  The reshapes themselves are
    # layout-preserving (free).
    r0 = comps[0].shape[0]
    use2d = r0 % 128 == 0
    pack = (lambda x: x.reshape(r0 // 128, 128)) if use2d else (lambda x: x)
    unpack = (lambda x: x.reshape(r0)) if use2d else (lambda x: x)

    def run_fwd(params, statics_f, s, *lane):
        lane = tuple(unpack(x) for x in lane)
        (ox, oy, oz, dx, dy, dz, time,
         u0, u1, u2, u3, u4, u5, u6, u7, tr, tg, tb, alive_f) = lane
        scene = rebuild(params, statics_f)
        uni = jnp.stack([u0, u1, u2, u3, u4, u5, u6, u7], axis=-1)
        z = jnp.zeros_like(tr)
        comps2, contrib, thr2, alive2, died2, idx = bounce_mega_soa(
            scene, s, (ox, oy, oz, dx, dy, dz, time), uni, (z, z, z),
            (tr, tg, tb), alive_f > 0.5, interpret=interpret,
            with_idx=True)
        outs = comps2[:6] + contrib + thr2 + (
            jnp.where(alive2, 1.0, 0.0).astype(DTYPE),
            jnp.where(died2, 1.0, 0.0).astype(DTYPE))
        return tuple(pack(x) for x in outs), pack(idx)

    @jax.custom_vjp
    def f(*args):
        return run_fwd(*args)[0]

    def f_fwd(*args):
        outs, idx = run_fwd(*args)
        return outs, args + (idx,)

    from .lane_replay import replay_eligible
    use_replay = replay_eligible(scene)

    def f_bwd(res, cts):
        params, statics_f, s = res[:3]
        lane = tuple(unpack(x) for x in res[3:])
        (ox, oy, oz, dx, dy, dz, time,
         u0, u1, u2, u3, u4, u5, u6, u7, tr, tg, tb, alive_f, idx) = lane
        ct = tuple(unpack(x) for x in cts[:12])   # o2 d2 contrib thr2
        alive = alive_f > 0.5
        u_cols = (u0, u1, u2, u3, u4, u5, u6, u7)
        zu = tuple(pack(jnp.zeros_like(u)) for u in u_cols)

        if use_replay:
            from .lane_replay import replay_bwd_soa
            scene_r = rebuild(params, statics_f)
            on_tpu = jax.default_backend() in ("tpu", "axon")
            g_scene, g_lane = replay_bwd_soa(
                scene_r, s, (ox, oy, oz, dx, dy, dz, time), u_cols,
                (tr, tg, tb), alive, idx, ct, has_motion=has_motion,
                t_min=t_min,
                use_pallas=(on_tpu or interpret) and ox.shape[0] % 128 == 0,
                interpret=interpret)
            g_params = jax.tree_util.tree_map(
                lambda x: x if (hasattr(x, "dtype") and jnp.issubdtype(
                    x.dtype, jnp.floating)) else None, g_scene)
            g_s = jax.tree_util.tree_map(jnp.zeros_like, s)
            return ((g_params,
                     jax.tree_util.tree_map(jnp.zeros_like, statics_f),
                     g_s) + tuple(pack(x) for x in g_lane[:7]) + zu
                    + tuple(pack(x) for x in g_lane[7:10])
                    + (pack(jnp.zeros_like(alive_f)),))

        # generic fallback (scenes whose tables exceed the one-hot caps):
        # XLA replay via the integrator bounce, [R, 3] interface
        o = jnp.stack([ox, oy, oz], axis=-1)
        d = jnp.stack([dx, dy, dz], axis=-1)
        thr3 = jnp.stack([tr, tg, tb], axis=-1)
        uni = jnp.stack(u_cols, axis=-1)

        def g(params, s, o, d, time, thr3):
            scene = rebuild(params, statics_f)
            p = scene.prims
            from ..ops.diff_intersect import winner_surface_hit
            hit = winner_surface_hit(
                (p.p0, p.e1, p.e2, p.uvs, p.mv0, p.mv1), (p.kind, p.mat),
                o, d, time, idx, has_motion, t_min, has_box=p.has_box,
                sphere_rots=p.sphere_rots)
            o2, d2, contrib, thr2, _a, _dd = bounce(
                scene, s, o, d, time, uni, jnp.zeros_like(thr3), thr3,
                alive, diff=True, hit_override=hit)
            return o2, d2, contrib, thr2

        _, vjp = jax.vjp(g, params, s, o, d, time, thr3)
        ct3 = tuple(jnp.stack(ct[3 * k:3 * k + 3], axis=-1)
                    for k in range(4))
        g_params, g_s, g_o, g_d, g_time, g_thr = vjp(ct3)
        return ((g_params, jax.tree_util.tree_map(jnp.zeros_like, statics_f),
                 g_s, pack(g_o[:, 0]), pack(g_o[:, 1]), pack(g_o[:, 2]),
                 pack(g_d[:, 0]), pack(g_d[:, 1]), pack(g_d[:, 2]),
                 pack(g_time)) + zu
                + (pack(g_thr[:, 0]), pack(g_thr[:, 1]), pack(g_thr[:, 2]),
                   pack(jnp.zeros_like(alive_f))))

    f.defvjp(f_fwd, f_bwd)

    u_cols = tuple(uniforms[:, k] for k in range(N_U))
    lane_args = comps + u_cols + thr + (
        jnp.where(alive, 1.0, 0.0).astype(DTYPE),)
    outs = f(params, statics_f, s, *(pack(x) for x in lane_args))
    outs = tuple(unpack(x) for x in outs)
    comps2 = outs[0:6] + (comps[6],)
    contrib = outs[6:9]
    thr2 = outs[9:12]
    return comps2, contrib, thr2, outs[12] > 0.5, outs[13] > 0.5


def mega_bounce_diff(scene, s, o, d, time, uniforms, radiance, throughput,
                     alive, interpret: bool = False):
    """[R, 3]-interface wrapper over :func:`mega_bounce_diff_soa` —
    drop-in for ``bounce(..., diff=True)``.  Returns
    ``(o', d', radiance', throughput', alive', died)``."""
    comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time)
    thr = (throughput[:, 0], throughput[:, 1], throughput[:, 2])
    comps2, contrib, thr2, alive2, died2 = mega_bounce_diff_soa(
        scene, s, comps, uniforms, thr, alive, interpret=interpret)
    o2 = jnp.stack(comps2[0:3], axis=-1)
    d2 = jnp.stack(comps2[3:6], axis=-1)
    rad2 = radiance + jnp.stack(contrib, axis=-1)
    thr3 = jnp.stack(thr2, axis=-1)
    return o2, d2, rad2, thr3, alive2, died2
