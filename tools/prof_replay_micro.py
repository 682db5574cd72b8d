"""Microbench the bounce backward in isolation at 2^18 lanes (Cornell):
generic XLA replay vs SoA replay vs pieces of the SoA replay."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.diff.gradients import combine, partition
from raytrace_tpu.diff.lane_replay import replay_bwd
from raytrace_tpu.ops.diff_intersect import winner_surface_hit
from raytrace_tpu.render.integrator import bounce, n_bounce_uniforms

scene, s = _cornell_scene_and_settings(width=600, spp=200, depth=50)
R = 1 << 18
n = scene.prims.kind.shape[0]
print(f"n_prims={n}", file=sys.stderr)
rng = np.random.RandomState(0)
o = jnp.asarray(rng.uniform(0, 555, (R, 3)), jnp.float32)
dn = rng.normal(size=(R, 3))
d = jnp.asarray(dn / np.linalg.norm(dn, axis=1, keepdims=True), jnp.float32)
tm = jnp.asarray(rng.uniform(0, 1, R), jnp.float32)
n_u = n_bounce_uniforms(scene)
uni = jnp.asarray(rng.uniform(0, 1, (R, n_u + 1)), jnp.float32)
rad = jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32)
thr = jnp.asarray(rng.uniform(0.1, 1, (R, 3)), jnp.float32)
alive = jnp.asarray(rng.uniform(0, 1, R) > 0.2)
idx = jnp.asarray(rng.randint(-1, n, R), jnp.int32)
cts = tuple(jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
            for _ in range(4))
params, statics = partition(scene)
t_min = float(s.t_min)
has_motion = scene.prims.has_motion


def g_old(params, o, d, tm, thr):
    sc = combine(params, statics)
    p = sc.prims
    hit = winner_surface_hit(
        (p.p0, p.e1, p.e2, p.uvs, p.mv0, p.mv1), (p.kind, p.mat),
        o, d, tm, idx, has_motion, t_min, has_box=p.has_box)
    o2, d2, rad2, thr2, _a, _dd = bounce(
        sc, s, o, d, tm, uni, rad, thr, alive, diff=True, hit_override=hit)
    return o2, d2, rad2, thr2


@jax.jit
def bwd_old(o, d, tm, thr, cts):
    _, vjp = jax.vjp(g_old, params, o, d, tm, thr)
    return vjp(cts)


@jax.jit
def bwd_new(o, d, tm, thr, cts):
    return replay_bwd(scene, s, o, d, tm, uni, thr, alive, idx, cts,
                      has_motion=has_motion, t_min=t_min)


@jax.jit
def fwd_old(o, d, tm, thr):
    return g_old(params, o, d, tm, thr)


@jax.jit
def fwd_new_h(o, d, tm, thr):
    # forward part of the SoA replay only (no vjp): call replay_bwd's h
    # via vjp but discard the pullback cheaply is not possible; instead
    # time vjp-construction forward by running value only
    from raytrace_tpu.diff import lane_replay as lr
    from raytrace_tpu.core.vecmath import onehot_rows
    p, m, tx = scene.prims, scene.materials, scene.textures
    pi = jnp.maximum(idx, 0)
    oh_p = onehot_rows(pi, n)
    kind_p = oh_p @ p.kind.astype(jnp.float32)
    mat_f = oh_p @ p.mat.astype(jnp.float32)
    oh_m = jax.nn.one_hot(mat_f.astype(jnp.int32), m.kind.shape[0])
    kind_m = oh_m @ m.kind.astype(jnp.float32)
    tex_f = oh_m @ m.tex.astype(jnp.float32)
    oh_t = jax.nn.one_hot(tex_f.astype(jnp.int32), tx.kind.shape[0])
    texkind = oh_t @ tx.kind.astype(jnp.float32)
    f0l = oh_t @ tx.f0
    f1l = oh_t @ tx.f1
    uvr = oh_p @ p.uvs.reshape(n, 6)
    u_cols = tuple(uni[:, k] for k in range(8))
    det = (oh_p, oh_m, oh_t, kind_p, kind_m, texkind, f0l, f1l,
           uvr[:, 0], uvr[:, 1], uvr[:, 2], uvr[:, 3], uvr[:, 4],
           uvr[:, 5], u_cols, alive, idx >= 0)
    ptab = jnp.concatenate([p.p0, p.e1, p.e2], axis=1)
    return lr._replay(ptab, m.param, tx.c0, tx.c1,
                      o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
                      d[:, 2], tm, thr[:, 0], thr[:, 1], thr[:, 2],
                      det, s, has_motion=has_motion,
                      has_box=p.has_box, t_min=t_min,
                      n_targets=int(s.n_redirect))


def timed(f, label, reps=20):
    out = f()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1e3:.3f} ms", flush=True)
    return dt


# vary inputs per rep is impractical here; same-input timing can be
# optimistic on the tunnel — use relative numbers only
timed(lambda: fwd_old(o, d, tm, thr), "forward generic replay")
timed(lambda: fwd_new_h(o, d, tm, thr), "forward SoA replay")
timed(lambda: bwd_old(o, d, tm, thr, cts), "vjp generic replay")
timed(lambda: bwd_new(o, d, tm, thr, cts), "vjp SoA replay")
