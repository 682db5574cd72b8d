"""Capture jax profiler traces of the generic vs SoA bounce backward and
print per-kernel time breakdowns (xprof framework_op_stats)."""
import glob
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


def capture(f, name):
    out = f(o, d, tm, thr, cts)
    jax.block_until_ready(out)
    tdir = f"/tmp/trace_{name}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(5):
            out = f(o, d, tm, thr, cts)
        jax.block_until_ready(out)
    return tdir


def report(tdir, name):
    from xprof.convert import raw_to_tool_data
    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "framework_op_stats", {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()
    import csv
    import io
    rows = list(csv.reader(io.StringIO(data)))
    hdr = rows[0]
    print(f"==== {name} ====", flush=True)
    try:
        i_name = hdr.index("Operation")
    except ValueError:
        print(hdr)
        i_name = 1
    i_time = None
    for cand in ("Total self time (us)", "Total self-time (us)",
                 "Total self time in us"):
        if cand in hdr:
            i_time = hdr.index(cand)
    if i_time is None:
        print(hdr)
        return
    parsed = []
    for r in rows[1:]:
        try:
            parsed.append((float(r[i_time]), r[i_name]))
        except (ValueError, IndexError):
            pass
    parsed.sort(reverse=True)
    total = sum(p[0] for p in parsed)
    print(f"total self time: {total/5:.0f} us/call over 5 calls")
    for t, nm in parsed[:25]:
        print(f"  {t/5:9.1f} us  {nm[:110]}")


for nm, f in (("old", bwd_old), ("new", bwd_new)):
    tdir = capture(f, nm)
    report(tdir, nm)
