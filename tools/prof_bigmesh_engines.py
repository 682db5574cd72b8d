"""Compare the two dense Pallas intersect engines at mesh scale (~50k
tris) through the PRODUCTION path (integrator._surface_hit): all-pairs
dynamic-chunk sweep vs two-level clustered consensus loop, at
primary-ray coherence and shuffled (incoherent) rays.  Each engine runs
in its own subprocess (engine choice is gated by the RT_AP_MAX env var,
read at import; and a faulted tunnel client can't recover in-process).
Decides the engine-selection gate for mesh-scale tables."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(%(repo)r, ".jax_cache"))
import jax.numpy as jnp
sys.path.insert(0, %(repo)r); sys.path.insert(0, os.path.join(%(repo)r, "tools"))
from bench_bigmesh import build_scene
from raytrace_tpu.core import rng
from raytrace_tpu.render.camera import camera_frame, generate_ray_components
from raytrace_tpu.render.integrator import _surface_hit

scene, settings, n_tris = build_scene(160, 160)
R = 1 << 18
n_pix = settings.image_width * settings.image_height
frame = camera_frame(settings)
lane_pixel = jnp.arange(R, dtype=jnp.int32) %% n_pix
keys = rng.ray_keys_fast(rng.base_key(0), lane_pixel, jnp.zeros(R, jnp.int32))
u = rng.uniform_block(keys, 5)
ox, oy, oz, dx, dy, dz, tm = generate_ray_components(settings, frame,
                                                     lane_pixel, u)
perm = jax.random.permutation(jax.random.key(7), R)

def hit(args):
    ox, oy, oz, dx, dy, dz, tm = args
    o = jnp.stack([ox, oy, oz], axis=-1)
    d = jnp.stack([dx, dy, dz], axis=-1)
    t, idx, *_ = _surface_hit(scene, settings, o, d, tm, True)
    return t

jf = jax.jit(hit)
for label, args in (("coherent  ", (ox, oy, oz, dx, dy, dz, tm)),
                    ("incoherent", tuple(a[perm] for a in
                                         (ox, oy, oz, dx, dy, dz, tm)))):
    out = jf(args); jax.block_until_ready(out)
    best = float("inf")
    for r in range(3):
        a2 = tuple(x + r * 1e-4 for x in args[:3]) + args[3:]
        t0 = time.time()
        out = jf(a2); jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"%(tag)s {label}: {best*1e3:.2f} ms / 2^18 rays -> "
          f"{R/best/1e6:.2f}M rays/s", flush=True)
"""

for tag, env in (("allpairs ", {}), ("clustered", {"RT_AP_MAX": "0"})):
    code = CHILD % dict(repo=REPO, tag=tag)
    e = dict(os.environ, **env)
    p = subprocess.run([sys.executable, "-c", code], env=e, timeout=1500,
                       capture_output=True, text=True)
    out = "\n".join(l for l in (p.stdout + p.stderr).splitlines()
                    if "WARNING" not in l and l.strip())
    print(out[-1500:], flush=True)
    print(f"---- {tag}: rc={p.returncode} ----", flush=True)
