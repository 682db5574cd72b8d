"""Textured-bunny fwd+bwd: the round-5 lifted cap lets image-textured
meshes train through the fused path (ap intersect + deferred albedo)."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scenes")
import raytrace_tpu as rt
from raytrace_tpu import degrees
from raytrace_tpu.scene.obj import read_obj
from _assets import obj_path
from raytrace_tpu.core import rng
from raytrace_tpu.diff.gradients import partition, render_loss_wavefront
from raytrace_tpu.utils.engines import engine_report

mesh = read_obj(obj_path("bunny.obj"))
lo, hi = mesh.bounding_box()
center = 0.5 * (lo + hi)
mesh = mesh.transform_vertices(rt.compose(
    rt.rotate_y(degrees(30)), rt.scale(12), rt.translate(-center)))
img = np.random.RandomState(0).uniform(0.1, 0.9, (128, 256, 3)).astype(np.float32)
world = rt.with_material(rt.lambertian(rt.image_texture(img)),
                         rt.triangle_mesh(mesh))
scene = rt.compile_scene(world)
settings = rt.CameraSettings(
    center=jnp.asarray([0.0, 0.5, 2.0]), look_at=jnp.zeros(3),
    image_width=600, samples_per_pixel=16, max_depth=10,
    background=rt.gray_fade).replace(rr_depth=2)
print("engines", engine_report(scene, settings, diff=True), flush=True)
params, statics = partition(scene)
lanes = 1 << 17
n_pix = settings.image_width * settings.image_height
pix = jnp.arange(lanes, dtype=jnp.int32) % n_pix
target = jnp.zeros((lanes, 3), jnp.float32)
vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
             static_argnames=("spp", "n_iters", "remat", "schedule"))
schedule = ((12, 1 << 15), (30, 1 << 13))

def go(seed):
    (l, f), g = vg(params, statics, settings, rng.base_key(seed), pix,
                   target, spp=16, n_iters=30, remat=False,
                   schedule=schedule)
    return l + jnp.sum(g.textures.images) * 1e-30, f, g

l, f, g = go(0)
float(l)
assert float(jnp.sum(jnp.abs(g.textures.images))) > 0.0
best = float("inf"); frac = 1.0
for r in range(3):
    t0 = time.time()
    l, f, g = go(r + 1)
    lv = float(l); assert lv == lv
    best = min(best, time.time() - t0)
    frac = min(frac, float(f))
rays = lanes * 16
print(f"textured bunny fwd+bwd: {rays/best/1e6:.2f}M rays/s "
      f"({best:.3f}s, frac={frac:.4f})", flush=True)
