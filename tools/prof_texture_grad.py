"""Production-speed check for image-texture gradients (round-1 review
item 7): time value_and_grad of the regenerative diff wavefront on an
image-textured scene vs the same scene with a constant texture, at
2^17 lanes.  The atlas texel gather's backward is a scatter-add into
the atlas per scan iteration — this quantifies what that actually
costs end-to-end.  Run on the real chip."""
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import raytrace_tpu as rt
from raytrace_tpu.core import rng
from raytrace_tpu.diff.gradients import partition, render_loss_wavefront


def build(textured: bool):
    if textured:
        img = np.linspace(0, 1, 256 * 128 * 3).reshape(128, 256, 3)
        tex = rt.image_texture(img)
    else:
        tex = rt.constant_texture([0.5, 0.4, 0.3])
    world = rt.group([
        rt.with_material(rt.lambertian(tex), rt.sphere([0, 0, -3], 1.0)),
        rt.with_material(rt.lambertian(rt.constant_texture(0.6)),
                         rt.sphere([0, -101, -3], 100.0)),
        rt.with_material(rt.light_source(rt.constant_texture(4.0)),
                         rt.parallelogram([-2, 4, -5], [4, 0, 0],
                                          [0, 0, 4])),
    ])
    return rt.compile_scene(world)


settings = rt.CameraSettings(image_width=512, aspect_ratio=1.0,
                             samples_per_pixel=16, max_depth=8, rr_depth=2,
                             background=rt.const_background(0.1))
R = 1 << 17
SPP = 16
N_ITERS = 80
REMAT = bool(int(__import__("os").environ.get("RT_PROF_REMAT", "0")))
key = rng.base_key(0)
pix = jnp.arange(R, dtype=jnp.int32) % (512 * 512)
target = jnp.zeros((R, 3), jnp.float32)

for textured in (False, True):
    scene = build(textured)
    params, statics = partition(scene)
    vg = jax.jit(jax.value_and_grad(render_loss_wavefront, has_aux=True),
                 static_argnames=("spp", "n_iters", "remat"))
    (l, f), g = vg(params, statics, settings, key, pix, target, spp=SPP,
                   n_iters=N_ITERS, remat=REMAT)
    jax.block_until_ready(g)
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        (l, f), g = vg(params, statics, settings, rng.base_key(r + 1), pix,
                       target, spp=SPP, n_iters=N_ITERS, remat=REMAT)
        jax.block_until_ready(g)
        assert float(l) == float(l)     # value fetch (CLAUDE.md)
        best = min(best, time.time() - t0)
    g_atlas = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x, g.textures.images))[0]
    nz = float(jnp.sum(jnp.abs(g_atlas))) if textured else 0.0
    print(f"textured={int(textured)}: {best:.3f}s frac={float(f):.4f} "
          f"rays/s={R*SPP/best/1e6:.1f}M atlas_grad_l1={nz:.3e}",
          flush=True)
