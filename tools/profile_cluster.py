"""A/B the flat vs clustered Pallas intersect loop on a mesh scene,
on-device (scan over iterations; rays vary per iteration)."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scenes")
import raytrace_tpu as rt
from raytrace_tpu import degrees
from raytrace_tpu.scene.obj import read_obj
from raytrace_tpu.ops.pallas import intersect_kernel as ik
from _assets import obj_path

R = 1 << 17
ITERS = 20

mesh = read_obj(obj_path("bunny.obj"))
lo, hi = mesh.bounding_box()
center = 0.5 * (lo + hi)
mesh = mesh.transform_vertices(rt.compose(
    rt.rotate_y(degrees(30)), rt.scale(12), rt.translate(-center)))
world = rt.with_material(rt.lambertian(rt.constant_texture([0.3, 0.3, 1.0])),
                         rt.triangle_mesh(mesh))
scene = rt.compile_scene(world, accel="dense")
prims = scene.prims
n_prims = prims.kind.shape[0]
print(f"n_prims={n_prims}", flush=True)

tbl = ik.pack_prims(prims)
ctbl = ik.pack_clusters(prims)
g = R // 128

key = jax.random.key(0)
# scanline camera rays (like the pixel-stationary wavefront): 512x256 grid
W, H = 512, 256
ii = jnp.arange(R) % W
jj = jnp.arange(R) // W % H
o0 = jnp.tile(jnp.asarray([[0.0, 0.5, 2.0]], jnp.float32), (R, 1))
d0 = jnp.stack([
    (ii / W - 0.5) * 1.2,
    (0.5 - jj / H) * 0.6 - 0.2,
    jnp.full((R,), -1.0),
], axis=-1)
d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
# incoherent rays: random origins in the box, random dirs
oi = jax.random.uniform(jax.random.key(1), (R, 3), minval=-2, maxval=2)
di = jax.random.normal(jax.random.key(2), (R, 3))
di = di / jnp.linalg.norm(di, axis=-1, keepdims=True)


def bench(label, o, d, clustered):
    ct = ctbl if clustered else None
    resh = lambda x: x.reshape(g, 128)

    def run_once(i):
        # vary rays per iteration so nothing can be result-cached
        oo = o + 0.001 * i
        if ct is None:
            # flat: lift the threshold by calling with a tiny fake ctbl and
            # monkeypatched min — instead call kernel with ctbl=None path:
            pass
        t, idx, *_ = ik.pallas_nearest_record(
            tbl, ctbl, resh(oo[:, 0]), resh(oo[:, 1]), resh(oo[:, 2]),
            resh(d[:, 0]), resh(d[:, 1]), resh(d[:, 2]),
            resh(jnp.zeros(R, jnp.float32)),
            n_prims=n_prims, t_min=1e-3, has_motion=False)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    f = jax.jit(lambda: sum(run_once(jnp.float32(i)) for i in range(ITERS)))
    out = f(); out.block_until_ready()
    t0 = time.time()
    out = f(); out.block_until_ready()
    dt = (time.time() - t0) / ITERS
    print(f"{label}: {dt*1e3:.2f} ms/iter "
          f"({R/dt/1e6:.1f}M rays/s intersect-only)", flush=True)


import raytrace_tpu.ops.pallas.intersect_kernel as ikm
orig_min = ikm.CLUSTER_MIN_PRIMS

ikm.CLUSTER_MIN_PRIMS = 10**9   # force flat
bench("flat coherent  ", o0, d0, False)
bench("flat incoherent", oi, di, False)
ikm.CLUSTER_MIN_PRIMS = orig_min
ik.pallas_nearest_record._clear_cache()  # static args don't key the patch
bench("clus coherent  ", o0, d0, True)
bench("clus incoherent", oi, di, True)
