"""demo1 (reference test/Main.hs:136-186): the RTIOW hero scene — 400+
random small spheres (diffuse / metal / glass) + three big spheres +
mirror, thin-lens defocus.  Scene generation mirrors the reference's
StdGen-driven loop with a numpy RNG (statistical parity)."""
import numpy as np

from _common import scene_main


def build(args):
    import jax.numpy as jnp
    import raytrace_tpu as rt
    from raytrace_tpu import degrees

    ground = rt.lambertian(rt.constant_texture([0.5, 0.5, 0.5]))
    glass = rt.dielectric(1.5)
    diffuse = rt.lambertian(rt.constant_texture([0.4, 0.2, 0.1]))
    mirror_m = rt.mirror(rt.constant_texture([0.7, 0.6, 0.5]))

    items = [
        rt.with_material(ground, rt.sphere([0, -1000, 0], 1000)),
        rt.with_material(glass, rt.sphere([0, 1, 0], 1)),
        rt.with_material(diffuse, rt.sphere([-4, 1, 0], 1)),
        rt.with_material(mirror_m, rt.sphere([4, 1, 0], 1)),
    ]

    rg = np.random.default_rng(1234)
    lamb_centers, lamb_colors = [], []
    metal_items = []
    for a in range(-11, 11):
        for b in range(-11, 11):
            center = np.array([a + rg.uniform(0, 0.9), 0.2,
                               b + rg.uniform(0, 0.9)])
            if np.linalg.norm(center - np.array([4, 0.2, 0])) <= 0.9:
                continue
            choose = rg.uniform()
            if choose < 0.8:
                color = rg.uniform(0, 1, 3) * rg.uniform(0, 1, 3)
                lamb_centers.append(center)
                lamb_colors.append(color)
            elif choose < 0.95:
                fuzz = rg.uniform(0, 0.5)
                color = rg.uniform(0.5, 1, 3)
                metal_items.append(rt.with_material(
                    rt.metal(fuzz, rt.constant_texture(color)),
                    rt.sphere(center, 0.2)))
            else:
                items.append(rt.with_material(glass, rt.sphere(center, 0.2)))
    for c, col in zip(lamb_centers, lamb_colors):
        items.append(rt.with_material(
            rt.lambertian(rt.constant_texture(col)), rt.sphere(c, 0.2)))
    items.extend(metal_items)

    scene = rt.compile_scene(rt.group(items), accel="dense")
    settings = rt.CameraSettings(
        aspect_ratio=16 / 9, image_width=args.width,
        samples_per_pixel=args.spp, max_depth=args.depth,
        vfov=degrees(20),
        center=jnp.asarray([13.0, 2.0, 3.0]),
        look_at=jnp.asarray([0.0, 0.0, 0.0]),
        defocus_angle=degrees(0.6), focus_dist=10.0,
        background=rt.sky,
    )
    return scene, settings, 1234


if __name__ == "__main__":
    scene_main("demo1", build, 1200, 500, 50)
