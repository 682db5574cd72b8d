"""demo2 (reference test/Main.hs:259-321): everything at once — 400 random-
height ground cuboids, a 1000-sphere rotated cloud, motion-blurred sphere,
dielectric + blue subsurface boundary, metal, earth texture, marble,
global thin fog, light redirection."""
import numpy as np

from _common import scene_main
from _assets import earthmap


def build(args):
    import jax.numpy as jnp
    import raytrace_tpu as rt
    from raytrace_tpu import degrees

    ground = rt.lambertian(rt.constant_texture([0.48, 0.83, 0.53]))
    white = rt.lambertian(rt.constant_texture([0.73, 0.73, 0.73]))

    rg = np.random.default_rng(1234)

    # 20x20 ground boxes with random heights (test/Main.hs:264-275)
    i, j = np.meshgrid(np.arange(20), np.arange(20), indexing="ij")
    x0 = (-1000 + i * 100).ravel()
    z0 = (-1000 + j * 100).ravel()
    y1 = rg.uniform(1, 101, 400)
    c0 = np.stack([x0, np.zeros(400), z0], -1)
    c1 = np.stack([x0 + 100, y1, z0 + 100], -1)
    boxes = rt.with_material(ground, rt.cuboids(c0, c1))

    # 1000-sphere cloud, rotated + translated (test/Main.hs:277-282)
    centers = rg.uniform(0, 165, (1000, 3))
    balls = rt.transform(
        rt.compose(rt.translate([-100, 270, 395]), rt.rotate_y(degrees(15))),
        rt.with_material(white, rt.spheres(centers, np.full(1000, 10.0))))

    boundary = rt.sphere([360, 150, 145], 70)
    light_q = ([123, 554, 147], [300, 0, 0], [0, 0, 265])

    world = rt.group([
        boxes, balls,
        rt.with_material(rt.light_source(rt.constant_texture([7.0, 7.0, 7.0])),
                         rt.parallelogram(*light_q)),
        rt.with_material(rt.lambertian(rt.constant_texture([0.7, 0.3, 0.1])),
                         rt.moving([0, 0, 0], [30, 0, 0],
                                   rt.sphere([400, 400, 200], 50))),
        rt.with_material(rt.dielectric(1.5), rt.sphere([260, 150, 45], 50)),
        rt.with_material(rt.dielectric(1.5), boundary),
        rt.with_material(rt.metal(1.0, rt.constant_texture([0.8, 0.8, 0.9])),
                         rt.sphere([0, 150, 145], 50)),
        rt.transform(
            rt.compose(rt.translate([400, 0, 400]), rt.rotate_y(np.pi / 2)),
            rt.with_material(rt.lambertian(rt.image_texture(earthmap())),
                             rt.sphere([0, 200, 0], 100))),
        rt.with_material(rt.lambertian(rt.marble_texture([0, 0, 0.05], 4.0)),
                         rt.sphere([220, 280, 300], 80)),
        rt.with_material(rt.isotropic(rt.constant_texture(1.0)),
                         rt.constant_medium(0.0001, rt.sphere([0, 0, 0], 5000))),
        rt.with_material(rt.isotropic(rt.constant_texture([0.2, 0.4, 0.9])),
                         rt.constant_medium(0.2, rt.sphere([360, 150, 145], 70))),
    ])
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        center=jnp.asarray([478.0, 278.0, -600.0]),
        look_at=jnp.asarray([278.0, 278.0, 0.0]),
        vfov=degrees(40), aspect_ratio=1.0, image_width=args.width,
        samples_per_pixel=args.spp, max_depth=args.depth,
        background=rt.const_background(0.0),
    ).with_redirect_targets([(0.25,) + light_q])
    return scene, settings, 1234


if __name__ == "__main__":
    scene_main("demo2", build, 400, 250, 4)
