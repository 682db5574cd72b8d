"""metalTest (reference test/Main.hs:30-61): lambertian ground + center,
dielectric sphere with hollow-glass bubble (ior 1/1.5), fuzzy metal,
thin-lens defocus, sky background."""
from _common import scene_main


def build(args):
    import jax.numpy as jnp
    import raytrace_tpu as rt
    from raytrace_tpu import degrees

    ground = rt.lambertian(rt.constant_texture([0.8, 0.8, 0.0]))
    center = rt.lambertian(rt.constant_texture([0.1, 0.2, 0.5]))
    left = rt.dielectric(1.5)
    bubble = rt.dielectric(1 / 1.5)
    right = rt.metal(1.0, rt.constant_texture([0.8, 0.6, 0.2]))

    world = rt.group([
        rt.with_material(ground, rt.sphere([0, -100.5, -1], 100)),
        rt.with_material(center, rt.sphere([0, 0, -1.2], 0.5)),
        rt.with_material(left, rt.sphere([-1, 0, -1], 0.5)),
        rt.with_material(bubble, rt.sphere([-1, 0, -1], 0.4)),
        rt.with_material(right, rt.sphere([1, 0, -1], 0.5)),
    ])
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        aspect_ratio=16 / 9, image_width=args.width,
        samples_per_pixel=args.spp, max_depth=args.depth,
        background=rt.sky,
        center=jnp.asarray([-2.0, 2.0, 1.0]),
        look_at=jnp.asarray([0.0, 0.0, -1.0]),
        vfov=degrees(20), defocus_angle=degrees(10), focus_dist=3.4,
    )
    return scene, settings, 0


if __name__ == "__main__":
    scene_main("metal_test", build, 400, 100, 50)
