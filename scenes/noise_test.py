"""noiseTest (reference test/Main.hs:63-86): fractal-noise ground sphere +
marble ball."""
from _common import scene_main


def build(args):
    import jax.numpy as jnp
    import raytrace_tpu as rt
    from raytrace_tpu import degrees

    ground = rt.lambertian(rt.noise_texture(2, 2.0, [10, 0, 0], 0.0, 1.0))
    ball = rt.lambertian(rt.marble_texture([0, 0, 1], 4.0))

    world = rt.group([
        rt.with_material(ground, rt.sphere([0, -1000, 0], 1000)),
        rt.with_material(ball, rt.sphere([0, 2, 0], 2)),
    ])
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        aspect_ratio=16 / 9, image_width=args.width,
        samples_per_pixel=args.spp, max_depth=args.depth,
        background=rt.sky, vfov=degrees(20),
        center=jnp.asarray([13.0, 2.0, 3.0]),
        look_at=jnp.asarray([0.0, 0.0, 0.0]),
    )
    return scene, settings, 0


if __name__ == "__main__":
    scene_main("noise_test", build, 400, 100, 50)
