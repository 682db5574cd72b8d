"""README example scene (reference README.md:33-61): checker sphere,
blue ground sphere, tilted mirror parallelogram, white background,
600px 16:9, 50 spp, seed 100."""
from _common import scene_main


def build(args):
    import jax.numpy as jnp
    import raytrace_tpu as rt

    world = rt.group([
        rt.with_material(rt.lambertian(rt.checker_texture(20, 10, 0.2, 0.8)),
                         rt.sphere([0, 0, 0], 1)),
        rt.with_material(rt.lambertian(rt.constant_texture([0, 0.2, 0.5])),
                         rt.sphere([0, -1000, 0], 999)),
        rt.with_material(rt.mirror(rt.constant_texture(0.8)),
                         rt.parallelogram([-3.25, -1, -0.75],
                                          [1.25, 0, -1.25], [0, 2, 0])),
    ])
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        center=jnp.asarray([-0.75, 0.0, 2.0]),
        look_at=jnp.asarray([0.0, 0.0, -1.0]),
        aspect_ratio=16 / 9,
        image_width=args.width,
        samples_per_pixel=args.spp,
        max_depth=args.depth,
    )
    return scene, settings, 100


if __name__ == "__main__":
    scene_main("readme_example", build, 600, 50, 10, writer="linear")
