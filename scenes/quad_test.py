"""quadTest (reference test/Main.hs:88-117): five colored parallelograms."""
from _common import scene_main


def build(args):
    import jax.numpy as jnp
    import raytrace_tpu as rt
    from raytrace_tpu import degrees

    def lam(c):
        return rt.lambertian(rt.constant_texture(c))

    world = rt.group([
        rt.with_material(lam([1.0, 0.2, 0.2]),
                         rt.parallelogram([-3, -2, 5], [0, 0, -4], [0, 4, 0])),
        rt.with_material(lam([0.2, 1.0, 0.2]),
                         rt.parallelogram([-2, -2, 0], [4, 0, 0], [0, 4, 0])),
        rt.with_material(lam([0.2, 0.2, 1.0]),
                         rt.parallelogram([3, -2, 1], [0, 0, 4], [0, 4, 0])),
        rt.with_material(lam([1.0, 0.5, 0.0]),
                         rt.parallelogram([-2, 3, 1], [4, 0, 0], [0, 0, 4])),
        rt.with_material(lam([0.2, 0.8, 0.8]),
                         rt.parallelogram([-2, -3, 5], [4, 0, 0], [0, 0, -4])),
    ])
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        aspect_ratio=1.0, image_width=args.width,
        samples_per_pixel=args.spp, max_depth=args.depth,
        background=rt.sky, vfov=degrees(80),
        center=jnp.asarray([0.0, 0.0, 9.0]),
        look_at=jnp.asarray([0.0, 0.0, 0.0]),
    )
    return scene, settings, 0


if __name__ == "__main__":
    scene_main("quad_test", build, 400, 100, 50)
