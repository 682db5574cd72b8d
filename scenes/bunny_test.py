"""bunnyTest (reference test/Main.hs:362-378): the Stanford bunny
(4968 triangles), centered via its bounding box, blue lambertian."""
from _common import scene_main
from _assets import obj_path


def build(args):
    import numpy as np
    import jax.numpy as jnp
    import raytrace_tpu as rt
    from raytrace_tpu import degrees
    from raytrace_tpu.scene.obj import read_obj

    mesh = read_obj(obj_path("bunny.obj"))
    lo, hi = mesh.bounding_box()
    center = 0.5 * (lo + hi)
    mesh = mesh.transform_vertices(rt.compose(
        rt.rotate_y(degrees(30)), rt.scale(12), rt.translate(-center)))
    world = rt.with_material(
        rt.lambertian(rt.constant_texture([0.3, 0.3, 1.0])),
        rt.triangle_mesh(mesh))
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        center=jnp.asarray([0.0, 0.5, 2.0]),
        look_at=jnp.asarray([0.0, 0.0, 0.0]),
        image_width=args.width, samples_per_pixel=args.spp,
        max_depth=args.depth, background=rt.gray_fade,
    )
    return scene, settings, 55


if __name__ == "__main__":
    scene_main("bunny_test", build, 600, 100, 10, writer="linear")
