"""pawnTest (reference test/Main.hs:323-344): pawn.obj mesh as a glass
shell over a red subsurface-scattering volume."""
from _common import scene_main
from _assets import obj_path


def build(args):
    import jax.numpy as jnp
    import raytrace_tpu as rt
    from raytrace_tpu import degrees
    from raytrace_tpu.scene.obj import read_obj

    mesh = read_obj(obj_path("pawn.obj")).transform_vertices(rt.scale(100))
    pawn = rt.triangle_mesh(mesh)
    world = rt.group([
        rt.with_material(rt.dielectric(1.5), pawn),
        rt.with_material(rt.isotropic(rt.constant_texture([1.0, 0.0, 0.0])),
                         rt.constant_medium(5.0, rt.triangle_mesh(mesh))),
    ])
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        center=jnp.asarray([0.0, 3.75, 5.0]),
        look_at=jnp.asarray([0.0, 2.75, 0.0]),
        image_width=args.width, vfov=degrees(80),
        samples_per_pixel=args.spp, max_depth=args.depth,
        background=rt.gray_fade,
    )
    return scene, settings, 55


if __name__ == "__main__":
    scene_main("pawn_test", build, 500, 400, 20, writer="linear")
