"""cornellSmoke (reference test/Main.hs:220-257): Cornell box with two
constant-medium fog boxes (absorbing black + scattering white)."""
from _common import scene_main


def build(args):
    import jax.numpy as jnp
    import raytrace_tpu as rt
    from raytrace_tpu import degrees

    red = rt.lambertian(rt.constant_texture([0.65, 0.05, 0.05]))
    white = rt.lambertian(rt.constant_texture([0.73, 0.73, 0.73]))
    green = rt.lambertian(rt.constant_texture([0.12, 0.45, 0.15]))
    light = rt.light_source(rt.constant_texture([7.0, 7.0, 7.0]))

    surfaces = [
        rt.with_material(green, rt.parallelogram([555, 0, 0], [0, 555, 0], [0, 0, 555])),
        rt.with_material(red, rt.parallelogram([0, 0, 0], [0, 555, 0], [0, 0, 555])),
        rt.with_material(light, rt.parallelogram([113, 554, 127], [330, 0, 0], [0, 0, 305])),
        rt.with_material(white, rt.parallelogram([0, 0, 0], [555, 0, 0], [0, 0, 555])),
        rt.with_material(white, rt.parallelogram([555, 555, 555], [-555, 0, 0], [0, 0, -555])),
        rt.with_material(white, rt.parallelogram([0, 0, 555], [555, 0, 0], [0, 555, 0])),
    ]
    cube1 = rt.transform(
        rt.compose(rt.translate([265, 0, 295]), rt.rotate_y(degrees(15))),
        rt.cuboid([0, 0, 0], [165, 330, 165]))
    cube2 = rt.transform(
        rt.compose(rt.translate([130, 0, 65]), rt.rotate_y(degrees(-18))),
        rt.cuboid([0, 0, 0], [165, 165, 165]))

    world = rt.group(surfaces + [
        rt.with_material(rt.pitch_black(), rt.constant_medium(0.01, cube1)),
        rt.with_material(rt.isotropic(rt.constant_texture(1.0)),
                         rt.constant_medium(0.01, cube2)),
    ])
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        aspect_ratio=1.0, image_width=args.width,
        samples_per_pixel=args.spp, max_depth=args.depth,
        background=rt.const_background(0.0), vfov=degrees(40),
        center=jnp.asarray([278.0, 278.0, -800.0]),
        look_at=jnp.asarray([278.0, 278.0, 0.0]),
    ).with_redirect_targets(
        [(0.25, [113, 554, 127], [330, 0, 0], [0, 0, 305])])
    return scene, settings, 0


if __name__ == "__main__":
    scene_main("cornell_smoke", build, 600, 200, 50)
