"""Cornell box (reference test/Main.hs:188-218): 600px, 200 spp, depth 50,
seed 234, with MIS redirection toward the light quad.  Pass --no-redirect
to disable redirection (the reference's timing comparison,
test/Main.hs:381-383)."""
import sys

from _common import scene_main

NO_REDIRECT = "--no-redirect" in sys.argv
if NO_REDIRECT:
    sys.argv.remove("--no-redirect")


def build(args):
    import jax.numpy as jnp
    import raytrace_tpu as rt
    from raytrace_tpu import degrees

    red = rt.lambertian(rt.constant_texture([0.65, 0.05, 0.05]))
    white = rt.lambertian(rt.constant_texture([0.73, 0.73, 0.73]))
    green = rt.lambertian(rt.constant_texture([0.12, 0.45, 0.15]))
    light = rt.light_source(rt.constant_texture([15.0, 15.0, 15.0]))

    world = rt.group([
        rt.with_material(green, rt.parallelogram([555, 0, 0], [0, 555, 0], [0, 0, 555])),
        rt.with_material(red, rt.parallelogram([0, 0, 0], [0, 555, 0], [0, 0, 555])),
        rt.with_material(light, rt.parallelogram([343, 554, 332], [-130, 0, 0], [0, 0, -105])),
        rt.with_material(white, rt.parallelogram([0, 0, 0], [555, 0, 0], [0, 0, 555])),
        rt.with_material(white, rt.parallelogram([555, 555, 555], [-555, 0, 0], [0, 0, -555])),
        rt.with_material(white, rt.parallelogram([0, 0, 555], [555, 0, 0], [0, 555, 0])),
        rt.transform(rt.compose(rt.translate([265, 0, 295]), rt.rotate_y(degrees(15))),
                     rt.with_material(white, rt.cuboid([0, 0, 0], [165, 330, 165]))),
        rt.transform(rt.compose(rt.translate([130, 0, 65]), rt.rotate_y(degrees(-18))),
                     rt.with_material(white, rt.cuboid([0, 0, 0], [165, 165, 165]))),
    ])
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        center=jnp.asarray([278.0, 278.0, -800.0]),
        look_at=jnp.asarray([278.0, 278.0, 0.0]),
        vfov=degrees(40),
        aspect_ratio=1.0,
        image_width=args.width,
        samples_per_pixel=args.spp,
        max_depth=args.depth,
        background=rt.const_background(0.0),
    )
    if not NO_REDIRECT:
        settings = settings.with_redirect_targets(
            [(0.25, [343, 554, 332], [-130, 0, 0], [0, 0, -105])]
        )
    return scene, settings, 234


if __name__ == "__main__":
    scene_main("cornell_box", build, 600, 200, 50)
