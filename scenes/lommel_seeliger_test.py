"""lommelSeeligerTest (reference test/Main.hs:346-360): Lommel-Seeliger
moon-like sphere lit by a spherical light, with redirection toward a quad
in front of the light."""
from _common import scene_main


def build(args):
    import raytrace_tpu as rt

    world = rt.group([
        rt.with_material(rt.lommel_seeliger(rt.constant_texture(1.0)),
                         rt.sphere([0, 0, -2], 1)),
        rt.with_material(rt.light_source(rt.constant_texture(160.0)),
                         rt.sphere([0, 0, 22], 1)),
    ])
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        image_width=args.width, samples_per_pixel=args.spp,
        max_depth=args.depth, background=rt.const_background(0.0),
    ).with_redirect_targets([(0.5, [-1, -1, 21], [2, 0, 0], [0, 2, 0])])
    return scene, settings, 55


if __name__ == "__main__":
    scene_main("lommel_seeliger_test", build, 500, 500, 10, writer="linear")
