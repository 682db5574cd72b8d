"""cuboidTest (reference test/Main.hs:119-126): earth-textured cuboid,
rotated and translated."""
from _common import scene_main
from _assets import earthmap


def build(args):
    import raytrace_tpu as rt
    from raytrace_tpu import degrees

    globe = rt.lambertian(rt.image_texture(earthmap()))
    world = rt.transform(
        rt.compose(rt.translate([0, 0, -3]), rt.rotate_x(degrees(60))),
        rt.with_material(globe, rt.cuboid([-1, -2, -0.5], [1, 2, 0.5])),
    )
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        image_width=args.width, samples_per_pixel=args.spp,
        max_depth=args.depth,
    )
    return scene, settings, 0


if __name__ == "__main__":
    scene_main("cuboid_test", build, 300, 10, 10, writer="linear")
