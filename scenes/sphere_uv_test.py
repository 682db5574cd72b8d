"""sphereUVTest (reference test/Main.hs:128-134): a 1x1-pixel narrow-fov
probe of sphere uv mapping — the reference's closest thing to a unit
test."""
from _common import scene_main
from _assets import earthmap


def build(args):
    import raytrace_tpu as rt

    globe = rt.lambertian(rt.image_texture(earthmap()))
    world = rt.with_material(globe, rt.group([
        rt.sphere([0, 0, -2], 0.4), rt.sphere([0, 0, -1], 0.4),
    ]))
    scene = rt.compile_scene(world)
    settings = rt.CameraSettings(
        image_width=args.width, samples_per_pixel=args.spp,
        max_depth=args.depth, vfov=0.0001,
    )
    return scene, settings, 12


if __name__ == "__main__":
    scene_main("sphere_uv_test", build, 1, 1, 10, writer="linear")
