"""The SoA replay backward (diff/lane_replay.py) must produce the same
vector-Jacobian products as the generic XLA replay it replaces
(diff/mega_bounce.py fallback path) — every cotangent, on scenes
covering all material kinds, all primitive kinds, checker textures,
motion blur and redirect targets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytrace_tpu as rt
from raytrace_tpu.diff.gradients import combine, partition
from raytrace_tpu.diff.lane_replay import replay_bwd, replay_eligible
from raytrace_tpu.ops.diff_intersect import winner_surface_hit
from raytrace_tpu.render.integrator import bounce, n_bounce_uniforms


def _scene_all_kinds(motion: bool):
    tex_checker = rt.checker_texture(3.0, 4.0, [0.8, 0.2, 0.1],
                                     [0.1, 0.2, 0.8])
    mats = [
        rt.lambertian(rt.constant_texture([0.7, 0.5, 0.3])),
        rt.lambertian(tex_checker),
        rt.lommel_seeliger(rt.constant_texture([0.4, 0.6, 0.2])),
        rt.mirror(rt.constant_texture([0.9, 0.9, 0.8])),
        rt.metal(0.3, rt.constant_texture([0.8, 0.6, 0.4])),
        rt.dielectric(1.5),
        rt.transparent(rt.constant_texture([0.9, 0.7, 0.9])),
        rt.light_source(rt.constant_texture([4.0, 3.0, 2.0])),
        rt.pitch_black(),
        rt.isotropic(rt.constant_texture([0.5, 0.5, 0.5])),
        rt.anisotropic(0.4, rt.constant_texture([0.6, 0.4, 0.5])),
    ]
    geoms = []
    rng = np.random.RandomState(0)
    for i, m in enumerate(mats):
        c = rng.uniform(-3, 3, 3)
        geoms.append(rt.with_material(m, rt.sphere(c, 0.7)))
        geoms.append(rt.with_material(
            m, rt.parallelogram(c + [0, -1.5, 0], [1.2, 0.1, 0],
                                [0, 0.2, 1.1])))
        if i % 3 == 0:
            geoms.append(rt.with_material(
                m, rt.triangle(c + [2, 0, 0], c + [3, 0.2, 0],
                               c + [2.2, 1, 0.3],
                               uv0=(0.1, 0.2), uv1=(0.9, 0.1),
                               uv2=(0.3, 0.8))))
        if i % 4 == 0:
            g = rt.cuboid(c + [-2, -2, -2], c + [-1, -0.5, -1.2])
            if motion and i == 0:
                g = rt.moving([0, 0, 0], [0.3, 0.5, -0.2], g)
            geoms.append(rt.with_material(m, g))
    return rt.compile_scene(rt.group(geoms))


def _settings(n_targets: int):
    s = rt.CameraSettings(
        center=jnp.asarray([0.0, 0.0, 8.0]),
        look_at=jnp.zeros(3), image_width=8, aspect_ratio=1.0,
        background=rt.sky,
    )
    tgts = [(0.2, [1.0, 4.0, 1.0], [-1.5, 0, 0], [0, 0, -1.2]),
            (0.15, [-2.0, 4.0, -1.0], [1.0, 0, 0.2], [0, 0.1, 1.0])]
    return s.with_redirect_targets(tgts[:n_targets])


@pytest.mark.parametrize("motion,n_targets", [(False, 0), (False, 2),
                                              (True, 1)])
def test_replay_bwd_matches_generic(motion, n_targets):
    scene = _scene_all_kinds(motion)
    assert replay_eligible(scene)
    s = _settings(n_targets)
    t_min = float(s.t_min)
    has_motion = scene.prims.has_motion
    assert has_motion == motion

    r = 512
    n = scene.prims.kind.shape[0]
    rng = np.random.RandomState(42)
    o = jnp.asarray(rng.uniform(-4, 4, (r, 3)), jnp.float32)
    d_np = rng.normal(size=(r, 3))
    d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True),
                    jnp.float32)
    time = jnp.asarray(rng.uniform(0, 1, r), jnp.float32)
    n_u = n_bounce_uniforms(scene)
    uniforms = jnp.asarray(rng.uniform(0, 1, (r, n_u + 1)), jnp.float32)
    radiance = jnp.asarray(rng.uniform(0, 1, (r, 3)), jnp.float32)
    thr = jnp.asarray(rng.uniform(0.1, 1, (r, 3)), jnp.float32)
    alive = jnp.asarray(rng.uniform(0, 1, r) > 0.15)
    # random winner indices incl. misses; realism doesn't matter — both
    # backward paths must agree as functions of (idx, state)
    idx = jnp.asarray(rng.randint(-1, n, r), jnp.int32)

    cts = tuple(jnp.asarray(rng.normal(size=(r, 3)), jnp.float32)
                for _ in range(4))

    params, statics = partition(scene)

    def g(params, o, d, time, thr):
        sc = combine(params, statics)
        p = sc.prims
        hit = winner_surface_hit(
            (p.p0, p.e1, p.e2, p.uvs, p.mv0, p.mv1), (p.kind, p.mat),
            o, d, time, idx, has_motion, t_min, has_box=p.has_box)
        o2, d2, rad2, thr2, _a, _dd = bounce(
            sc, s, o, d, time, uniforms, radiance, thr, alive, diff=True,
            hit_override=hit)
        return o2, d2, rad2, thr2

    _, vjp = jax.vjp(g, params, o, d, time, thr)
    g_params_ref, g_o_ref, g_d_ref, g_time_ref, g_thr_ref = vjp(cts)

    g_scene, g_o, g_d, g_time, g_rad, g_thr = jax.jit(
        lambda: replay_bwd(scene, s, o, d, time, uniforms, thr, alive,
                           idx, cts, has_motion=has_motion, t_min=t_min))()

    def close(a, b, name):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=name)

    close(g_o, g_o_ref, "g_o")
    close(g_d, g_d_ref, "g_d")
    close(g_time, g_time_ref, "g_time")
    close(g_thr, g_thr_ref, "g_thr")
    close(g_rad, cts[2], "g_rad")

    # the Pallas backward kernel (interpret mode) must agree too
    from raytrace_tpu.diff.lane_replay import replay_bwd_pallas
    pk = jax.jit(lambda: replay_bwd_pallas(
        scene, s, o, d, time, uniforms, thr, alive, idx, cts,
        has_motion=has_motion, t_min=t_min, interpret=True))()
    for got, want, nm in zip(pk[1:4], (g_o_ref, g_d_ref, g_time_ref),
                             ("g_o", "g_d", "g_time")):
        close(got, want, f"pallas {nm}")
    close(pk[5], g_thr_ref, "pallas g_thr")
    for lp, lr2 in zip(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda x: x if (hasattr(x, "dtype") and jnp.issubdtype(
                    x.dtype, jnp.floating)) else None, pk[0])),
            jax.tree_util.tree_leaves(g_params_ref)):
        close(lp, lr2, "pallas param leaf")

    leaves_new, treedef_new = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(
            lambda x: x if (hasattr(x, "dtype") and jnp.issubdtype(
                x.dtype, jnp.floating)) else None, g_scene))
    leaves_ref, treedef_ref = jax.tree_util.tree_flatten(g_params_ref)
    assert treedef_new == treedef_ref
    for ln, lr, path in zip(
            leaves_new, leaves_ref,
            [str(p) for p, _ in jax.tree_util.tree_flatten_with_path(
                g_params_ref)[0]]):
        close(ln, lr, f"param leaf {path}")


def _scene_mesh(n_grid: int = 12):
    """A ~300-row scene: a triangulated height field + the all-kinds
    extras — past MAX_REPLAY_PRIMS so the self-gathering backward kernel
    (ops/pallas/bounce_bwd_gather_kernel.py) serves the Pallas path."""
    rng = np.random.RandomState(7)
    xs = np.linspace(-3, 3, n_grid + 1)
    zs = np.linspace(-3, 3, n_grid + 1)
    xx, zz = np.meshgrid(xs, zs, indexing="ij")
    yy = 0.4 * np.sin(xx * 1.3) * np.cos(zz * 1.1)
    v = np.stack([xx, yy, zz], -1).reshape(-1, 3)
    vid = np.arange((n_grid + 1) ** 2).reshape(n_grid + 1, n_grid + 1)
    f = []
    for i in range(n_grid):
        for j in range(n_grid):
            a, b = vid[i, j], vid[i + 1, j]
            c, d = vid[i, j + 1], vid[i + 1, j + 1]
            f += [[a, b, c], [b, d, c]]
    mesh = rt.Mesh(vertices=v, uv=np.zeros((0, 2)),
                   faces=np.asarray(f, np.int64),
                   uv_faces=np.full((len(f), 3), -1, np.int64))
    tex_checker = rt.checker_texture(3.0, 4.0, [0.8, 0.2, 0.1],
                                     [0.1, 0.2, 0.8])
    geoms = [
        rt.with_material(rt.lambertian(rt.constant_texture([0.7, 0.5, 0.3])),
                         rt.triangle_mesh(mesh)),
        rt.with_material(rt.metal(0.2, rt.constant_texture([0.8, 0.6, 0.4])),
                         rt.sphere([0.0, 1.5, 0.0], 0.7)),
        rt.with_material(rt.lambertian(tex_checker),
                         rt.parallelogram([-4, -2, -4], [8, 0, 0],
                                          [0, 0, 8])),
        rt.with_material(rt.light_source(rt.constant_texture([4.0, 3.0, 2.0])),
                         rt.parallelogram([-1, 4, -1], [2, 0, 0],
                                          [0, 0, 2])),
        rt.with_material(rt.dielectric(1.5),
                         rt.sphere([1.5, 0.8, 1.0], 0.5)),
    ]
    return rt.compile_scene(rt.group(geoms))

