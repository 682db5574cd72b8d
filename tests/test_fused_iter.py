"""Fused wavefront-iteration megakernel (ops/pallas/iter_kernel.py +
diff/fused_iter.py) vs the unfused diff wavefront: the in-kernel
regeneration/RNG/camera stage must reproduce the XLA stage exactly (the
int32 counter-hash is bit-identical to core/rng.py's uint32 stream by
construction), and the custom-VJP backward must equal the unfused
backward on every scene-parameter gradient."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _cornell_scene_and_settings
from raytrace_tpu.core import rng
from raytrace_tpu.diff.fused_iter import fused_iter_eligible
from raytrace_tpu.diff.gradients import partition, render_loss_wavefront
from raytrace_tpu.render.integrator import trace_wavefront_diff

R = 4096
N_PIX = 64 * 64


@pytest.fixture(scope="module")
def cornell():
    scene, s = _cornell_scene_and_settings(width=64, spp=8, depth=10)
    return scene, s.replace(rr_depth=2)


def _run(scene, s, pix, spp, n_iters, schedule=None, fused=True):
    if not fused:
        os.environ["RT_NO_FUSED_ITER"] = "1"
    try:
        return trace_wavefront_diff(
            scene, s, rng.base_key(0), pix, spp, n_iters=n_iters,
            remat=False, use_mega=True, mega_interpret=True,
            schedule=schedule)
    finally:
        os.environ.pop("RT_NO_FUSED_ITER", None)


def test_fused_iter_forward_bit_identical(cornell):
    scene, s = cornell
    assert fused_iter_eligible(scene, s, R, interpret=True)
    pix = jnp.arange(R, dtype=jnp.int32) % N_PIX
    mean_f, done_f = _run(scene, s, pix, 8, 30)
    mean_u, done_u = _run(scene, s, pix, 8, 30, fused=False)
    assert bool(jnp.all(done_f == done_u))
    np.testing.assert_array_equal(np.asarray(mean_f), np.asarray(mean_u))


def test_fused_iter_gradients_match_unfused(cornell):
    scene, s = cornell
    params, statics = partition(scene)
    pix = jnp.arange(R, dtype=jnp.int32) % N_PIX
    target = jnp.zeros((R, 3), jnp.float32)

    def go(fused):
        if not fused:
            os.environ["RT_NO_FUSED_ITER"] = "1"
        try:
            vg = jax.value_and_grad(render_loss_wavefront, has_aux=True)
            return vg(params, statics, s, rng.base_key(0), pix, target,
                      spp=8, n_iters=30, remat=False)
        finally:
            os.environ.pop("RT_NO_FUSED_ITER", None)

    (l_f, fr_f), g_f = go(True)
    (l_u, fr_u), g_u = go(False)
    assert float(l_f) == float(l_u)
    assert float(fr_f) == float(fr_u)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_u)):
        if a is None or not hasattr(a, "dtype"):
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_iter_two_phase_schedule(cornell):
    """The compacted completion phases must produce the same estimator
    through the fused driver as through the unfused one."""
    scene, s = cornell
    r2 = 8192
    pix = jnp.arange(r2, dtype=jnp.int32) % N_PIX
    mean_f, done_f = _run(scene, s, pix, 8, 25, schedule=((15, 4096),))
    mean_u, done_u = _run(scene, s, pix, 8, 25, schedule=((15, 4096),),
                          fused=False)
    assert bool(jnp.all(done_f == done_u))
    np.testing.assert_array_equal(np.asarray(mean_f), np.asarray(mean_u))
    # the compacted phase made real progress (equality above is the
    # correctness check; full completion needs bench-scale iterations)
    assert int(done_f.sum()) >= int(0.999 * r2 * 8)


def test_fused_iter_remat(cornell):
    """remat=True must give the same values (checkpointed scan body)."""
    scene, s = cornell
    pix = jnp.arange(R, dtype=jnp.int32) % N_PIX
    params, statics = partition(scene)
    target = jnp.zeros((R, 3), jnp.float32)
    vg = jax.value_and_grad(render_loss_wavefront, has_aux=True)
    (l0, _), g0 = vg(params, statics, s, rng.base_key(0), pix, target,
                     spp=4, n_iters=16, remat=False)
    (l1, _), g1 = vg(params, statics, s, rng.base_key(0), pix, target,
                     spp=4, n_iters=16, remat=True)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        if a is None or not hasattr(a, "dtype"):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_iter_regen_kernel_backward(cornell, monkeypatch):
    """The opt-in one-kernel backward (bounce_bwd_regen_megakernel:
    regen reconstruction + replay transpose + winner reduction in one
    Pallas kernel) must equal the default backward bit-for-bit."""
    scene, s = cornell
    params, statics = partition(scene)
    pix = jnp.arange(R, dtype=jnp.int32) % N_PIX
    target = jnp.zeros((R, 3), jnp.float32)

    def go():
        vg = jax.value_and_grad(render_loss_wavefront, has_aux=True)
        return vg(params, statics, s, rng.base_key(0), pix, target,
                  spp=4, n_iters=16, remat=False)

    (l0, _), g0 = go()
    monkeypatch.setenv("RT_FUSED_BWD_KERNEL", "1")
    (l1, _), g1 = go()
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        if a is None or not hasattr(a, "dtype"):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_iter_forward_stationary_driver(cornell):
    """The fused-iteration fast path of trace_wavefront_stationary must
    reproduce the XLA-bounce driver statistically: the XLA reference on
    CPU runs the non-mega bounce, whose sphere-uv/atan2 lowering differs
    in final ulps from the kernel's, so a handful of lanes may take a
    different Russian-roulette branch — the estimator is unchanged
    (same RNG stream, same physics; cf. tests/test_bounce_kernel.py
    tolerances)."""
    from raytrace_tpu.render.integrator import trace_wavefront_stationary
    scene, s = cornell
    n_pix = 48 * 48
    s2 = s.replace(image_width=48, samples_per_pixel=4)
    key = rng.base_key(1)
    acc_f = trace_wavefront_stationary(scene, s2, key, n_pix, 4,
                                       fused_interpret=True)
    os.environ["RT_NO_FUSED_ITER"] = "1"
    try:
        acc_u = trace_wavefront_stationary(scene, s2, key, n_pix, 4,
                                           fused_interpret=True)
    finally:
        os.environ.pop("RT_NO_FUSED_ITER", None)
    a, b = np.asarray(acc_f), np.asarray(acc_u)
    # almost every lane identical; brightness equal to Monte-Carlo noise
    frac_diff = (np.abs(a - b).max(axis=1) > 1e-5).mean()
    assert frac_diff < 0.02, frac_diff
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=2e-3)


def test_fused_iter_vmem_table_variant(monkeypatch):
    """Scenes past MAX_SMEM_PRIMS (primitive table whole in VMEM) must
    take the fused stationary driver and agree with the XLA path
    statistically (same RNG stream; ulp-level transcendental
    differences only — cf. the stationary test above).  The forward
    driver caps the megakernel at MEGA_MAX_PRIMS_FWD since round 5
    (the split path wins at mesh scale), so pin the cap up to keep
    covering the VMEM-table kernel variant the DIFF path still uses."""
    from test_lane_replay import _scene_mesh
    from raytrace_tpu.ops.pallas.intersect_kernel import MAX_SMEM_PRIMS
    from raytrace_tpu.render.camera import CameraSettings, sky
    from raytrace_tpu.render.integrator import trace_wavefront_stationary
    import jax.numpy as jnp2

    monkeypatch.setenv("RT_MEGA_MAX_PRIMS_FWD", "8192")
    scene = _scene_mesh(n_grid=18)        # 648 tris + extras > 512 rows
    assert scene.prims.kind.shape[0] > MAX_SMEM_PRIMS
    s = CameraSettings(center=jnp2.asarray([0.0, 2.0, 8.0]),
                       look_at=jnp2.zeros(3), image_width=32,
                       aspect_ratio=1.0, max_depth=6, background=sky)
    assert fused_iter_eligible(scene, s, 1024, interpret=True,
                               need_replay=False)
    n_pix = 32 * 32
    key = rng.base_key(2)
    acc_f = trace_wavefront_stationary(scene, s, key, n_pix, 2,
                                       fused_interpret=True)
    os.environ["RT_NO_FUSED_ITER"] = "1"
    try:
        acc_u = trace_wavefront_stationary(scene, s, key, n_pix, 2,
                                           fused_interpret=True)
    finally:
        os.environ.pop("RT_NO_FUSED_ITER", None)
    a, b = np.asarray(acc_f), np.asarray(acc_u)
    frac_diff = (np.abs(a - b).max(axis=1) > 1e-5).mean()
    assert frac_diff < 0.02, frac_diff
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=2e-3)


def test_fused_iter_allpairs_stage_matches(monkeypatch):
    """The mesh-scale broadcast all-pairs intersect stage inside the
    fused iteration kernel (RT_ITER_AP_MIN) must agree with the
    clustered per-prim loop — same winner/tie semantics (strict
    running-min, lowest index), same attrs via the phase-2 one-hot
    gather."""
    from test_lane_replay import _scene_mesh
    from raytrace_tpu.ops.pallas.intersect_kernel import MAX_SMEM_PRIMS
    from raytrace_tpu.render.camera import CameraSettings, sky
    from raytrace_tpu.render.integrator import trace_wavefront_stationary
    import jax.numpy as jnp2

    monkeypatch.setenv("RT_MEGA_MAX_PRIMS_FWD", "8192")
    scene = _scene_mesh(n_grid=18)        # 648 tris + extras > 512 rows
    assert scene.prims.kind.shape[0] > MAX_SMEM_PRIMS
    s = CameraSettings(center=jnp2.asarray([0.0, 2.0, 8.0]),
                       look_at=jnp2.zeros(3), image_width=32,
                       aspect_ratio=1.0, max_depth=6, background=sky)
    n_pix = 32 * 32
    key = rng.base_key(2)
    monkeypatch.setenv("RT_ITER_AP_MIN", "512")
    acc_ap = trace_wavefront_stationary(scene, s, key, n_pix, 2,
                                        fused_interpret=True)
    monkeypatch.setenv("RT_ITER_AP_MIN", "100000000")
    acc_cl = trace_wavefront_stationary(scene, s, key, n_pix, 2,
                                        fused_interpret=True)
    a, b = np.asarray(acc_ap), np.asarray(acc_cl)
    frac_diff = (np.abs(a - b).max(axis=1) > 1e-5).mean()
    assert frac_diff < 0.02, frac_diff
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=2e-3)


# ---------------------------------------------------------------------------
# Deferred rich-texture albedo (VERDICT r4 weak #5): image/noise scenes
# stay on the fused-iteration kernel; the texel multiplies into
# throughput OUTSIDE the kernel, so gradients (atlas included) must
# equal the generic XLA diff path's.
# ---------------------------------------------------------------------------

def _rich_scene():
    import raytrace_tpu as rt
    img = np.linspace(0.1, 0.9, 8 * 16 * 3).astype(np.float32) \
        .reshape(8, 16, 3)
    world = rt.group([
        rt.with_material(rt.lambertian(rt.image_texture(img)),
                         rt.parallelogram([-2, -1, -4], [4, 0, 0],
                                          [0, 2, 0])),
        rt.with_material(rt.lambertian(
            rt.noise_texture(2, 4.0, [0, 0, 0], [0.1, 0.1, 0.4],
                             [0.9, 0.9, 1.0])),
            rt.sphere([0, -51, -4], 50.0)),
        rt.with_material(rt.light_source(rt.constant_texture(3.0)),
                         rt.parallelogram([-2, 4, -5], [4, 0, 0],
                                          [0, 0, 4])),
    ])
    scene = rt.compile_scene(world)
    # NO Russian roulette: the kernel's RR survival test uses the
    # pre-multiply (albedo-1) throughput, so kill decisions differ from
    # the XLA oracle's (both unbiased; not seed-comparable)
    s = rt.CameraSettings(image_width=64, samples_per_pixel=8,
                          max_depth=6,
                          background=rt.const_background(0.2))
    return scene, s


def test_fused_iter_rich_texture_eligible_and_matches():
    scene, s = _rich_scene()
    assert fused_iter_eligible(scene, s, R, interpret=True)
    # forward-only driver must NOT claim rich scenes (no multiply there)
    assert not fused_iter_eligible(scene, s, R, interpret=True,
                                   need_replay=False)
    pix = jnp.arange(R, dtype=jnp.int32) % N_PIX
    mean_f, done_f = trace_wavefront_diff(
        scene, s, rng.base_key(0), pix, 8, n_iters=40, remat=False,
        mega_interpret=True)
    mean_u, done_u = trace_wavefront_diff(
        scene, s, rng.base_key(0), pix, 8, n_iters=40, remat=False,
        use_mega=False)
    assert bool(jnp.all(done_f == done_u))
    # sphere uv in-kernel uses polynomial atan2; only the noise texture
    # (point-driven) sits on the sphere, so agreement is tight
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_u),
                               rtol=2e-4, atol=2e-5)


def test_fused_iter_rich_texture_gradients_match_generic():
    scene, s = _rich_scene()
    params, statics = partition(scene)
    pix = jnp.arange(R, dtype=jnp.int32) % N_PIX
    target = jnp.full((R, 3), 0.2, jnp.float32)

    def loss(params, fused):
        from raytrace_tpu.diff.gradients import combine
        sc = combine(params, statics)
        img, done = trace_wavefront_diff(
            sc, s, rng.base_key(0), pix, 8, n_iters=40, remat=False,
            mega_interpret=fused, use_mega=None if fused else False)
        return jnp.mean((img - target) ** 2), jnp.mean(done / 8)

    (l_f, fr_f), g_f = jax.value_and_grad(loss, has_aux=True)(params, True)
    (l_u, fr_u), g_u = jax.value_and_grad(loss, has_aux=True)(params,
                                                              False)
    assert float(fr_f) == float(fr_u) == 1.0
    np.testing.assert_allclose(float(l_f), float(l_u), rtol=1e-4)
    # atlas gradient present and equal to the generic path's
    ga_f = np.asarray(g_f.textures.images)
    ga_u = np.asarray(g_u.textures.images)
    assert np.sum(np.abs(ga_f)) > 0.0
    np.testing.assert_allclose(ga_f, ga_u, rtol=2e-3, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_u)):
        if a is None or not hasattr(a, "dtype"):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_fused_iter_image_only_soa_path_matches():
    """The image-only SoA texel path (no noise/marble in scene) must
    match the generic XLA diff path in values and atlas gradients."""
    import raytrace_tpu as rt
    img = (np.arange(4 * 8 * 3, dtype=np.float32) % 7 / 7.0) \
        .reshape(4, 8, 3)
    world = rt.group([
        rt.with_material(rt.lambertian(rt.image_texture(img)),
                         rt.parallelogram([-2, -1, -4], [4, 0, 0],
                                          [0, 2, 0])),
        rt.with_material(rt.lambertian(rt.constant_texture(0.5)),
                         rt.parallelogram([-9, -1, -9], [18, 0, 0],
                                          [0, 0, 18])),
        rt.with_material(rt.light_source(rt.constant_texture(3.0)),
                         rt.parallelogram([-2, 4, -5], [4, 0, 0],
                                          [0, 0, 4])),
    ])
    scene = rt.compile_scene(world)
    s = rt.CameraSettings(image_width=64, samples_per_pixel=8,
                          max_depth=6,
                          background=rt.const_background(0.2))
    assert fused_iter_eligible(scene, s, R, interpret=True)
    params, statics = partition(scene)
    pix = jnp.arange(R, dtype=jnp.int32) % N_PIX
    target = jnp.full((R, 3), 0.2, jnp.float32)

    def loss(params, fused):
        from raytrace_tpu.diff.gradients import combine
        sc = combine(params, statics)
        img2, done = trace_wavefront_diff(
            sc, s, rng.base_key(0), pix, 8, n_iters=40, remat=False,
            mega_interpret=fused, use_mega=None if fused else False)
        return jnp.mean((img2 - target) ** 2), jnp.mean(done / 8)

    (l_f, fr_f), g_f = jax.value_and_grad(loss, has_aux=True)(params, True)
    (l_u, fr_u), g_u = jax.value_and_grad(loss, has_aux=True)(params,
                                                              False)
    assert float(fr_f) == float(fr_u) == 1.0
    # planar-only geometry: uv is exact barycentric/membership math in
    # both paths, so values agree to transcendental-lowering noise
    np.testing.assert_allclose(float(l_f), float(l_u), rtol=1e-5)
    ga_f = np.asarray(g_f.textures.images)
    ga_u = np.asarray(g_u.textures.images)
    assert np.sum(np.abs(ga_f)) > 0.0
    np.testing.assert_allclose(ga_f, ga_u, rtol=1e-3, atol=1e-6)


def test_fused_iter_mesh_scale_gradients_match_generic():
    """Mesh-scale scenes (> 64 prims) now take the fused-iteration diff
    driver with the pre-gathered regen backward (round-5: the prim cap
    moved from 64 to MEGA_MAX_PRIMS); loss and every gradient must
    match the generic XLA diff path."""
    from test_lane_replay import _scene_mesh
    from raytrace_tpu.render.camera import CameraSettings
    scene = _scene_mesh(n_grid=10)
    assert scene.prims.kind.shape[0] > 64
    s = CameraSettings(center=jnp.asarray([0.0, 2.0, 6.0]),
                       look_at=jnp.zeros(3), vfov=0.9, image_width=64,
                       samples_per_pixel=4, max_depth=5,
                       background=__import__(
                           "raytrace_tpu").const_background(0.3))
    assert fused_iter_eligible(scene, s, R, interpret=True)
    params, statics = partition(scene)
    pix = jnp.arange(R, dtype=jnp.int32) % N_PIX
    target = jnp.zeros((R, 3), jnp.float32)

    def loss(params, fused):
        from raytrace_tpu.diff.gradients import combine
        sc = combine(params, statics)
        img, done = trace_wavefront_diff(
            sc, s, rng.base_key(0), pix, 4, n_iters=24, remat=False,
            mega_interpret=fused, use_mega=None if fused else False)
        return jnp.mean((img - target) ** 2), jnp.mean(done / 4)

    (l_f, fr_f), g_f = jax.value_and_grad(loss, has_aux=True)(params, True)
    (l_u, fr_u), g_u = jax.value_and_grad(loss, has_aux=True)(params,
                                                              False)
    np.testing.assert_allclose(float(l_f), float(l_u), rtol=2e-4)
    assert abs(float(fr_f) - float(fr_u)) < 0.02
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_u)):
        if a is None or not hasattr(a, "dtype"):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-5)


@pytest.mark.parametrize("texkind", ["image", "marble"])
def test_fused_iter_ap_stage_rich_mesh_gradients(texkind):
    """The in-kernel broadcast all-pairs intersect stage (>512 rows,
    RT_ITER_AP_MIN default) composed with deferred rich-texture albedo:
    a rich-textured height-field mesh must train through the fused
    path with gradients (atlas / noise-scale included) matching the
    generic XLA diff path — covers both apply_rich branches (the
    image-only SoA fast path and the eval_texture one-hot path)."""
    import raytrace_tpu as rt
    from test_lane_replay import _scene_mesh  # noqa: F401 (pattern ref)
    from raytrace_tpu.render.camera import CameraSettings

    rng_np = np.random.RandomState(3)
    n_grid = 18
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
    img = rng_np.uniform(0.1, 0.9, (8, 16, 3)).astype(np.float32)
    tex = rt.image_texture(img) if texkind == "image" \
        else rt.marble_texture([0.0, 0.0, 1.0], 2.0)
    world = rt.group([
        rt.with_material(rt.lambertian(tex),
                         rt.triangle_mesh(mesh)),
        rt.with_material(rt.light_source(
            rt.constant_texture([4.0, 3.0, 2.0])),
            rt.parallelogram([-1, 4, -1], [2, 0, 0], [0, 0, 2])),
    ])
    scene = rt.compile_scene(world)
    assert scene.prims.kind.shape[0] > 512
    s = CameraSettings(center=jnp.asarray([0.0, 2.5, 6.0]),
                       look_at=jnp.zeros(3), vfov=0.9, image_width=64,
                       samples_per_pixel=4, max_depth=4,
                       background=rt.const_background(0.3))
    from raytrace_tpu.ops.pallas.iter_kernel import resolve_use_ap
    from raytrace_tpu.render.integrator import _n_scan_prims
    assert resolve_use_ap(_n_scan_prims(scene.prims),
                          scene.prims.kind_segments)
    assert fused_iter_eligible(scene, s, R, interpret=True)
    params, statics = partition(scene)
    pix = jnp.arange(R, dtype=jnp.int32) % N_PIX
    target = jnp.zeros((R, 3), jnp.float32)

    def loss(params, fused):
        from raytrace_tpu.diff.gradients import combine
        sc = combine(params, statics)
        img2, done = trace_wavefront_diff(
            sc, s, rng.base_key(0), pix, 4, n_iters=20, remat=False,
            mega_interpret=fused, use_mega=None if fused else False)
        return jnp.mean((img2 - target) ** 2), jnp.mean(done / 4)

    (l_f, fr_f), g_f = jax.value_and_grad(loss, has_aux=True)(params,
                                                              True)
    (l_u, fr_u), g_u = jax.value_and_grad(loss, has_aux=True)(params,
                                                              False)
    np.testing.assert_allclose(float(l_f), float(l_u), rtol=2e-4)
    assert abs(float(fr_f) - float(fr_u)) < 0.02
    if texkind == "image":
        ga_f = np.asarray(g_f.textures.images)
        ga_u = np.asarray(g_u.textures.images)
        assert np.sum(np.abs(ga_f)) > 0.0
        np.testing.assert_allclose(ga_f, ga_u, rtol=5e-3, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_f.prims),
                    jax.tree_util.tree_leaves(g_u.prims)):
        if a is None or not hasattr(a, "dtype"):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-5)
