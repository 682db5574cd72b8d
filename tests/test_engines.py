"""Engine-selection observability: the report must match the drivers'
actual choices per scene class (VERDICT r4 weak #7 — silent fallbacks
cost 10-40x and must be visible/assertable)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytrace_tpu as rt
from raytrace_tpu.utils.engines import engine_report
from raytrace_tpu.utils.profiling import RenderStats


def _cornell_like():
    """Small dense scene: constant/checker textures, <= 16 behaviors."""
    world = rt.group([
        rt.with_material(rt.lambertian(rt.constant_texture([0.7, 0.2, 0.2])),
                         rt.sphere([0, 0, -3], 1.0)),
        rt.with_material(rt.light_source(rt.constant_texture(4.0)),
                         rt.parallelogram([-1, 2, -4], [2, 0, 0],
                                          [0, 0, 2])),
    ])
    return rt.compile_scene(world)


def _mesh_scene(n=300):
    """Triangle soup big enough for cluster machinery, <= 8192 rows."""
    rs = np.random.RandomState(0)
    p0 = rs.uniform(-1, 1, (n, 3))
    tris = [rt.triangle(p, p + [0.1, 0, 0], p + [0, 0.1, 0]) for p in p0]
    world = rt.with_material(
        rt.lambertian(rt.constant_texture(0.5)), rt.group(tris))
    return rt.compile_scene(world, accel="dense")


def _fog_scene():
    world = rt.group([
        rt.with_material(rt.light_source(rt.constant_texture(4.0)),
                         rt.parallelogram([-2, -2, -4], [4, 0, 0],
                                          [0, 4, 0])),
        rt.with_material(rt.isotropic(rt.constant_texture(0.3)),
                         rt.constant_medium(0.8, rt.sphere([0, 0, -2], 1.0))),
    ])
    return rt.compile_scene(world)


_CAM = rt.CameraSettings(image_width=256, samples_per_pixel=4, max_depth=4,
                         background=rt.const_background(0.5))


def test_cornell_class_engines():
    scene = _cornell_like()
    rep = engine_report(scene, _CAM, interpret=True)
    assert rep["driver"] == "stationary"
    assert rep["forward"] == "fused-iter-megakernel"
    assert rep["intersect"] == "in-kernel"
    assert rep["backward"] is None and rep["volumes"] is None
    # diff path: small table -> pre-gathered regen backward kernel
    rep_d = engine_report(scene, _CAM, diff=True, interpret=True)
    assert rep_d["driver"] == "diff-wavefront"
    assert rep_d["forward"] == "fused-iter-megakernel"
    assert rep_d["backward"] == "fused-regen-pre"


def test_mesh_class_engines():
    scene = _mesh_scene()
    rep = engine_report(scene, _CAM, interpret=True)
    # 300 rows: below SORT_MIN_PRIMS -> stationary; megakernel serves
    assert rep["driver"] == "stationary"
    assert rep["forward"] == "fused-iter-megakernel"
    # diff path at >64 prims (round 5): the fused driver + the
    # pre-gathered regen backward serve mesh scale too
    rep_d = engine_report(scene, _CAM, diff=True, interpret=True)
    assert rep_d["backward"] == "fused-regen-pre"
    assert rep_d["forward"] == "fused-iter-megakernel"


def test_mesh_class_engines_kernel_env(monkeypatch):
    monkeypatch.setenv("RT_FUSED_BWD_KERNEL", "1")
    scene = _mesh_scene()
    rep_d = engine_report(scene, _CAM, diff=True, interpret=True)
    assert rep_d["backward"] == "fused-regen-kernel"


def test_fog_class_engines():
    scene = _fog_scene()
    rep = engine_report(scene, _CAM, interpret=True)
    # volumes make the scene megakernel-ineligible
    assert rep["forward"] in ("fused-shade", "xla-split")
    assert rep["volumes"] in ("pallas", "pallas-broadcast")
    rep_d = engine_report(scene, _CAM, diff=True, interpret=True)
    assert rep_d["volumes"] == "xla-scan"
    assert rep_d["backward"] == "generic-xla-replay"


def test_queue_driver_small_images():
    scene = _cornell_like()
    s = _CAM.replace(image_width=64)     # 4096 px < stationary minimum
    rep = engine_report(scene, s, interpret=True)
    assert rep["driver"] == "queue"


def test_engines_ride_render_stats():
    scene = _cornell_like()
    st = RenderStats()
    rep = st.record_engines(scene, _CAM, interpret=True)
    st.add_launch(dict(segments=10, iterations=1, lanes=128), 4, 0.1)
    rec = st.record()
    assert rec["engines"] == rep
    assert rec["engines"]["forward"] == "fused-iter-megakernel"


def test_report_tracks_no_fused_env(monkeypatch):
    monkeypatch.setenv("RT_NO_FUSED_ITER", "1")
    scene = _cornell_like()
    rep = engine_report(scene, _CAM, interpret=True)
    assert rep["forward"] == "bounce-megakernel"


def test_forward_cap_splits_forward_and_diff_engines():
    """Round 5: forward drivers cap the megakernel at MEGA_MAX_PRIMS_FWD
    (the split path wins at mesh scale — bunny 2.75 vs 9.92 s) while the
    diff driver keeps the megakernel up to MEGA_MAX_PRIMS."""
    scene = _mesh_scene(n=700)           # > 512 rows after padding
    assert scene.prims.kind.shape[0] > 512
    rep_f = engine_report(scene, _CAM, interpret=True)
    assert rep_f["forward"] in ("fused-shade", "xla-split")
    assert rep_f["intersect"] in ("allpairs-dynamic", "pallas-clustered")
    rep_d = engine_report(scene, _CAM, diff=True, interpret=True)
    assert rep_d["forward"] == "fused-iter-megakernel"
    assert rep_d["backward"] == "fused-regen-pre"
    # >512 rows: the fused kernel's intersect stage is the in-kernel
    # broadcast all-pairs sweep (RT_ITER_AP_MIN default)
    assert rep_d["intersect"] == "in-kernel-allpairs"
