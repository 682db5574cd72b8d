"""Checkpoint/resume + profiling-counter tests."""
import os

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu.utils.checkpoint import (
    load_checkpoint, render_resumable, save_checkpoint,
)
from raytrace_tpu.utils.profiling import RenderStats


def _scene():
    return rt.compile_scene(rt.with_material(
        rt.lambertian(rt.constant_texture(0.5)), rt.sphere([0, 0, -3], 1.0)))


SETTINGS = rt.CameraSettings(image_width=16, samples_per_pixel=4,
                             max_depth=4, background=rt.sky)


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    acc = jnp.arange(12.0).reshape(4, 3)
    save_checkpoint(path, acc, 7)
    acc2, done = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(acc2))
    assert done == 7


def test_render_resumable_matches_direct(tmp_path):
    scene = _scene()
    path = str(tmp_path / "r.npz")
    img = render_resumable(scene, SETTINGS, path, seed=3,
                           spp_per_checkpoint=2)
    direct = rt.render(scene, SETTINGS, seed=3)
    np.testing.assert_allclose(img, direct, atol=1e-4, rtol=1e-4)
    # resume from a partial checkpoint: delete nothing, render again ->
    # instant (already complete) and identical
    img2 = render_resumable(scene, SETTINGS, path, seed=3)
    np.testing.assert_allclose(img2, img, atol=1e-6)


def test_render_resumable_partial_resume(tmp_path):
    scene = _scene()
    path = str(tmp_path / "p.npz")
    from raytrace_tpu.render.render import render_accumulate
    acc, done = render_accumulate(scene, SETTINGS, 3, spp=2)
    save_checkpoint(path, acc, done)
    img = render_resumable(scene, SETTINGS, path, seed=3)  # finishes 2 more
    direct = rt.render(scene, SETTINGS, seed=3)
    np.testing.assert_allclose(img, direct, atol=1e-4, rtol=1e-4)


def test_render_stats():
    st = RenderStats()
    st.add_launch(dict(segments=1000, iterations=10, lanes=200), 300, 0.5)
    st.add_launch(dict(segments=500, iterations=5, lanes=200), 100, 0.5)
    assert st.primary_rays == 400
    assert st.path_segments == 1500
    assert np.isclose(st.occupancy, 1500 / 3000)
    assert np.isclose(st.mean_path_length, 3.75)
    rec = st.record()
    assert rec["primary_rays_per_s"] == 400.0
