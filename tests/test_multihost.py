"""REAL multi-process jax.distributed test (SURVEY.md §4 implication (c)).

Launches 2 separate Python processes (2 virtual CPU devices each) that
join one ``jax.distributed`` job via the coordinator handshake, build a
4-device global mesh, render their pixel shards with the shard_map
wavefront, and assemble the image with ``process_allgather`` — the full
multi-host code path of parallel/multihost.py, not the single-process
simulation.  The assembled image must equal the single-process render
bit-for-bit-ish (RNG is keyed on absolute (pixel, sample) ids).
"""
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_render_matches():
    port = _free_port()
    out = os.path.join(tempfile.mkdtemp(), "mh.npy")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--pid", str(pid), "--nproc", "2",
             "--port", str(port)] + (["--out", out] if pid == 0 else []),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{o[-2000:]}"
    img = np.load(out)

    # single-process reference (this test process: 8 virtual devices,
    # but the RNG depends only on absolute ids, not the device layout)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import multihost_worker as mw
    from raytrace_tpu.render.integrator import trace_wavefront_stationary
    from raytrace_tpu.core import rng

    scene, settings = mw.build()
    n_pix = settings.image_width * settings.image_height
    single = np.asarray(trace_wavefront_stationary(
        scene, settings, rng.base_key(3), n_pix,
        settings.samples_per_pixel)) / settings.samples_per_pixel
    single = single.reshape(settings.image_height, settings.image_width, 3)
    np.testing.assert_allclose(img, single, atol=2e-5, rtol=1e-5)
