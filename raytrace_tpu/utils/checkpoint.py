"""Progressive-render checkpoint / resume.

The reference's only persistence is the final PNG (SURVEY.md §5).  Here a
render is an accumulation of per-pixel radiance sums plus a sample count
(render/render.py:render_accumulate), so checkpointing that pair gives
byte-exact resume — the failure-recovery story for long renders.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_checkpoint(path: str, acc, spp_done: int, *, meta: dict | None = None):
    """Write the (radiance-sum, samples-done) accumulator to ``path``
    (.npz)."""
    np.savez(path, acc=np.asarray(acc), spp_done=int(spp_done),
             **({f"meta_{k}": v for k, v in (meta or {}).items()}))


def load_checkpoint(path: str):
    """Read ``(acc, spp_done)`` back (jnp array + int)."""
    data = np.load(path)
    return jnp.asarray(data["acc"]), int(data["spp_done"])


def render_resumable(scene, settings, path: str, seed: int = 0, *,
                     spp: int | None = None, spp_per_checkpoint: int = 16,
                     **render_kwargs):
    """Render with periodic checkpoints at ``path``; resumes automatically
    if the checkpoint exists.  Returns the final image [H, W, 3]."""
    import os

    from ..render.render import render_accumulate

    spp = spp if spp is not None else settings.samples_per_pixel
    acc, done = (load_checkpoint(path) if os.path.exists(path)
                 else (None, 0))
    while done < spp:
        n = min(spp_per_checkpoint, spp - done)
        acc, done = render_accumulate(scene, settings, seed, spp=n,
                                      acc=acc, spp_done=done,
                                      **render_kwargs)
        save_checkpoint(path, acc, done)
    h, w = settings.image_height, settings.image_width
    return np.asarray(acc / done).reshape(h, w, 3)
