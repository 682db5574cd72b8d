"""Marble texture Pallas kernel (ops/pallas/texture_kernel.py) vs the XLA
branchless form (textures.py TEX_MARBLE branch; Texture.hs:72-79)."""
import numpy as np
import jax.numpy as jnp

from raytrace_tpu.textures.textures import (
    TEX_MARBLE, compile_textures, constant_texture, eval_texture,
    marble_texture,
)
from raytrace_tpu.ops.pallas.texture_kernel import (
    marble_eligible, marble_stripe_pallas,
)


def _table():
    return compile_textures([
        constant_texture([1.0, 0.2, 0.3]),
        marble_texture([0.0, 0.0, 1.0], 4.0),
        marble_texture([1.0, 2.0, 0.0], 2.0, shift=(0.3, 0.1, 0.9)),
    ])


def test_marble_rows_static():
    table = _table()
    assert table.marble_rows == (1, 2)
    assert marble_eligible(table, jnp.zeros((256, 3)))
    assert not marble_eligible(table, jnp.zeros((100, 3)))


def test_marble_kernel_matches_xla():
    """NOTE: interpret=True only — the Mosaic-specific lowering choices
    (uint32->int32 casts in _hash_gradient, f32 SMEM scalar reads, the
    any()+cond block skip) are exercised on real hardware by
    tools/profile_demo2.py and every TPU demo2/noise_test render; CI is
    CPU-only by design."""
    table = _table()
    r = 256
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-3, 3, (r, 3)), jnp.float32)
    uvs = jnp.asarray(rng.uniform(0, 1, (r, 2)), jnp.float32)
    tid = jnp.asarray(rng.integers(0, 3, r), jnp.int32)

    ref = np.asarray(eval_texture(table, tid, pts, uvs))
    stripe = np.asarray(marble_stripe_pallas(table, tid, pts,
                                             interpret=True))
    is_marble = np.asarray(table.kind)[np.asarray(tid)] == TEX_MARBLE
    assert is_marble.any() and (~is_marble).any()
    np.testing.assert_allclose(stripe[is_marble], ref[is_marble, 0],
                               rtol=1e-5, atol=1e-5)
    # non-marble lanes come back exactly zero (skipped or masked)
    assert np.all(stripe[~is_marble] == 0.0)


def test_marble_kernel_all_skipped_block():
    # a block where no lane samples marble must return zeros (cond skip)
    table = _table()
    r = 128
    pts = jnp.asarray(np.linspace(-2, 2, 3 * r).reshape(r, 3), jnp.float32)
    tid = jnp.zeros((r,), jnp.int32)            # all constant texture
    stripe = np.asarray(marble_stripe_pallas(table, tid, pts,
                                             interpret=True))
    assert np.all(stripe == 0.0)
