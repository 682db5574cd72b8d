"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware (SURVEY.md §4 implication (c)).

Note: this environment's sitecustomize sets ``jax_platforms="axon,cpu"``
*programmatically*, overriding the JAX_PLATFORMS env var — so the config
must be updated after importing jax, before any backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The full suite compiles hundreds of XLA CPU programs; letting them
    accumulate segfaults the compiler deterministically around test
    ~150 (reproduced twice at test_sharding.py:50 — any half of the
    suite plus that test passes, the whole suite does not).  Per-module
    compilation state is self-contained, so clearing costs only a few
    re-traces."""
    yield
    jax.clear_caches()
