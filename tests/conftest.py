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
