"""Test config: run everything on an 8-device virtual CPU mesh so multi-chip
sharding is exercised without TPU hardware (SURVEY.md §4).

Note: this environment presets jax_platforms='axon,cpu' (site config), which
overrides the JAX_PLATFORMS env var — jax.config.update is required.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
