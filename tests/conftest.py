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
# The persistent compilation cache is UNSAFE on XLA:CPU on this host: reading
# back an entry written under different machine-feature detection segfaults
# (observed: SIGSEGV in compilation_cache.get_executable_and_time mid-suite).
# runtime.setup_runtime gates it off CPU too; this covers direct jax use.
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _free_compiled_executables():
    """Release compiled executables after every test module. Each LIVE
    XLA:CPU executable pins ~3+ memory mappings (more for big scanned
    programs); across the full 310-test suite the process crosses
    vm.max_map_count (default 65530) near test ~300 and SEGFAULTS inside
    backend_compile_and_load — measured: ~16k maps at 20% of the suite,
    monotonically growing; three runs crashed at tests ~260-302. Clearing
    jit caches drops the references so the mappings unmap; cross-module
    recompiles are cheap (modules rarely share programs)."""
    yield
    jax.clear_caches()
