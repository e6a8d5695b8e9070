"""Runtime setup shared by CLI / bench / entry points."""

from __future__ import annotations

import os

import jax

_DONE = False


def setup_runtime(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (compiles over the tunnel cost
    30-300 s; caching makes repeat CLI/bench invocations start fast) and other
    process-wide settings. Idempotent."""
    global _DONE
    if _DONE:
        return
    _DONE = True
    cache_dir = cache_dir or os.environ.get(
        "DEVIT_COMPILE_CACHE", os.path.expanduser("~/.cache/devit_tpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
