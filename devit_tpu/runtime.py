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
    _maybe_init_multihost()
    cache_dir = cache_dir or os.environ.get(
        "DEVIT_COMPILE_CACHE", os.path.expanduser("~/.cache/devit_tpu_xla")
    )
    try:
        # NEVER on the CPU backend: XLA:CPU persists machine-feature-specific
        # AOT code and is strict (and unsafe) reading it back — a cache entry
        # written under slightly different host-feature detection SEGFAULTS
        # the reading process inside compilation_cache.get_executable_and_time
        # (observed on this host; the cpu_aot_loader logs the feature mismatch
        # as "could lead to execution errors such as SIGILL"). On TPU the
        # cache is safe and saves 30-300 s tunnel compiles per program.
        if jax.default_backend() != "cpu":
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it


def is_main_process() -> bool:
    """TPU-native `dist_utils.is_main_process()` (reference
    dist_utils.py:206-212): process 0 of the jax.distributed job; always True
    single-process. Gates file artifacts (JSONL stats, result.txt,
    TensorBoard, msgpack checkpoints) so a multi-host run doesn't have every
    host race-writing identical files — the analogue of `save_on_master`.
    Orbax checkpointing is deliberately NOT gated: its distributed save is a
    collective where every process writes its own addressable shards."""
    return jax.process_index() == 0


def _maybe_init_multihost() -> None:
    """Multi-host rendezvous — the TPU-native replacement for the reference's
    env-var/SLURM NCCL process-group setup (utils/dist_utils.py:215-237).

    Gated on env so single-host runs never try to rendezvous:
    - DEVIT_MULTIHOST=1 -> jax.distributed.initialize() with auto-detection
      (Cloud TPU pod metadata / SLURM env, jax's built-in discovery).
    - DEVIT_COORDINATOR=<host:port> (+ DEVIT_NUM_PROCESSES, DEVIT_PROCESS_ID)
      -> explicit rendezvous, mirroring the reference's RANK/WORLD_SIZE path.

    After initialize(), jax.devices() spans all processes, so data_mesh() /
    ensemble_mesh() (parallel/mesh.py) become pod-wide with no further code:
    e.g. the ImageNet-1K 8-division config maps div=8 across hosts with the
    data axis inside each slice — divisions ride ICI, only the EnsMLP token
    all-gather may cross DCN if divisions span slices.

    Cannot be hardware-tested here (single chip via tunnel); the code path is
    exercised by tests/test_runtime.py via a mocked jax.distributed.
    """
    coord = os.environ.get("DEVIT_COORDINATOR")
    if os.environ.get("DEVIT_MULTIHOST") != "1" and not coord:
        return
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
        if "DEVIT_NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["DEVIT_NUM_PROCESSES"])
        if "DEVIT_PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["DEVIT_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
