"""Worker for the REAL two-process rendezvous test (round-4 VERDICT #2;
tests/test_runtime.py::test_real_two_process_rendezvous). NOT a pytest file.

Usage: python tests/multihost_worker.py <num_processes> <process_id> <port>

Runs setup_runtime() with the DEVIT_COORDINATOR env rendezvous (the analogue
of the reference's RANK/WORLD_SIZE torch.distributed init, utils/
dist_utils.py:215-237), asserts the mesh spans both processes, runs ONE real
data-parallel stage-2 train step on a process-spanning ('data',) mesh, and
prints the loss — the parent test compares it against the single-process run
of this same script.
"""

import os
import sys

# python puts the SCRIPT's dir (tests/) on sys.path, not the repo root;
# PYTHONPATH is off-limits (breaks axon PJRT plugin discovery, CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GLOBAL_DEVICES = 4
GLOBAL_BATCH = 8


def main() -> None:
    nproc, pid, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    per_proc = GLOBAL_DEVICES // nproc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={per_proc}")
    if nproc > 1:
        os.environ["DEVIT_COORDINATOR"] = f"localhost:{port}"
        os.environ["DEVIT_NUM_PROCESSES"] = str(nproc)
        os.environ["DEVIT_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from devit_tpu.runtime import setup_runtime

    setup_runtime()
    assert jax.process_count() == nproc, jax.process_count()
    # the device view spans BOTH processes after rendezvous
    assert jax.device_count() == GLOBAL_DEVICES, jax.device_count()
    assert jax.local_device_count() == per_proc

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import optax

    from devit_tpu.configs import get_vit_config
    from devit_tpu.models.vit import VisionTransformer
    from devit_tpu.train import steps as S
    from devit_tpu.train.state import TrainState

    cfg = get_vit_config("dedeit", img_size=16, patch_size=8, embed_dim=32,
                         depth=2, num_heads=4, num_classes=5,
                         drop_path_rate=0.0)
    model = VisionTransformer(cfg, dtype=jnp.float32)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 16, 16, 3), jnp.float32))["params"]
    state = TrainState.create(params, optax.adamw(1e-3))

    rng = np.random.default_rng(0)
    images = rng.normal(size=(GLOBAL_BATCH, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 5, size=(GLOBAL_BATCH,))

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())
    # each process contributes its host-local rows of the global batch
    lo = pid * (GLOBAL_BATCH // nproc)
    hi = lo + GLOBAL_BATCH // nproc
    g_images = jax.make_array_from_process_local_data(batch_sh, images[lo:hi])
    g_labels = jax.make_array_from_process_local_data(batch_sh, labels[lo:hi])
    state = jax.device_put(state, repl_sh)

    step = jax.jit(S.make_stage2_step(model, None, mixup=None, smoothing=0.0,
                                      distillation_type="none"))
    state, metrics = step(state, None, g_images, g_labels, jax.random.key(1))
    loss = float(jax.device_get(metrics["loss"]))
    print(f"WORKER_LOSS {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
