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

    # ---- eval-counter sync across processes (the reference's
    # SmoothedValue.synchronize_between_processes / all_reduce analogue,
    # dist_utils.py:35-46): summed counters over a process-spanning batch
    # come back replicated, so every process reads the GLOBAL accuracy
    eval_step = jax.jit(S.make_eval_step(model))
    counters = jax.device_get(eval_step(
        {"params": state.params}, None, g_images, g_labels))
    acc1 = 100.0 * float(counters["top1"]) / float(counters["count"])
    assert int(counters["count"]) == GLOBAL_BATCH, counters["count"]
    print(f"WORKER_EVAL {acc1:.10f}", flush=True)

    # ---- stage-5 ('div','data') with the DIV axis SPANNING the processes
    # (the ImageNet-1K 8-division pod config maps div across hosts,
    # docs/OPERATIONS.md): one ensemble train step, loss replicated
    from devit_tpu.models.ensemble import (
        EnsMLP, init_multivit, stack_division_gates,
    )
    from devit_tpu.models.vit import full_gates
    from devit_tpu.parallel import mesh as M

    num_div = 2
    ens_mesh = Mesh(np.asarray(jax.devices()).reshape(num_div, -1),
                    (M.DIV_AXIS, M.DATA_AXIS))
    teacher = VisionTransformer(
        get_vit_config("deit_base_distilled_patch16_224", img_size=16,
                       patch_size=8, embed_dim=64, depth=2, num_heads=4,
                       num_classes=5 * num_div, drop_path_rate=0.0),
        dtype=jnp.float32)
    ens = EnsMLP(num_classes=5 * num_div, sub_size=32, num_divisions=num_div,
                 teacher_size=64, family="deit", dtype=jnp.float32)
    xz = jnp.zeros((2, 16, 16, 3), jnp.float32)
    stacked = init_multivit(model, jax.random.key(2), xz, num_div)
    t_vars = teacher.init(jax.random.key(3), xz, distill_token=True)
    cls_t = jnp.zeros((num_div, 2, 32))
    ens_vars = ens.init(jax.random.key(4), cls_t, cls_t, distill=True,
                        train=True)
    bb_state = M.shard_division_tree(
        TrainState.create(stacked["params"], optax.adamw(1e-3)),
        ens_mesh, num_div)
    ens_state = M.replicate_tree(
        TrainState.create(ens_vars["params"], optax.adamw(1e-3)), ens_mesh)
    t_sh = M.replicate_tree(t_vars, ens_mesh)
    gates_sh = M.shard_division_tree(
        stack_division_gates([full_gates(model.cfg)] * num_div),
        ens_mesh, num_div)
    eimg = jax.device_put(jnp.asarray(images), M.batch_sharding(ens_mesh))
    elab = jax.device_put(jnp.asarray(labels, jnp.int32) % (5 * num_div),
                          M.batch_sharding(ens_mesh))
    ens_step = jax.jit(S.make_ensemble_train_step(
        model, ens, teacher, distillation_type="hard"))
    _, _, em = ens_step(bb_state, ens_state, t_sh, gates_sh, eimg, elab,
                        jax.random.key(5))
    print(f"WORKER_ENS {float(jax.device_get(em['loss'])):.10f}", flush=True)


if __name__ == "__main__":
    main()
