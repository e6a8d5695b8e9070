"""Data-parallel training on the 8-device virtual mesh: the DDP replacement
(SURVEY.md §2.7 row 1) — batch sharded over ('data',), params replicated,
gradient reduction implicit in SPMD."""

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.configs import get_vit_config
from devit_tpu.models.vit import VisionTransformer
from devit_tpu.parallel import mesh as M
from devit_tpu.train import steps as S
from devit_tpu.train.optim import OptimConfig, make_optimizer
from devit_tpu.train.state import TrainState


def test_stage2_step_data_parallel_matches_single_device():
    model = VisionTransformer(
        get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=32,
                       depth=2, num_heads=2, num_classes=5),
        dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.key(0), (16, 32, 32, 3))
    labels = jnp.arange(16) % 5
    params = model.init(jax.random.key(1), x)["params"]
    tx = make_optimizer(OptimConfig(lr=1e-3, epochs=1, warmup_epochs=0,
                                    cooldown_epochs=0), 10)
    step = jax.jit(S.make_stage2_step(model, smoothing=0.0))

    # single device
    s1 = TrainState.create(params, tx)
    s1_out, m1 = step(s1, None, x, labels, jax.random.key(2))

    # 8-way data parallel: shard batch, replicate state
    mesh = M.data_mesh()
    assert len(jax.devices()) == 8
    s2 = M.replicate_tree(TrainState.create(params, tx), mesh)
    x_sh = jax.device_put(x, M.batch_sharding(mesh))
    y_sh = jax.device_put(labels, M.batch_sharding(mesh))
    s2_out, m2 = step(s2, None, x_sh, y_sh, jax.random.key(2))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1_out.params, s2_out.params
    )
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5


def test_pod_layout_eight_divisions():
    """The ImageNet-scale config (BASELINE.md row 5) maps 8 divisions across
    the slice: ensemble_mesh(8) on 8 devices -> {'div': 8, 'data': 1}; with
    fewer devices than divisions it degrades to a pure data mesh."""
    m8 = M.ensemble_mesh(8)
    assert dict(m8.shape) == {"div": 8, "data": 1}
    m_fallback = M.ensemble_mesh(16)  # 16 divisions > 8 devices
    assert dict(m_fallback.shape) == {"div": 1, "data": 8}


def test_eight_division_ensemble_step_executes_on_div8_mesh():
    """BASELINE config row 5 topology executed, not just shaped: a tiny
    8-division ensemble training step jitted over {'div': 8, 'data': 1} —
    every division on its own device, EnsMLP replicated, token fusion over
    the mesh."""
    from devit_tpu.models.ensemble import (
        EnsMLP, init_multivit, stack_division_gates,
    )
    from devit_tpu.models.vit import full_gates

    D = 8
    model = VisionTransformer(
        get_vit_config("dedeit", img_size=16, patch_size=8, embed_dim=32,
                       depth=2, num_heads=2, num_classes=3),
        dtype=jnp.float32,
    )
    ens = EnsMLP(num_classes=3 * D, sub_size=32, num_divisions=D,
                 teacher_size=64, family="deit", dtype=jnp.float32)
    x = jnp.zeros((4, 16, 16, 3), jnp.float32)
    stacked = init_multivit(model, jax.random.key(0), x, D)
    cls_t = jnp.zeros((D, 4, 32))
    ens_vars = ens.init(jax.random.key(1), cls_t, cls_t, distill=True, train=True)
    tx = make_optimizer(OptimConfig(lr=1e-3, epochs=1, warmup_epochs=0,
                                    cooldown_epochs=0), 1)
    bb_state = TrainState.create(stacked["params"], tx)
    ens_state = TrainState.create(ens_vars["params"], tx)
    gates = stack_division_gates([full_gates(model.cfg)] * D)

    mesh = M.ensemble_mesh(D)
    assert dict(mesh.shape) == {"div": 8, "data": 1}
    bb_state = M.shard_division_tree(bb_state, mesh, D)
    ens_state = M.replicate_tree(ens_state, mesh)
    gates = M.shard_division_tree(gates, mesh, D)
    images = jax.device_put(
        jax.random.normal(jax.random.key(2), (4, 16, 16, 3), jnp.float32),
        M.batch_sharding(mesh))
    labels = jax.device_put(jnp.zeros((4,), jnp.int32), M.batch_sharding(mesh))

    step = jax.jit(S.make_ensemble_train_step(model, ens, None,
                                              distillation_type="none"))
    bb2, ens2, metrics = step(bb_state, ens_state, None, gates, images, labels,
                              jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    # the stacked backbone params really live division-per-device
    leaf = jax.tree_util.tree_leaves(bb2.params)[0]
    assert len(leaf.sharding.device_set) == 8
