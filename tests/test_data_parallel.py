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
