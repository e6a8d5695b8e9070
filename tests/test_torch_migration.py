"""Reference-checkpoint migration: a torch .pth from the reference pipeline
(including ensemble checkpoints whose heads were deleted, ensemble.py:28-30)
loads by name into our models via the CLI loader."""

import numpy as np
import pytest
import torch

from devit_tpu.cli import common as C
from devit_tpu.configs import get_vit_config
from devit_tpu.models.vit import VisionTransformer
from tests.test_checkpoint_parity import TorchViT

import jax
import jax.numpy as jnp


def test_load_pth_with_deleted_heads_and_resized_posembed(tmp_path):
    tm = TorchViT(img=32, patch=8, dim=64, depth=3, heads=4, classes=10).eval()
    sd = tm.flat_state_dict()
    # simulate the reference ensemble checkpoints: heads deleted
    sd = {k: v for k, v in sd.items() if not k.startswith(("head.", "head_dist."))}
    path = str(tmp_path / "checkpoint.pth")
    torch.save({"model": {k: torch.tensor(v) for k, v in sd.items()}}, path)

    class A:  # minimal args namespace for build_model
        input_size = 32
        patch_size = 8
        drop = 0.0
        drop_path = 0.0
        embed_dim = 64
        depth = 3
        num_heads = 4
        use_pallas = False

    model = C.build_model("dedeit", 7, A())  # NEW head size (7 classes)
    tpl = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    params = C.load_params_for(model, path, tpl)

    # backbone weights match the torch checkpoint; heads fall back to init
    np.testing.assert_allclose(
        np.asarray(params["blocks"]["qkv"]["kernel"][0]),
        sd["blocks.0.attn.qkv.weight"].T, rtol=1e-6,
    )
    assert params["head"]["kernel"].shape == (64, 7)

    # forward works end to end with the migrated weights
    out = model.apply({"params": params}, jnp.zeros((2, 32, 32, 3)))
    assert out.logits.shape == (2, 7)


def test_load_pth_resizes_pos_embed(tmp_path):
    tm = TorchViT(img=32, patch=8, dim=64, depth=3, heads=4, classes=10).eval()
    sd = tm.flat_state_dict()  # pos_embed for 4x4 grid + 2 tokens
    path = str(tmp_path / "ckpt.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

    class A:
        input_size = 64  # 8x8 grid now -> pos embed must interpolate
        patch_size = 8
        drop = 0.0
        drop_path = 0.0
        embed_dim = 64
        depth = 3
        num_heads = 4
        use_pallas = False

    model = C.build_model("dedeit", 10, A())
    tpl = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
    params = C.load_params_for(model, path, tpl)
    assert params["pos_embed"].shape == (1, 2 + 64, 64)
    out = model.apply({"params": params}, jnp.zeros((2, 64, 64, 3)))
    assert out.logits.shape == (2, 10)
