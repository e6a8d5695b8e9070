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


def test_load_flax_npz_vit(tmp_path):
    """Google-Brain Flax .npz ViT ingestion (reference de_vit.py:372-449):
    synthesize a checkpoint in that layout at toy geometry, load, verify key
    mapping and a working forward."""
    import jax
    import jax.numpy as jnp

    from devit_tpu.configs import get_vit_config
    from devit_tpu.io.checkpoint import load_flax_npz_vit
    from devit_tpu.models.vit import VisionTransformer

    rng = np.random.default_rng(0)
    p, C, D, H, dh, depth, K = 8, 3, 32, 4, 8, 2, 5
    n_tokens = 1 + (32 // p) ** 2

    w = {}
    w["embedding/kernel"] = rng.normal(size=(p, p, C, D)).astype(np.float32)
    w["embedding/bias"] = rng.normal(size=(D,)).astype(np.float32)
    w["cls"] = rng.normal(size=(1, 1, D)).astype(np.float32)
    w["Transformer/posembed_input/pos_embedding"] = rng.normal(
        size=(1, n_tokens, D)).astype(np.float32)
    w["Transformer/encoder_norm/scale"] = np.ones(D, np.float32)
    w["Transformer/encoder_norm/bias"] = np.zeros(D, np.float32)
    for i in range(depth):
        bp = f"Transformer/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_1/"
        for n in ("query", "key", "value"):
            w[f"{mha}{n}/kernel"] = rng.normal(size=(D, H, dh)).astype(np.float32) * 0.05
            w[f"{mha}{n}/bias"] = np.zeros((H, dh), np.float32)
        w[f"{mha}out/kernel"] = rng.normal(size=(H, dh, D)).astype(np.float32) * 0.05
        w[f"{mha}out/bias"] = np.zeros(D, np.float32)
        for ln_name in ("LayerNorm_0", "LayerNorm_2"):
            w[f"{bp}{ln_name}/scale"] = np.ones(D, np.float32)
            w[f"{bp}{ln_name}/bias"] = np.zeros(D, np.float32)
        w[f"{bp}MlpBlock_3/Dense_0/kernel"] = rng.normal(size=(D, 4 * D)).astype(np.float32) * 0.05
        w[f"{bp}MlpBlock_3/Dense_0/bias"] = np.zeros(4 * D, np.float32)
        w[f"{bp}MlpBlock_3/Dense_1/kernel"] = rng.normal(size=(4 * D, D)).astype(np.float32) * 0.05
        w[f"{bp}MlpBlock_3/Dense_1/bias"] = np.zeros(D, np.float32)
    w["head/kernel"] = rng.normal(size=(D, K)).astype(np.float32) * 0.05
    w["head/bias"] = np.zeros(K, np.float32)

    path = str(tmp_path / "vit.npz")
    np.savez(path, **w)
    params = load_flax_npz_vit(path, depth=depth)

    # qkv concat is [q|k|v], head-major within each third
    q_flat = w["Transformer/encoderblock_0/MultiHeadDotProductAttention_1/query/kernel"].reshape(D, -1)
    np.testing.assert_array_equal(params["blocks"]["qkv"]["kernel"][0][:, :H * dh], q_flat)
    assert params["patch_embed"]["kernel"].shape == (p * p * C, D)

    cfg = get_vit_config("vit_base_patch16_224", img_size=32, patch_size=p,
                         embed_dim=D, depth=depth, num_heads=H, num_classes=K)
    model = VisionTransformer(cfg, dtype=jnp.float32)
    out = model.apply({"params": params}, jnp.zeros((2, 32, 32, 3)))
    assert out.logits.shape == (2, K)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_convert_cli_roundtrips(tmp_path):
    """`devit convert`: .pth -> .msgpack -> .pth roundtrip is exact (geometry
    inferred from the file, no model flags), --ema exports ema_params, and
    msgpack -> orbax preserves the full tree."""
    from devit_tpu.cli.__main__ import build_parser
    from devit_tpu.io.checkpoint import restore_pytree, save_pytree

    def run(argv):
        args = build_parser().parse_args(argv)
        return args.fn(args)

    tm = TorchViT(img=32, patch=8, dim=64, depth=3, heads=4, classes=10).eval()
    sd = tm.flat_state_dict()
    src = str(tmp_path / "ref.pth")
    torch.save({"model": {k: torch.tensor(v) for k, v in sd.items()}}, src)

    mp = str(tmp_path / "ours.msgpack")
    run(["convert", src, mp])
    tree = restore_pytree(mp, None)
    assert tree["params"]["blocks"]["qkv"]["kernel"].shape[0] == 3  # depth inferred
    np.testing.assert_allclose(
        np.asarray(tree["params"]["blocks"]["qkv"]["kernel"][1]),
        sd["blocks.1.attn.qkv.weight"].T, rtol=1e-6)

    back = str(tmp_path / "back.pth")
    run(["convert", mp, back])
    sd2 = torch.load(back, map_location="cpu", weights_only=False)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_allclose(np.asarray(sd2[k]), sd[k], rtol=1e-6,
                                   err_msg=k)

    # --ema: a checkpoint with distinct ema_params exports the EMA tree
    ema = jax.tree_util.tree_map(lambda x: np.asarray(x) + 1.0, tree["params"])
    full = str(tmp_path / "full.msgpack")
    save_pytree(full, {"params": tree["params"], "ema_params": ema,
                       "epoch": np.int32(4)})
    ema_pth = str(tmp_path / "ema.pth")
    run(["convert", full, ema_pth, "--ema"])
    sd3 = torch.load(ema_pth, map_location="cpu", weights_only=False)
    np.testing.assert_allclose(
        np.asarray(sd3["blocks.0.attn.qkv.weight"]),
        sd["blocks.0.attn.qkv.weight"] + 1.0, rtol=1e-6)

    # msgpack -> orbax keeps the whole tree (epoch included)
    ob = str(tmp_path / "conv.orbax")
    run(["convert", full, ob])
    tree2 = restore_pytree(ob, None)
    assert int(tree2["epoch"]) == 4 and "ema_params" in tree2
