"""CCT backbone tests: tokenizer geometry, forward surface, ensemble path,
and torch parity of the conv tokenizer + encoder layer."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from devit_tpu.configs import get_cct_config
from devit_tpu.models.cct import CCT, Tokenizer, create_cct, sinusoidal_embedding
from devit_tpu.models.ensemble import EnsembleCCT, multicct_features
from devit_tpu.models.vit import Gates


def test_config_names_and_seq_len():
    cfg = get_cct_config("cct_7_3x1_32")
    assert cfg.kernel_size == 3 and cfg.n_conv_layers == 1 and cfg.img_size == 32
    assert cfg.num_layers == 7 and cfg.embed_dim == 256
    # closed-form sequence length must match an actual tokenizer forward
    model = Tokenizer(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape[1] == cfg.sequence_length()

    cfg2 = get_cct_config("cct_7_7x2_224")
    model2 = Tokenizer(cfg2, dtype=jnp.float32)
    x2 = jnp.zeros((1, 224, 224, 3))
    params2 = model2.init(jax.random.key(0), x2)
    assert model2.apply(params2, x2).shape[1] == cfg2.sequence_length()


def test_cct_forward_and_captures():
    model = create_cct("cct_2_3x1_32", num_classes=10, dtype=jnp.float32,
                       stochastic_depth=0.0, attention_dropout=0.0)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, capture_qkv="middle", capture_outputs=True)
    out = model.apply(variables, x, capture_qkv="middle", capture_outputs=True)
    cfg = model.cfg
    N = cfg.sequence_length()
    assert out.logits.shape == (2, 10)
    assert out.pooled.shape == (2, cfg.embed_dim)
    assert out.attn.shape == (cfg.num_layers, 2, N, cfg.embed_dim)
    assert out.qkv.shape == (3, 2, cfg.num_heads, N, cfg.embed_dim // cfg.num_heads)


def test_cct_qkv_middle_capture_one_layer():
    """num_layers//2 - 1 == -1 for a 1-layer CCT must wrap to the only layer
    (reference list indexing); a literal -1 never matches layer_idx and the
    capture would silently stay all-zeros."""
    cfg = get_cct_config(
        "cct_2", img_size=8, embed_dim=32, num_heads=2, mlp_ratio=2.0,
        n_conv_layers=1, kernel_size=3, stride=1, padding=1, num_layers=1,
        positional_embedding="none", stochastic_depth=0.0, attention_dropout=0.0,
        dropout=0.0, num_classes=5, seq_pool=True,
    )
    model = CCT(cfg, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, capture_qkv="middle")
    out = model.apply(variables, x, capture_qkv="middle")
    assert float(jnp.max(jnp.abs(out.qkv))) > 0, "middle capture is zeros"


def test_cct_backbone_and_ensemble():
    model = create_cct("decct_2_3x1", img_size=32, dtype=jnp.float32,
                       stochastic_depth=0.0, attention_dropout=0.0)
    assert model.cfg.backbone
    x = jnp.zeros((2, 32, 32, 3))
    v0 = model.init(jax.random.key(0), x)
    v1 = model.init(jax.random.key(1), x)
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), v0, v1)
    feats = multicct_features(model, stacked, x)
    assert feats.shape == (2, 2, model.cfg.embed_dim)

    ens = EnsembleCCT(num_classes=10, sub_size=model.cfg.embed_dim,
                      num_divisions=2, teacher_size=64, dtype=jnp.float32)
    ev = ens.init(jax.random.key(2), feats, distill=True, train=True)
    out = ens.apply(ev, feats, distill=True, train=True)
    assert out.logits.shape == (2, 10)
    assert out.ens_tokens.shape == (2, 64)


def test_sinusoidal_embedding_matches_reference_formula():
    pe = sinusoidal_embedding(5, 8)
    ref = torch.FloatTensor(
        [[p / (10000 ** (2 * (i // 2) / 8)) for i in range(8)] for p in range(5)]
    )
    ref[:, 0::2] = torch.sin(ref[:, 0::2])
    ref[:, 1::2] = torch.cos(ref[:, 1::2])
    np.testing.assert_allclose(pe[0], ref.numpy(), rtol=1e-5)


class TorchCCTStage(nn.Module):
    """Torch fixture: one tokenizer stage + one encoder layer, reference
    semantics (tokenizer.py:24-44, transformers.py:73-113)."""

    def __init__(self, dim=32, heads=2, k=3, s=1, p=1):
        super().__init__()
        self.conv = nn.Conv2d(3, dim, k, s, p, bias=False)
        self.pre_norm = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.proj = nn.Linear(dim, dim)
        self.norm1 = nn.LayerNorm(dim)
        self.linear1 = nn.Linear(dim, dim * 2)
        self.linear2 = nn.Linear(dim * 2, dim)
        self.heads = heads

    def forward(self, x):
        x = F.relu(self.conv(x))
        x = F.max_pool2d(x, 3, 2, 1)
        x = x.flatten(2).transpose(1, 2)
        B, N, C = x.shape
        h = self.pre_norm(x)
        qkv = self.qkv(h).reshape(B, N, 3, self.heads, C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        a = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.proj(a)
        h2 = self.norm1(x)
        x = x + self.linear2(F.gelu(self.linear1(h2)))
        return x


def test_cct_layer_parity_with_torch():
    tm = TorchCCTStage().eval()
    cfg = get_cct_config(
        "cct_2", img_size=8, embed_dim=32, num_heads=2, mlp_ratio=2.0,
        n_conv_layers=1, kernel_size=3, stride=1, padding=1, num_layers=1,
        positional_embedding="none", stochastic_depth=0.0, attention_dropout=0.0,
        dropout=0.0, num_classes=5, seq_pool=True,
    )
    model = CCT(cfg, dtype=jnp.float32)
    x8 = np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x8))

    # copy torch weights into our pytree
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    p["tokenizer"]["conv0"]["kernel"] = tm.conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    blk = p["blocks"]
    blk["pre_norm"]["scale"] = np.stack([tm.pre_norm.weight.detach().numpy()])
    blk["pre_norm"]["bias"] = np.stack([tm.pre_norm.bias.detach().numpy()])
    blk["qkv"]["kernel"] = np.stack([tm.qkv.weight.detach().numpy().T])
    blk["proj"]["kernel"] = np.stack([tm.proj.weight.detach().numpy().T])
    blk["proj"]["bias"] = np.stack([tm.proj.bias.detach().numpy()])
    blk["norm1"]["scale"] = np.stack([tm.norm1.weight.detach().numpy()])
    blk["norm1"]["bias"] = np.stack([tm.norm1.bias.detach().numpy()])
    blk["linear1"]["kernel"] = np.stack([tm.linear1.weight.detach().numpy().T])
    blk["linear1"]["bias"] = np.stack([tm.linear1.bias.detach().numpy()])
    blk["linear2"]["kernel"] = np.stack([tm.linear2.weight.detach().numpy().T])
    blk["linear2"]["bias"] = np.stack([tm.linear2.bias.detach().numpy()])

    with torch.no_grad():
        t_tokens = tm(torch.tensor(x8.transpose(0, 3, 1, 2))).numpy()

    # hidden is (L+1, ...) with the post-PE embedding first (reference
    # transformers.py:214 seeds all_output_hidden_states with x); the final
    # pre-norm block output is hidden[-1]
    out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, p)},
                      jnp.asarray(x8), capture_outputs=True)
    assert out.hidden.shape[0] == 2  # embedding + 1 block
    np.testing.assert_allclose(np.asarray(out.hidden[-1]), t_tokens, rtol=2e-4, atol=2e-5)


def test_cct_pe_check_resizes_on_image_size_mismatch():
    """Loading a 224px learnable-PE CCT checkpoint into a 32px model must land
    the BILINEAR-resized pretrained PE, not the random init (reference
    models/utils/helpers.py:26-32 pe_check; round-3 VERDICT gap #1)."""
    from devit_tpu.cli.common import merge_params_into

    big = create_cct("cct_7_7x2_224", num_classes=10, dtype=jnp.float32,
                     stochastic_depth=0.0, attention_dropout=0.0)
    small = create_cct("cct_7_7x2_224", img_size=32, num_classes=10,
                       dtype=jnp.float32, stochastic_depth=0.0,
                       attention_dropout=0.0)
    assert big.cfg.seq_pool and big.cfg.positional_embedding == "learnable"
    big_params = big.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))["params"]
    small_tpl = small.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))["params"]

    merged = merge_params_into(small, big_params, small_tpl)
    got = np.asarray(merged["positional_emb"])
    assert got.shape == small_tpl["positional_emb"].shape
    # not the init: the resized pretrained PE actually landed
    assert not np.allclose(got, np.asarray(small_tpl["positional_emb"]))

    # reference semantics: torch F.interpolate bilinear, num_tokens=0 (seq-pool)
    pe = torch.from_numpy(np.asarray(big_params["positional_emb"], np.float32))
    D = pe.shape[-1]
    gs_old = int(np.sqrt(pe.shape[1]))
    gs_new = int(np.sqrt(got.shape[1]))
    ref = F.interpolate(pe.reshape(1, gs_old, gs_old, D).permute(0, 3, 1, 2),
                        size=(gs_new, gs_new), mode="bilinear")
    ref = ref.permute(0, 2, 3, 1).reshape(1, gs_new * gs_new, D).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_cct_pe_check_with_class_token():
    """num_tokens=1 path: seq_pool=False prepends a class token the resize
    must pass through untouched (helpers.py:29-31 num_tokens argument)."""
    from devit_tpu.io.checkpoint import resize_cct_pos_embed

    rng = np.random.default_rng(0)
    pe = rng.standard_normal((1, 1 + 16, 8)).astype(np.float32)  # 4x4 grid + cls
    out = resize_cct_pos_embed(pe, new_seq_len=1 + 4, num_prefix_tokens=1)
    assert out.shape == (1, 5, 8)
    np.testing.assert_array_equal(out[:, :1], pe[:, :1])
    ref = F.interpolate(
        torch.from_numpy(pe[0, 1:].reshape(1, 4, 4, 8)).permute(0, 3, 1, 2),
        size=(2, 2), mode="bilinear",
    ).permute(0, 2, 3, 1).reshape(1, 4, 8).numpy()
    np.testing.assert_allclose(out[:, 1:], ref, rtol=1e-5, atol=1e-5)


def test_cct_resize_params_exist_regardless_of_init_flags():
    """A resize_dim CCT initialized with DEFAULT flags must still be
    apply-able with capture_outputs=True (vit.py materializes its resize
    heads at init for exactly this init/apply flag asymmetry; cct.py
    previously created 'resize' only under capture_outputs=True and died
    with ScopeParamNotFoundError)."""
    import dataclasses

    cfg = dataclasses.replace(get_cct_config("cct_2_3x2_32"), img_size=16,
                              resize_dim=48, num_classes=5)
    model = CCT(cfg, dtype=jnp.float32)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.key(0), x)["params"]  # default flags
    assert "resize" in params
    out = model.apply({"params": params}, x, capture_outputs=True)
    assert out.attn is not None and out.attn.shape[-1] == 48
    assert out.hidden.shape[-1] == 48
