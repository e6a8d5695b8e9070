"""Ragged-compact ViT: per-layer exact-width inference forward.

The scan-stacked model (models/vit.py) needs uniform layer shapes, so
core/compact.py pads every layer to the per-model max kept width — which
throws away most of the savings when the shrink policy is ragged (the
reference's policy search samples per-layer sparsities uniformly,
shrink_imp.py:71). This module compacts WITHOUT padding: each layer keeps its
exact kept-head/kept-neuron width (rounded only to MXU alignment) and the
forward unrolls the 12 layers with per-layer shapes. This is the deployment
artifact — identical math to the gated model (weights are exact gathers),
running the analytic MACs for real. fast_math (the serving default) deviates
in TWO ways: the tanh GELU lowering (below bf16 activation rounding at f32 —
measured 1.5e-5 rel) AND bf16 LayerNorm statistics (`stat = dtype`); the
combined bf16 deviation vs fast_math=False is ~1.1% relative on logits
(pinned in tests/test_compact_ragged.py). Attention softmax is f32 under
every flag combination (reference_attention and the Pallas kernel both
compute f32 logits+softmax). Parity comparisons use fast_math=False.

Pure-function style: parameters are a pytree (list of per-layer dicts), the
forward is jit-compatible, and divisions with different policies are simply
different compiled programs (on one chip sequential programs lose nothing vs
a stacked vmap; across chips each division lives on its own sub-mesh anyway).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.configs import ViTConfig
from devit_tpu.models.vit import Gates, _layer_norm, fast_gelu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class CompactViT(NamedTuple):
    """Deployment artifact: embed/head params + per-layer ragged blocks."""

    embed: dict  # patch kernel/bias, cls/dist tokens, pos_embed, final norm
    layers: Tuple[dict, ...]  # per-layer params with exact widths
    head: dict  # classifier head(s); may be empty for feature-only backbones
    head_dim: int
    distilled: bool
    eps: float


def compact_vit_ragged(
    params,
    gates: Gates,
    cfg: ViTConfig,
    *,
    head_multiple: int = 1,
    neuron_multiple: int = 128,
) -> CompactViT:
    """Gather kept heads/neurons per layer into exact-width weights."""
    head = np.asarray(jax.device_get(gates.head))
    neuron = np.asarray(jax.device_get(gates.neuron))
    if not (np.isin(head, (0.0, 1.0)).all() and np.isin(neuron, (0.0, 1.0)).all()):
        # compaction DROPS pruned slots; a fractional gate would multiply
        # activations in the gated model but be rounded to keep/drop here —
        # silently different math. Only binary masks are compactable.
        raise ValueError("compact_vit_ragged requires binary (0/1) gates")
    if getattr(cfg, "representation_size", None):
        raise NotImplementedError(
            "compact_vit_ragged does not carry the pre_logits "
            "(representation_size) head; deploy such models via the gated "
            "forward instead")
    p = jax.tree_util.tree_map(np.asarray, params)
    L, H = head.shape
    hidden = neuron.shape[1]
    C = cfg.embed_dim
    dh = cfg.head_dim

    blocks = p["blocks"]
    qkv_k = blocks["qkv"]["kernel"].reshape(L, C, 3, H, dh)
    qkv_b = blocks["qkv"].get("bias")
    if qkv_b is not None:
        qkv_b = qkv_b.reshape(L, 3, H, dh)
    proj_k = blocks["proj"]["kernel"].reshape(L, H, dh, C)

    layers: List[dict] = []
    for l in range(L):
        hi = np.nonzero(head[l])[0]
        ni = np.nonzero(neuron[l])[0]
        kh = max(min(_round_up(len(hi), head_multiple), H), 1)
        kn = max(min(_round_up(len(ni), neuron_multiple), hidden), 1)
        # pad with arbitrary extra indices but zero their weights
        hi_pad = np.concatenate([hi, np.zeros(kh - len(hi), np.int64)])
        ni_pad = np.concatenate([ni, np.zeros(kn - len(ni), np.int64)])
        h_mask = (np.arange(kh) < len(hi)).astype(qkv_k.dtype)
        n_mask = (np.arange(kn) < len(ni)).astype(qkv_k.dtype)

        lp = {
            "norm1": {k: blocks["norm1"][k][l] for k in ("scale", "bias")},
            "norm2": {k: blocks["norm2"][k][l] for k in ("scale", "bias")},
            "qkv_kernel": (qkv_k[l][:, :, hi_pad] * h_mask[None, None, :, None])
            .reshape(C, 3 * kh * dh),
            "proj_kernel": proj_k[l][hi_pad].reshape(kh * dh, C)
            * np.repeat(h_mask, dh)[:, None],
            "proj_bias": blocks["proj"]["bias"][l],
            "fc1_kernel": blocks["fc1"]["kernel"][l][:, ni_pad] * n_mask[None, :],
            "fc1_bias": blocks["fc1"]["bias"][l][ni_pad] * n_mask,
            "fc2_kernel": blocks["fc2"]["kernel"][l][ni_pad] * n_mask[:, None],
            "fc2_bias": blocks["fc2"]["bias"][l],
        }
        if qkv_b is not None:
            lp["qkv_bias"] = (qkv_b[l][:, hi_pad] * h_mask[None, :, None]).reshape(
                3 * kh * dh
            )
        lp = jax.tree_util.tree_map(jnp.asarray, lp)
        lp["num_heads"] = kh  # static Python int — must not become a tracer
        layers.append(lp)

    embed = {
        "patch_kernel": jnp.asarray(p["patch_embed"]["kernel"]),
        "patch_bias": jnp.asarray(p["patch_embed"]["bias"]),
        "cls_token": jnp.asarray(p["cls_token"]),
        "pos_embed": jnp.asarray(p["pos_embed"]),
        "norm": {k: jnp.asarray(p["norm"][k]) for k in ("scale", "bias")},
    }
    if "dist_token" in p:
        embed["dist_token"] = jnp.asarray(p["dist_token"])
    head_p = {}
    for name in ("head", "head_dist"):
        if name in p:
            head_p[name] = jax.tree_util.tree_map(jnp.asarray, p[name])

    return CompactViT(
        embed=embed, layers=tuple(layers), head=head_p,
        head_dim=dh, distilled=cfg.distilled, eps=cfg.layer_norm_eps,
    )


def quantize_compact(model: CompactViT) -> CompactViT:
    """Int8 serving variant: per-layer weight matrices -> QuantizedLinear
    (per-channel scales); layout otherwise unchanged. Use with
    compact_forward(..., int8=True)."""
    from devit_tpu.kernels.quant import quantize_weight

    layers = []
    for lp in model.layers:
        nlp = dict(lp)
        nlp["qkv_q"] = quantize_weight(lp["qkv_kernel"], lp.get("qkv_bias"))
        nlp["proj_q"] = quantize_weight(lp["proj_kernel"], lp["proj_bias"])
        nlp["fc1_q"] = quantize_weight(lp["fc1_kernel"], lp["fc1_bias"])
        nlp["fc2_q"] = quantize_weight(lp["fc2_kernel"], lp["fc2_bias"])
        for k in ("qkv_kernel", "qkv_bias", "proj_kernel", "proj_bias",
                  "fc1_kernel", "fc1_bias", "fc2_kernel", "fc2_bias"):
            nlp.pop(k, None)
        layers.append(nlp)
    return model._replace(layers=tuple(layers))


def compact_forward(
    model: CompactViT,
    x,  # (B, H, W, 3)
    *,
    patch_size: int,
    dtype=jnp.bfloat16,
    use_pallas: bool = True,
    fast_math: bool = True,
    features_only: bool = False,
    int8: bool = False,
    force_pallas: bool = False,
):
    """Inference forward over ragged layers. Returns logits or (cls, dist) feats."""
    stat = dtype if fast_math else jnp.float32
    B, Hh, Ww, _ = x.shape
    g = Hh // patch_size
    xp = x.reshape(B, g, patch_size, g, patch_size, 3)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, -1).astype(dtype)
    t = jnp.dot(xp, model.embed["patch_kernel"].astype(dtype))
    t = t + model.embed["patch_bias"].astype(dtype)
    toks = [jnp.broadcast_to(model.embed["cls_token"].astype(dtype), (B, 1, t.shape[-1]))]
    if model.distilled:
        toks.append(jnp.broadcast_to(model.embed["dist_token"].astype(dtype),
                                     (B, 1, t.shape[-1])))
    t = jnp.concatenate(toks + [t], axis=1)
    t = t + model.embed["pos_embed"].astype(dtype)

    if int8:
        from devit_tpu.kernels.quant import dynamic_int8_matmul

    # force_pallas drives the fused kernel in interpret mode off-TPU (tests)
    # MEASURED (v5e, bs512): the split layout below — XLA weight matmuls +
    # the Pallas attention kernel — beats a fully fused
    # LN+qkv+attention+proj+residual kernel (fused_block_attention) at every
    # feasible block size: 47.9 ms/division split vs 53.0/53.8/59.8 for fused
    # block_b 4/8/16. XLA's one flat (B*N, C)x(C, 3K) matmul runs the MXU
    # harder than the same matmul tiled per batch block inside the kernel.
    # fused_block_attention is kept as a tested capability (test_kernels.py).
    pallas_on = use_pallas and (jax.default_backend() == "tpu" or force_pallas)
    gelu = (lambda v: jax.nn.gelu(v, approximate=True)) if fast_math else fast_gelu

    for lp in model.layers:
        kh = lp["num_heads"]
        h = _layer_norm(t, lp["norm1"]["scale"], lp["norm1"]["bias"], model.eps, stat)
        if int8:
            qkv = dynamic_int8_matmul(h, lp["qkv_q"], dtype)
        else:
            qkv = jnp.dot(h, lp["qkv_kernel"].astype(dtype))
            if "qkv_bias" in lp:
                qkv = qkv + lp["qkv_bias"].astype(dtype)
        if pallas_on and not int8:
            from devit_tpu.kernels.attention import fused_attention

            att = fused_attention(qkv, None, num_heads=kh,
                                  interpret=None if not force_pallas else True)
        else:
            from devit_tpu.kernels.attention import reference_attention

            att = reference_attention(qkv, None, num_heads=kh)
        if int8:
            att = dynamic_int8_matmul(att, lp["proj_q"], dtype)
        else:
            att = jnp.dot(att, lp["proj_kernel"].astype(dtype)) + lp["proj_bias"].astype(dtype)
        t = t + att
        h = _layer_norm(t, lp["norm2"]["scale"], lp["norm2"]["bias"], model.eps, stat)
        # GELU lowering (MEASURED, v5e bs512 deployed ensemble): XLA's native
        # erf costs 63 ms of the 186 ms forward — more than all weight
        # matmuls combined. fast_gelu (exp-based A&S erf, error 1e-6 ≈
        # erf-exact) cuts that to ~26 ms; with fast_math the hardware-fast
        # tanh form (jax.nn.gelu approximate=True) cuts it to ~2 ms at a max
        # deviation of ~2e-3·scale — below bf16 activation rounding (the
        # serving activations are bf16 anyway). fast_math=False keeps the
        # erf-exact form for strict reference comparisons.
        if int8:
            h = dynamic_int8_matmul(h, lp["fc1_q"], dtype)
            h = gelu(h)
            h = dynamic_int8_matmul(h, lp["fc2_q"], dtype)
        else:
            h = jnp.dot(h, lp["fc1_kernel"].astype(dtype)) + lp["fc1_bias"].astype(dtype)
            h = gelu(h)
            h = jnp.dot(h, lp["fc2_kernel"].astype(dtype)) + lp["fc2_bias"].astype(dtype)
        t = t + h

    t = _layer_norm(t, model.embed["norm"]["scale"], model.embed["norm"]["bias"],
                    model.eps, stat)
    cls_feat = t[:, 0]
    dist_feat = t[:, 1] if model.distilled else None
    if features_only or not model.head:
        return cls_feat, dist_feat
    logits = jnp.dot(cls_feat, model.head["head"]["kernel"].astype(dtype))
    logits = (logits + model.head["head"]["bias"].astype(dtype)).astype(jnp.float32)
    if model.distilled and "head_dist" in model.head:
        d = jnp.dot(dist_feat, model.head["head_dist"]["kernel"].astype(dtype))
        d = (d + model.head["head_dist"]["bias"].astype(dtype)).astype(jnp.float32)
        logits = (logits + d) / 2.0
    return logits


def save_compact(path: str, model: CompactViT) -> None:
    """Serialize the deployment artifact (arrays via msgpack; static meta
    alongside). bf16/f32 models only — quantize_compact's QuantizedLinear
    leaves don't round-trip msgpack; quantize AFTER load at serve time."""
    from devit_tpu.kernels.quant import QuantizedLinear
    from devit_tpu.io.checkpoint import save_pytree

    layers = []
    heads = []
    for lp in model.layers:
        if any(isinstance(v, QuantizedLinear) for v in lp.values()):
            raise ValueError(
                "save_compact cannot serialize a quantize_compact model; "
                "save the bf16 artifact and quantize after load_compact")
        lp = dict(lp)
        heads.append(int(lp.pop("num_heads")))
        layers.append(lp)
    save_pytree(path, {
        "embed": model.embed,
        "layers": {str(i): l for i, l in enumerate(layers)},
        "head": model.head,
        "meta": {
            "num_heads": np.asarray(heads, np.int32),
            "head_dim": np.int32(model.head_dim),
            "distilled": np.int32(model.distilled),
            "eps": np.float32(model.eps),
        },
    })


def load_compact(path: str) -> CompactViT:
    from devit_tpu.io.checkpoint import restore_pytree

    tree = restore_pytree(path, None)
    meta = tree["meta"]
    heads = [int(h) for h in np.asarray(meta["num_heads"])]
    layers = []
    for i in range(len(heads)):
        lp = {k: jnp.asarray(v) if not isinstance(v, dict)
              else {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in tree["layers"][str(i)].items()}
        lp["num_heads"] = heads[i]
        layers.append(lp)
    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return CompactViT(
        embed=to_jnp(tree["embed"]), layers=tuple(layers),
        head=to_jnp(tree.get("head", {})),
        head_dim=int(meta["head_dim"]), distilled=bool(int(meta["distilled"])),
        eps=float(meta["eps"]),
    )


def stack_division_features(cms, images, *, patch_size: int,
                            dtype=jnp.bfloat16, use_pallas: bool = True,
                            fast_math: bool = True):
    """Run every compact division on the same batch and stack the token
    features division-major — the single-device half of the collaborative
    ensemble forward. ONE implementation shared by the deployed bench
    (bench.build), the CLI compact eval (cli/stages.py), and the driver
    dryrun (__graft_entry__) so the fusion contract (undistilled -> None
    dist stack, division-major order) cannot drift between them.

    Returns (cls_stack (D, B, C), dist_stack (D, B, C) or None)."""
    feats = [compact_forward(cm, images, patch_size=patch_size, dtype=dtype,
                             use_pallas=use_pallas, fast_math=fast_math,
                             features_only=True) for cm in cms]
    cls_stack = jnp.stack([c for c, _ in feats])
    dist_stack = (None if feats[0][1] is None
                  else jnp.stack([t for _, t in feats]))
    return cls_stack, dist_stack
