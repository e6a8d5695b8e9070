"""Structural compaction: physically remove pruned heads/neurons.

The reference only ever *masks* (gates stay in the forward, FLOPs unchanged —
de_vit.py:43,79); its MACs savings exist only in the analytic formulas
(compute_metric.py). Compaction realises them: given trained params + gates,
gather the kept attention heads and MLP neurons into dense, smaller weight
matrices. The compacted model is mathematically identical to the gated model
(verified by tests) but actually runs the reduced MACs — the deployment
artifact for collaborative inference.

Ragged per-layer kept counts are padded to the per-model maximum (rounded up
for MXU alignment) with zero weights, so one scan-stacked program still serves
every layer; padded heads/neurons provably contribute nothing (zero V rows,
zero fc1 columns with zero bias).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.configs import ViTConfig
from devit_tpu.models.compact_vit import _round_up
from devit_tpu.models.vit import Gates


def compact_vit_params(
    params,
    gates: Gates,
    cfg: ViTConfig,
    *,
    head_multiple: int = 1,  # alignment padding measured SLOWER (CLAUDE.md
    # round-2b: head_multiple=2 190.7 ms vs 185.8 baseline) — keep (1, 128)
    neuron_multiple: int = 128,
    min_keep_heads: Optional[int] = None,
    min_keep_neurons: Optional[int] = None,
) -> Tuple[dict, ViTConfig]:
    """Gather kept heads/neurons into compact shapes.

    params: our scan-stacked ViT param pytree; gates: (L,H)/(L,hidden) masks.
    Returns (compact params, new config with num_heads/hidden_override shrunk).
    """
    head = np.asarray(jax.device_get(gates.head))
    neuron = np.asarray(jax.device_get(gates.neuron))
    if not (np.isin(head, (0.0, 1.0)).all() and np.isin(neuron, (0.0, 1.0)).all()):
        # same contract as compact_vit_ragged: compaction drops pruned slots,
        # so a fractional gate (which SCALES activations in the gated model)
        # would silently round to keep/drop here — different math, no error
        raise ValueError("compact_vit_params requires binary (0/1) gates")
    L, H = head.shape
    _, hidden = neuron.shape
    dh = cfg.head_dim
    C = cfg.embed_dim

    keep_h = max(int(head.sum(-1).max()), 1)
    keep_n = max(int(neuron.sum(-1).max()), 1)
    if min_keep_heads:
        keep_h = max(keep_h, min_keep_heads)
    if min_keep_neurons:
        keep_n = max(keep_n, min_keep_neurons)
    keep_h = min(_round_up(keep_h, head_multiple), H)
    keep_n = min(_round_up(keep_n, neuron_multiple), hidden)

    p = jax.tree_util.tree_map(np.asarray, params)
    blocks = p["blocks"]
    new_blocks = dict(blocks)

    qkv_k = blocks["qkv"]["kernel"].reshape(L, C, 3, H, dh)
    qkv_b = blocks["qkv"].get("bias")
    proj_k = blocks["proj"]["kernel"].reshape(L, H, dh, C)
    fc1_k = blocks["fc1"]["kernel"]  # (L, C, hidden)
    fc1_b = blocks["fc1"]["bias"]
    fc2_k = blocks["fc2"]["kernel"]  # (L, hidden, C)

    new_qkv_k = np.zeros((L, C, 3, keep_h, dh), qkv_k.dtype)
    new_qkv_b = (
        np.zeros((L, 3, keep_h, dh), qkv_b.dtype) if qkv_b is not None else None
    )
    new_proj_k = np.zeros((L, keep_h, dh, C), proj_k.dtype)
    new_fc1_k = np.zeros((L, C, keep_n), fc1_k.dtype)
    new_fc1_b = np.zeros((L, keep_n), fc1_b.dtype)
    new_fc2_k = np.zeros((L, keep_n, C), fc2_k.dtype)

    for l in range(L):
        # slots beyond the kept count stay zero in the pre-zeroed destination
        # arrays (padding contributes nothing to the forward)
        hi = np.nonzero(head[l])[0]
        n_kept_h = len(hi)
        new_qkv_k[l, :, :, :n_kept_h] = qkv_k[l][:, :, hi]
        if qkv_b is not None:
            b = qkv_b[l].reshape(3, H, dh)
            new_qkv_b[l, :, :n_kept_h] = b[:, hi]
        new_proj_k[l, :n_kept_h] = proj_k[l][hi]

        ni = np.nonzero(neuron[l])[0]
        n_kept_n = len(ni)
        new_fc1_k[l, :, :n_kept_n] = fc1_k[l][:, ni]
        new_fc1_b[l, :n_kept_n] = fc1_b[l][ni]
        new_fc2_k[l, :n_kept_n] = fc2_k[l][ni]

    new_C = keep_h * dh
    new_blocks["qkv"] = {"kernel": new_qkv_k.reshape(L, C, 3 * new_C)}
    if new_qkv_b is not None:
        new_blocks["qkv"]["bias"] = new_qkv_b.reshape(L, 3 * new_C)
    new_blocks["proj"] = {
        "kernel": new_proj_k.reshape(L, new_C, C),
        "bias": blocks["proj"]["bias"],
    }
    new_blocks["fc1"] = {"kernel": new_fc1_k, "bias": new_fc1_b}
    new_blocks["fc2"] = {"kernel": new_fc2_k, "bias": blocks["fc2"]["bias"]}

    new_params = dict(p)
    new_params["blocks"] = new_blocks
    new_cfg = cfg.replace(num_heads=keep_h, hidden_override=keep_n,
                          head_dim_override=dh)
    new_params = jax.tree_util.tree_map(jnp.asarray, new_params)
    return new_params, new_cfg


def compact_divisions(
    params_list: Sequence[dict],
    gates_list: Sequence[Gates],
    cfg: ViTConfig,
    **kw,
) -> Tuple[List[dict], ViTConfig]:
    """Compact every division to ONE common (max-over-divisions) geometry so
    the stacked/vmapped ensemble forward still compiles to a single program."""
    heads = [np.asarray(jax.device_get(g.head)) for g in gates_list]
    neurons = [np.asarray(jax.device_get(g.neuron)) for g in gates_list]
    # the cross-division max is a FLOOR, not a default: an explicit min_keep_*
    # below some division's kept count would otherwise give each division its
    # own geometry while final_cfg reports only the last one's — breaking the
    # one-common-geometry contract with a confusing downstream shape error
    kw["min_keep_heads"] = max(kw.get("min_keep_heads", 0),
                               max(int(h.sum(-1).max()) for h in heads))
    kw["min_keep_neurons"] = max(kw.get("min_keep_neurons", 0),
                                 max(int(n.sum(-1).max()) for n in neurons))
    out, final_cfg = [], None
    for p, g in zip(params_list, gates_list):
        cp, final_cfg = compact_vit_params(p, g, cfg, **kw)
        out.append(cp)
    return out, final_cfg
