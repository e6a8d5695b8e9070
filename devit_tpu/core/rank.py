"""Importance ranking of MLP neurons and attention heads, and gate building.

Parity surface: reference `core/imp_rank.py:16-172`.

- Neuron score (imp_rank.py:16-47): on ONE training batch, per neuron,
  0.1 * minmax(HSIC(neuron activations over tokens, softmax logits))
  + 0.9 * minmax(sum |activation|); rank = argsort ascending.
- Head score (imp_rank.py:93-129): per head, HSIC relevance of the
  channel-mean head output vs softmax logits, minus 0.1 * mean pairwise
  RBF-HSIC redundancy against the other heads; rank = argsort ascending.
- Masks keep the top int(width * (1 - ratio)) entries (imp_rank.py:50-62,
  132-144).

The per-candidate Python loops of the reference become vmapped XLA programs
(devit_tpu.core.hsic); layers are processed under lax.map so one compiled
program covers the whole stack.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.core.hsic import hsic_relevance_many, hsic_redundancy_matrix
from devit_tpu.models.vit import Gates

Array = jax.Array


def _minmax(x: np.ndarray) -> np.ndarray:
    lo, hi = np.min(x), np.max(x)
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


@jax.jit
def _neuron_scores(neuron_act: Array, probs: Array) -> Tuple[Array, Array]:
    """(L, B, N, hidden), (B, K) -> HSIC scores (L, hidden), activation sums (L, hidden)."""

    def per_layer(act_l):
        xs = jnp.transpose(act_l, (2, 0, 1))  # (hidden, B, N)
        h = hsic_relevance_many(xs, probs)
        a = jnp.sum(jnp.abs(act_l), axis=(0, 1))
        return h, a

    return jax.lax.map(per_layer, neuron_act.astype(jnp.float32))


@jax.jit
def _head_scores(head_out: Array, probs: Array) -> Array:
    """(L, B, N, H, dh), (B, K) -> combined scores (L, H)."""

    def per_layer(ho_l):
        means = jnp.mean(ho_l, axis=-1)  # (B, N, H), channel-mean (imp_rank.py:112)
        xs = jnp.transpose(means, (2, 0, 1))  # (H, B, N)
        rel = hsic_relevance_many(xs, probs)  # (H,)
        red = hsic_redundancy_matrix(xs)  # (H, H)
        H = xs.shape[0]
        # H=1: no other heads to be redundant WITH — redundancy is 0, not
        # the 0/0 NaN that would give argsort garbage ranks (the reference
        # crashes with ZeroDivisionError here, imp_rank.py:119)
        off_diag_mean = (jnp.sum(red, axis=1) - jnp.diagonal(red)) / max(H - 1, 1)
        return rel - 0.1 * off_diag_mean  # imp_rank.py:121

    return jax.lax.map(per_layer, head_out.astype(jnp.float32))


def mlp_neuron_rank(apply_fn, variables, images, gates: Optional[Gates] = None) -> np.ndarray:
    """Rank neurons per layer, ascending importance. Returns (L, hidden) int array.

    `apply_fn(variables, images, gates, capture_rank_stats=True)` must return a
    ViTOutput; uses ONE batch exactly like imp_rank.py:21-23.
    """
    out = apply_fn(variables, images, gates, True)
    probs = jax.nn.softmax(out.logits.astype(jnp.float32), axis=-1)
    hsic_s, act_s = jax.device_get(_neuron_scores(out.neuron_act, probs))
    scores = np.stack(
        [0.1 * _minmax(h) + 0.9 * _minmax(a) for h, a in zip(hsic_s, act_s)]
    )  # imp_rank.py:39
    return np.argsort(scores, axis=-1)


def attn_head_rank(apply_fn, variables, images, gates: Optional[Gates] = None) -> np.ndarray:
    """Rank heads per layer, ascending importance. Returns (L, H) int array."""
    out = apply_fn(variables, images, gates, True)
    probs = jax.nn.softmax(out.logits.astype(jnp.float32), axis=-1)
    scores = jax.device_get(_head_scores(out.head_out, probs))
    return np.argsort(scores, axis=-1)


def _mask_from_rank(rank_row: np.ndarray, width: int, ratio: float) -> np.ndarray:
    """Keep the top int(width*(1-ratio)) by importance (imp_rank.py:55-58)."""
    num_keep = int(width * (1.0 - ratio))
    keep = rank_row[::-1][:num_keep]
    mask = np.zeros(width, dtype=np.float32)
    mask[keep] = 1.0
    return mask


def build_gates(
    neuron_rank: np.ndarray,
    head_rank: np.ndarray,
    neuron_sparsity,
    head_sparsity,
) -> Gates:
    """Per-layer sparsity vectors + ranks -> Gates arrays.

    neuron_rank: (L, hidden); head_rank: (L, H); sparsities: length-L sequences
    of pruned fractions (imp_rank.py:50-62, 132-144 semantics).
    """
    L, hidden = neuron_rank.shape
    _, H = head_rank.shape
    neuron = np.stack(
        [_mask_from_rank(neuron_rank[l], hidden, float(neuron_sparsity[l])) for l in range(L)]
    )
    head = np.stack(
        [_mask_from_rank(head_rank[l], H, float(head_sparsity[l])) for l in range(L)]
    )
    return Gates(head=jnp.asarray(head), neuron=jnp.asarray(neuron))


def check_sparsity(gates: Gates) -> Tuple[np.ndarray, np.ndarray]:
    """Fraction pruned per layer (imp_rank.py:84-90, 166-172)."""
    head = np.asarray(jax.device_get(gates.head))
    neuron = np.asarray(jax.device_get(gates.neuron))
    return (neuron == 0).mean(axis=-1), (head == 0).mean(axis=-1)
