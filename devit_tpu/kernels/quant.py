"""Int8 serving path: per-channel weight quantization + dynamic per-row
activation quantization, hitting the TPU's int8 MXU (measured 1.57x bf16 on
this chip — CLAUDE.md).

No reference counterpart (the reference serves fp16 autocast); this is a
deployment-mode addition for the collaborative-inference throughput target.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class QuantizedLinear(NamedTuple):
    w_q: Array  # (K, N) int8
    w_scale: Array  # (N,) f32 per-output-channel
    bias: Optional[Array]  # (N,) or None


def quantize_weight(w: Array, bias: Optional[Array] = None) -> QuantizedLinear:
    """Symmetric per-output-channel int8 quantization."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantizedLinear(w_q=w_q, w_scale=scale, bias=bias)


def dynamic_int8_matmul(x: Array, q: QuantizedLinear, out_dtype=jnp.bfloat16) -> Array:
    """y = x @ W + b with dynamic symmetric per-row activation quantization.

    x: (..., K) float; returns (..., N) out_dtype.
    """
    shape = x.shape
    K = shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x2 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, q.w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * x_scale * q.w_scale[None, :]
    if q.bias is not None:
        y = y + q.bias.astype(jnp.float32)[None, :]
    return y.astype(out_dtype).reshape(*shape[:-1], q.w_q.shape[1])
