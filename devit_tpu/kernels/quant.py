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


# ------------------------------------------- fused Pallas quant-matmul
#
# VERDICT r3 #6 / perf-roadmap #1: the XLA-level path above lost 2x to bf16
# at serving shapes because the quantize/rescale epilogues don't fuse into
# the int8 dot (each is its own HBM round-trip over the (M, K)/(M, N)
# activations). This kernel does per-row amax -> quantize -> int8 MXU dot ->
# rescale(+bias) in ONE VMEM-resident pass, so the only HBM traffic is the
# bf16 x in and the bf16 y out — strictly less than the bf16 matmul's.


def _quant_matmul_kernel(x_ref, wq_ref, ws_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # (TM, K)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * ws_ref[0] + b_ref[0]
    o_ref[...] = y.astype(o_ref.dtype)


def fused_int8_matmul(x: Array, q: QuantizedLinear, *, block_m: int = 512,
                      out_dtype=jnp.bfloat16,
                      interpret: Optional[bool] = None) -> Array:
    """dynamic_int8_matmul semantics (same math, bit-matching quantization:
    RNE rounding, 1e-8 amax floor) with quantize + dot + rescale fused in one
    Pallas kernel. x: (..., K) float; returns (..., N) out_dtype. Weights
    (K, N) int8 + (N,) scales live whole in VMEM — at ViT serving shapes
    (K<=1536, N<=1536) that is <=2.3 MB."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    K = shape[-1]
    N = q.w_q.shape[1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    block_m = min(block_m, M)
    bias = (q.bias if q.bias is not None else jnp.zeros((N,), jnp.float32))
    y = pl.pallas_call(
        _quant_matmul_kernel,
        grid=(pl.cdiv(M, block_m),),
        in_specs=[
            pl.BlockSpec((block_m, K), lambda m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, N), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
    )(x2, q.w_q, q.w_scale.astype(jnp.float32).reshape(1, N),
      bias.astype(jnp.float32).reshape(1, N))
    return y.reshape(*shape[:-1], N)
