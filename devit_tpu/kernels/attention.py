"""Pallas fused multi-head self-attention with head gating.

The TPU-native replacement for the reference's unfused attention
(de_vit.py:65-87): one kernel consumes the RAW fused-qkv Dense output
(B, N, 3C) — no (3,B,H,N,dh) transpose is ever materialised — computes
softmax(q k^T * scale) v per head entirely in VMEM (the (N, N) probability
tile never round-trips HBM), applies the head gate, and writes the
proj-ready (B, N, C) layout. Sized for ViT sequence lengths (N = 197/198 is
fixed by the 224/16 geometry — SURVEY.md §5.7 — so the whole row fits VMEM
and no flash-style tiling over N is needed).

Layout contract with models/vit.py:
  input  qkv:  (B, N, 3*C) with C = H*dh, ordered [q | k | v], head-major
  output out:  (B, N, C)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int,
                 scale: float):
    C = num_heads * head_dim
    x = qkv_ref[...]  # (TB, N, 3C)
    for h in range(num_heads):
        lo = h * head_dim
        q = x[:, :, lo : lo + head_dim]
        k = x[:, :, C + lo : C + lo + head_dim]
        v = x[:, :, 2 * C + lo : 2 * C + lo + head_dim]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # (TB, N, N)
            preferred_element_type=jnp.float32,
        ) * scale
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),  # (TB, N, dh)
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, lo : lo + head_dim] = o.astype(o_ref.dtype)


def fused_attention(
    qkv: Array,
    head_gate: Optional[Array] = None,
    *,
    num_heads: int,
    block_b: int = 8,
    vmem_limit_mb: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Array:
    """softmax(q k^T / sqrt(dh)) v * head_gate, fused.

    qkv: (B, N, 3C) raw fused-qkv activations; head_gate: (H,) or None.
    Returns (B, N, C). On non-TPU backends falls back to interpret mode so
    the same model code runs in CPU tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, threeC = qkv.shape
    C = threeC // 3
    if threeC % (3 * num_heads) != 0:
        # a non-dividing head count would leave the tail output channels
        # unwritten — uninitialized VMEM on TPU (zeros only in interpret mode)
        raise ValueError(f"num_heads={num_heads} must divide C={C}")
    dh = C // num_heads
    block_b = min(block_b, B)
    grid = (pl.cdiv(B, block_b),)
    params = {}
    if vmem_limit_mb is not None and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        )

    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads, head_dim=dh,
                          scale=dh ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, N, threeC), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        interpret=interpret,
        **params,
    )(qkv)
    if head_gate is not None:
        # Head gate applied outside the kernel (one fused elementwise pass) so
        # the kernel stays vmap-compatible for the division-stacked ensemble.
        out = out * jnp.repeat(head_gate.astype(out.dtype), dh)[None, None, :]
    return out


def reference_attention(qkv: Array, head_gate: Optional[Array] = None,
                        *, num_heads: int) -> Array:
    """XLA reference with identical layout contract, for parity tests and the
    training path."""
    B, N, threeC = qkv.shape
    C = threeC // 3
    dh = C // num_heads
    x = qkv.reshape(B, N, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = x[0], x[1], x[2]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    s = s * (dh ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    if head_gate is not None:
        o = o * head_gate.astype(o.dtype)[None, :, None, None]
    return o.transpose(0, 2, 1, 3).reshape(B, N, C)


# ------------------------------------------------- fused serving block-half
#
# LN1 + qkv matmul + attention + proj + residual in ONE kernel. Removes four
# HBM round-trips per layer vs the split path (LN write, qkv write+read, att
# write+read): at bs512/N198/C384 that's ~0.4 ms/layer of pure bandwidth.
# MLP half stays in XLA (LN+fc1+gelu+fc2 fuse well there; a fully fused block
# kernel measured no better — CLAUDE.md perf notes).


def _block_attn_kernel(t_ref, ns_ref, nb_ref, qw_ref, qb_ref, pw_ref, pb_ref,
                       o_ref, *, num_heads: int, head_dim: int, scale: float,
                       eps: float):
    K = num_heads * head_dim
    t = t_ref[...]  # (TB, N, C)
    tf = t.astype(jnp.float32)
    mu = jnp.mean(tf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
    h = (tf - mu) * jax.lax.rsqrt(var + eps)
    h = (h * ns_ref[0].astype(jnp.float32) + nb_ref[0].astype(jnp.float32)).astype(t.dtype)
    qkv = jax.lax.dot_general(
        h, qw_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),  # (TB, N, 3K)
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + qb_ref[0].astype(jnp.float32)).astype(t.dtype)
    acc = tf  # residual accumulator in f32
    for hd in range(num_heads):
        lo = hd * head_dim
        q = qkv[:, :, lo : lo + head_dim]
        k = qkv[:, :, K + lo : K + lo + head_dim]
        v = qkv[:, :, 2 * K + lo : 2 * K + lo + head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        acc = acc + jax.lax.dot_general(
            o, pw_ref[lo : lo + head_dim, :],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = (acc + pb_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def fused_block_attention(
    t: Array,
    norm_scale: Array,
    norm_bias: Array,
    qkv_kernel: Array,
    qkv_bias: Optional[Array],
    proj_kernel: Array,
    proj_bias: Array,
    *,
    num_heads: int,
    eps: float = 1e-6,
    block_b: int = 8,
    vmem_limit_mb: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Array:
    """t + proj(attention(qkv(LN(t)))) fused in one Pallas kernel.

    t: (B, N, C); qkv_kernel: (C, 3*K) with K = num_heads*head_dim (the
    compact ragged layout, compact_vit.py); proj_kernel: (K, C).
    Replaces compact_forward's LN1->qkv->attention->proj->residual sequence
    (the gated-attention semantics of reference de_vit.py:65-87 with the gate
    baked into the compacted weights).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, C = t.shape
    threeK = qkv_kernel.shape[1]
    K = threeK // 3
    dh = K // num_heads
    block_b = min(block_b, B)
    if qkv_bias is None:
        qkv_bias = jnp.zeros((threeK,), t.dtype)
    # the default 16MB scoped-VMEM limit is conservative (physical VMEM is
    # much larger); bigger batch tiles need it raised explicitly
    params = {}
    if vmem_limit_mb is not None and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        )

    return pl.pallas_call(
        functools.partial(_block_attn_kernel, num_heads=num_heads, head_dim=dh,
                          scale=dh ** -0.5, eps=eps),
        grid=(pl.cdiv(B, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, threeK), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeK), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), t.dtype),
        interpret=interpret,
        **params,
    )(t, norm_scale.reshape(1, C), norm_bias.reshape(1, C), qkv_kernel,
      qkv_bias.reshape(1, threeK), proj_kernel, proj_bias.reshape(1, C))


# ----------------------------------------------------------- training path


def _attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, num_heads: int, head_dim: int,
                     scale: float):
    """Backward: recompute p from qkv (flash-style — the (N,N) probabilities
    are never stored), then dv = p^T g, dp = g v^T, ds = p*(dp - rowsum(dp*p)),
    dq = ds k * scale, dk = ds^T q * scale."""
    C = num_heads * head_dim
    x = qkv_ref[...]
    g = g_ref[...]
    for h in range(num_heads):
        lo = h * head_dim
        q = x[:, :, lo : lo + head_dim]
        k = x[:, :, C + lo : C + lo + head_dim]
        v = x[:, :, 2 * C + lo : 2 * C + lo + head_dim]
        gh = g[:, :, lo : lo + head_dim]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)  # f32 (TB, N, N)
        pb = p.astype(v.dtype)
        dv = jax.lax.dot_general(pb, gh, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gh, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(v.dtype)
        dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqkv_ref[:, :, lo : lo + head_dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, C + lo : C + lo + head_dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * C + lo : 2 * C + lo + head_dim] = dv.astype(dqkv_ref.dtype)


def _attention_bwd_impl(qkv: Array, g: Array, num_heads: int, block_b: int,
                        interpret: Optional[bool]) -> Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, threeC = qkv.shape
    C = threeC // 3
    if threeC % (3 * num_heads) != 0:
        raise ValueError(f"num_heads={num_heads} must divide C={C}")
    dh = C // num_heads
    block_b = min(block_b, B)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, num_heads=num_heads, head_dim=dh,
                          scale=dh ** -0.5),
        grid=(pl.cdiv(B, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, N, threeC), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, N, threeC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, threeC), qkv.dtype),
        interpret=interpret,
    )(qkv, g)


# Split backward (VERDICT r3 #7 experiment): dv needs only p and g; dq/dk
# needs p, dp, ds. Splitting halves neither kernel's dominant term alone
# (dq/dk still holds p+dp+ds), but it drops the dv slice from the big
# kernel's output tile and lets each half pick its own batch tile — the
# monolithic kernel's block_b=8 VMEM compile failure (CLAUDE.md) may not
# apply to the halves. Cost: p is recomputed twice (2 extra QK^T matmuls).


def _attn_bwd_dv_kernel(qkv_ref, g_ref, dv_ref, *, num_heads: int,
                        head_dim: int, scale: float):
    C = num_heads * head_dim
    x = qkv_ref[...]
    g = g_ref[...]
    for h in range(num_heads):
        lo = h * head_dim
        q = x[:, :, lo : lo + head_dim]
        k = x[:, :, C + lo : C + lo + head_dim]
        gh = g[:, :, lo : lo + head_dim]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        dv = jax.lax.dot_general(p, gh, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dv_ref[:, :, lo : lo + head_dim] = dv.astype(dv_ref.dtype)


def _attn_bwd_dqdk_kernel(qkv_ref, g_ref, dqk_ref, *, num_heads: int,
                          head_dim: int, scale: float):
    C = num_heads * head_dim
    x = qkv_ref[...]
    g = g_ref[...]
    for h in range(num_heads):
        lo = h * head_dim
        q = x[:, :, lo : lo + head_dim]
        k = x[:, :, C + lo : C + lo + head_dim]
        v = x[:, :, 2 * C + lo : 2 * C + lo + head_dim]
        gh = g[:, :, lo : lo + head_dim]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)  # f32 (TB, N, N)
        dp = jax.lax.dot_general(gh, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(v.dtype)
        dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqk_ref[:, :, lo : lo + head_dim] = dq.astype(dqk_ref.dtype)
        dqk_ref[:, :, C + lo : C + lo + head_dim] = dk.astype(dqk_ref.dtype)


def _attention_bwd_split_impl(qkv: Array, g: Array, num_heads: int,
                              block_b: int, interpret: Optional[bool]) -> Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, threeC = qkv.shape
    C = threeC // 3
    if threeC % (3 * num_heads) != 0:
        raise ValueError(f"num_heads={num_heads} must divide C={C}")
    dh = C // num_heads
    block_b = min(block_b, B)
    in_specs = [
        pl.BlockSpec((block_b, N, threeC), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, N, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dqk = pl.pallas_call(
        functools.partial(_attn_bwd_dqdk_kernel, num_heads=num_heads,
                          head_dim=dh, scale=dh ** -0.5),
        grid=(pl.cdiv(B, block_b),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, N, 2 * C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, 2 * C), qkv.dtype),
        interpret=interpret,
    )(qkv, g)
    dv = pl.pallas_call(
        functools.partial(_attn_bwd_dv_kernel, num_heads=num_heads,
                          head_dim=dh, scale=dh ** -0.5),
        grid=(pl.cdiv(B, block_b),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        interpret=interpret,
    )(qkv, g)
    # concat, not scatter: Mosaic has no scatter lowering (CLAUDE.md), and
    # [dq|dk] already share the dqdk kernel's output tile
    return jnp.concatenate([dqk, dv], axis=-1)


def make_trainable_attention(num_heads: int, block_b: int = 8,
                             interpret: Optional[bool] = None,
                             bwd_mode: Optional[str] = None):
    """Differentiable fused attention (no gate, no dropout): forward is the
    fused kernel; backward recomputes p flash-style. The residual is just the
    qkv activations — O(B N C) instead of O(B H N^2).

    bwd_mode: 'monolithic' (default; one kernel at block_b//2 — the measured
    105.5 ms/step training path) or 'split' (dv and dq/dk as separate kernels,
    each at the forward's block_b — VERDICT r3 #7). Defaults from
    DEVIT_ATTN_BWD so the experiment can drive the REAL training step without
    code changes."""
    if bwd_mode is None:
        import os

        bwd_mode = os.environ.get("DEVIT_ATTN_BWD", "monolithic")
    if bwd_mode not in ("monolithic", "split"):
        raise ValueError(f"unknown bwd_mode {bwd_mode!r}")
    return _make_trainable_attention(num_heads, block_b, interpret, bwd_mode)


@functools.lru_cache(maxsize=None)
def _make_trainable_attention(num_heads: int, block_b: int,
                              interpret: Optional[bool], bwd_mode: str):
    @jax.custom_vjp
    def attn(qkv: Array) -> Array:
        return fused_attention(qkv, None, num_heads=num_heads,
                               block_b=block_b, interpret=interpret)

    def fwd(qkv):
        return attn(qkv), qkv

    def bwd(qkv, g):
        if bwd_mode == "split":
            return (_attention_bwd_split_impl(qkv, g, num_heads, block_b,
                                              interpret),)
        # the monolithic backward kernel holds ~2.5x the forward's VMEM
        # working set (p, dp, ds in f32 plus dqkv) — halve the batch tile
        return (_attention_bwd_impl(qkv, g, num_heads, max(block_b // 2, 2),
                                    interpret),)

    attn.defvjp(fwd, bwd)
    return attn
