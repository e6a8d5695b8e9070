"""Fused Pallas int8 quant-matmul vs bf16 at serving shapes (VERDICT r3 #6 /
perf roadmap #1). The XLA-level int8 path lost 2x to bf16 because the
quantize/rescale epilogues don't fuse; this kernel fuses them. Hardware
headroom bound: int8 MXU 184 TOPS vs the 181 TFLOPS the bf16 weight chain
already sustains at these shapes — expect <=1.02x at best (the point is to
close the roadmap item with a measurement either way).

Run ALONE on the chip: python scripts/probe_int8_fused.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import time_fn

R = 6  # distinct row-slices per jit: amortizes the ~0.7 ms tunnel dispatch
       # without XLA CSE collapsing repeated identical matmuls


def main():
    from devit_tpu.runtime import setup_runtime

    setup_runtime()
    from devit_tpu.kernels.quant import (
        QuantizedLinear, dynamic_int8_matmul, fused_int8_matmul,
        quantize_weight,
    )

    M = 256 * 198  # bs256 serving rows
    dev = jax.devices()[0]
    for name, K, N in [("qkv", 384, 1152), ("fc1", 384, 1536),
                       ("fc2", 1536, 384)]:
        x3 = jax.device_put(jax.random.normal(
            jax.random.key(0), (R, M, K), jnp.bfloat16), dev)
        w = jax.random.normal(jax.random.key(1), (K, N), jnp.float32) * 0.02
        b = jax.random.normal(jax.random.key(2), (N,), jnp.float32) * 0.01
        q = quantize_weight(w, b)
        wq = jax.device_put(q.w_q, dev)
        ws = jax.device_put(q.w_scale, dev)
        bias = jax.device_put(b, dev)
        wb = jax.device_put(w.astype(jnp.bfloat16), dev)
        bb = jax.device_put(b.astype(jnp.bfloat16), dev)
        gflop = 2 * M * K * N * R / 1e9

        def bf16_prog(x3, wb, bb):
            return jnp.stack([(x3[i] @ wb + bb).astype(jnp.float32).sum()
                              for i in range(R)])

        def xla_prog(x3, wq, ws, bias):
            qq = QuantizedLinear(wq, ws, bias)
            return jnp.stack([dynamic_int8_matmul(x3[i], qq)
                              .astype(jnp.float32).sum() for i in range(R)])

        def make_fused(block_m):
            def prog(x3, wq, ws, bias):
                qq = QuantizedLinear(wq, ws, bias)
                return jnp.stack([fused_int8_matmul(x3[i], qq, block_m=block_m)
                                  .astype(jnp.float32).sum() for i in range(R)])
            return prog

        t = time_fn(jax.jit(bf16_prog), x3, wb, bb)
        print(f"{name} ({M}x{K}x{N}) bf16:      {t:7.2f} ms  "
              f"{gflop / t:6.1f} TFLOPS", flush=True)
        t = time_fn(jax.jit(xla_prog), x3, wq, ws, bias)
        print(f"{name} ({M}x{K}x{N}) int8 XLA:  {t:7.2f} ms  "
              f"{gflop / t:6.1f} TOPS", flush=True)
        for bm in (256, 512, 1024):
            try:
                t = time_fn(jax.jit(make_fused(bm)), x3, wq, ws, bias)
                print(f"{name} ({M}x{K}x{N}) int8 fused bm={bm}: {t:7.2f} ms  "
                      f"{gflop / t:6.1f} TOPS", flush=True)
            except Exception as e:
                print(f"{name} int8 fused bm={bm}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # on-chip numerics: fused vs the XLA-level path at one shape
    x = jax.random.normal(jax.random.key(3), (1024, 384), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(4), (384, 1536), jnp.float32) * 0.02
    q = quantize_weight(w, None)
    a = np.asarray(jax.device_get(fused_int8_matmul(x, q)), np.float32)
    bxla = np.asarray(jax.device_get(dynamic_int8_matmul(x, q)), np.float32)
    rel = np.abs(a - bxla).max() / max(np.abs(bxla).max(), 1e-6)
    print(f"on-chip fused-vs-XLA int8 rel max diff: {rel:.5f}", flush=True)


if __name__ == "__main__":
    main()
