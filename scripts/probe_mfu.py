"""MFU / FLOPs reconciliation probe (VERDICT r2 missing #2, weak #6).

Question: the round-2 component budget (bs256: 35.7 ms weights / 12.3 ms
attention / ~6 ms LN+rest of 54.1 ms) and the executed 21.5 GFLOPs/img of
weight matmuls cannot both be right — they imply ~154 TFLOPS on the weight
slice, above the 118-125 TFLOPS measured in-program matmul ceiling. Either
the identity-ablation attribution was off, or these shapes genuinely exceed
the 8k^3-derived "peak" at bs256.

This probe measures, on the real chip at bs256:
  A. full deployed serving forward          (the bench number)
  B. weights-only program: the same four compact models with the attention
     contractions replaced by a q-slice (ablation style, own program)
  C. matmul-only program: B with LayerNorm replaced by identity and GELU
     removed — as close to "just the weight matmuls" as a real program gets
  D. isolated replay of the exact per-layer weight-matmul chain (qkv, proj,
     fc1, fc2 as one jit, all four divisions) — no residuals, no embedding
plus the executed-FLOPs counts for each, and prints implied TFLOPS per slice.

Run on TPU: python scripts/probe_mfu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from devit_tpu.models.vit import _layer_norm
from devit_tpu.models import compact_vit as CV


from bench import time_fn as timeit  # the one shared timing recipe


def weights_only_forward(cms, img, *, ln=True, gelu=True):
    """Serving forward with attention replaced by a q-slice (zero-FLOP
    stand-in) and optional LN/GELU removal."""
    feats = []
    for cm in cms:
        B = img.shape[0]
        g = 224 // 16
        xp = img.reshape(B, g, 16, g, 16, 3).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(B, g * g, -1).astype(jnp.bfloat16)
        t = jnp.dot(xp, cm.embed["patch_kernel"].astype(jnp.bfloat16))
        t = t + cm.embed["patch_bias"].astype(jnp.bfloat16)
        toks = [jnp.broadcast_to(cm.embed["cls_token"].astype(t.dtype), (B, 1, t.shape[-1])),
                jnp.broadcast_to(cm.embed["dist_token"].astype(t.dtype), (B, 1, t.shape[-1]))]
        t = jnp.concatenate(toks + [t], axis=1) + cm.embed["pos_embed"].astype(t.dtype)
        for lp in cm.layers:
            kh = lp["num_heads"]
            h = (_layer_norm(t, lp["norm1"]["scale"], lp["norm1"]["bias"], cm.eps, jnp.bfloat16)
                 if ln else t)
            qkv = jnp.dot(h, lp["qkv_kernel"].astype(t.dtype)) + lp["qkv_bias"].astype(t.dtype)
            att = qkv[..., : kh * cm.head_dim]  # q-slice ablation stand-in
            att = jnp.dot(att, lp["proj_kernel"].astype(t.dtype)) + lp["proj_bias"].astype(t.dtype)
            t = t + att
            h = (_layer_norm(t, lp["norm2"]["scale"], lp["norm2"]["bias"], cm.eps, jnp.bfloat16)
                 if ln else t)
            h = jnp.dot(h, lp["fc1_kernel"].astype(t.dtype)) + lp["fc1_bias"].astype(t.dtype)
            if gelu:
                h = jax.nn.gelu(h, approximate=True)
            h = jnp.dot(h, lp["fc2_kernel"].astype(t.dtype)) + lp["fc2_bias"].astype(t.dtype)
            t = t + h
        feats.append(t[:, 0])
    return feats


def matmul_chain(cms, x0):
    """D: bare weight-matmul replay — (B*N, C) activations through every
    layer's qkv/proj/fc1/fc2, chained so nothing is dead-code-eliminated."""
    t = x0
    for cm in cms:
        for lp in cm.layers:
            kh = lp["num_heads"]
            qkv = jnp.dot(t, lp["qkv_kernel"].astype(t.dtype))
            att = qkv[..., : kh * cm.head_dim]
            t = jnp.dot(att, lp["proj_kernel"].astype(t.dtype)) + t
            h = jnp.dot(t, lp["fc1_kernel"].astype(t.dtype))
            t = jnp.dot(h, lp["fc2_kernel"].astype(t.dtype)) + t
    return t


def main():
    from devit_tpu.runtime import setup_runtime

    setup_runtime()
    batch = 256
    fwd, ens_vars, cms = bench.build()
    fl = bench.executed_gflops_per_image(cms)
    img = jax.random.normal(jax.random.key(2), (batch, 224, 224, 3), jnp.bfloat16)

    ms_a = timeit(fwd, ens_vars, img)
    print(f"A full serving: {ms_a:.1f} ms  "
          f"(total {fl['total']:.2f} G/img -> {fl['total']*batch/ms_a:.1f} TFLOPS eff)")

    f_b = jax.jit(lambda im: weights_only_forward(cms, im))
    ms_b = timeit(f_b, img)
    print(f"B weights-only (no attention): {ms_b:.1f} ms -> "
          f"weights {fl['weights']:.2f} G/img => {fl['weights']*batch/ms_b:.1f} GF/ms = "
          f"{fl['weights']*batch/ms_b:.1f} TFLOPS")

    f_c = jax.jit(lambda im: weights_only_forward(cms, im, ln=False, gelu=False))
    ms_c = timeit(f_c, img)
    print(f"C matmuls+residuals only: {ms_c:.1f} ms -> {fl['weights']*batch/ms_c:.1f} TFLOPS")

    x0 = jax.random.normal(jax.random.key(3), (batch * 198, 384), jnp.bfloat16)
    f_d = jax.jit(lambda x: matmul_chain(cms, x))
    ms_d = timeit(f_d, x0)
    print(f"D bare matmul chain: {ms_d:.1f} ms -> {fl['weights']*batch/ms_d:.1f} TFLOPS")

    xla = bench.xla_cost_gflops(fwd, ens_vars, batch)
    print(f"XLA cost-analysis dots: {xla} G/img vs analytic weights {fl['weights']:.2f}")

    print(f"implied attention slice: A-B = {ms_a - ms_b:.1f} ms for "
          f"{fl['attention']:.2f} G/img -> "
          f"{fl['attention']*batch/max(ms_a-ms_b,1e-9):.1f} TFLOPS")


if __name__ == "__main__":
    main()
