"""Split-backward attention kernel experiment (VERDICT r3 #7): dv in one
Pallas kernel, dq/dk in a second, each at the forward's block_b — vs the
monolithic backward pinned at block_b=4 by VMEM (CLAUDE.md: block_b=8/16
failed to compile monolithically). Isolated kernel timings at the stage-2
training shape here; the decision metric is `devit bench --train` with
DEVIT_ATTN_BWD={monolithic,split}.

Run ALONE on the chip: python scripts/probe_split_bwd.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import time_fn

R = 4  # distinct slices per jit (dispatch amortization without CSE)


def main():
    from devit_tpu.runtime import setup_runtime

    setup_runtime()
    from devit_tpu.kernels.attention import (
        _attention_bwd_impl, _attention_bwd_split_impl,
    )

    H, N, C = 6, 198, 384  # full-width stage-2 training shape
    B = 256
    dev = jax.devices()[0]
    qkv = jax.device_put(jax.random.normal(
        jax.random.key(0), (R, B, N, 3 * C), jnp.bfloat16), dev)
    g = jax.device_put(jax.random.normal(
        jax.random.key(1), (R, B, N, C), jnp.bfloat16), dev)

    def make(impl, bb):
        def prog(qkv, g):
            return jnp.stack([impl(qkv[i], g[i], H, bb, None)
                              .astype(jnp.float32).sum() for i in range(R)])
        return jax.jit(prog)

    # FLOPs of the monolithic backward per slice: 5 NxN-class contractions
    # (QK^T recompute, dv, dp, dq, dk) x H heads
    gflop = R * B * H * 5 * 2 * N * N * (C // H) / 1e9
    for label, impl, bb in [
        ("monolithic bb=4 (current)", _attention_bwd_impl, 4),
        ("monolithic bb=8", _attention_bwd_impl, 8),
        ("split bb=4", _attention_bwd_split_impl, 4),
        ("split bb=8", _attention_bwd_split_impl, 8),
        ("split bb=16", _attention_bwd_split_impl, 16),
    ]:
        try:
            t = time_fn(make(impl, bb), qkv, g)
            extra = " (6 contractions)" if impl is _attention_bwd_split_impl else ""
            print(f"{label}: {t:7.2f} ms  {gflop / t:5.1f} TFLOPS-equiv{extra}",
                  flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # on-chip numerics: split vs monolithic at real shape
    a = np.asarray(jax.device_get(
        _attention_bwd_split_impl(qkv[0], g[0], H, 8, None)), np.float32)
    b = np.asarray(jax.device_get(
        _attention_bwd_impl(qkv[0], g[0], H, 4, None)), np.float32)
    rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
    print(f"on-chip split-vs-monolithic rel max diff: {rel:.5f}", flush=True)


if __name__ == "__main__":
    main()
