"""block_b sweep for the serving attention kernel AT BS256 (the deployed
optimum). The round-2 sweep ran at bs512 (flat: 48.07/48.09/47.60 ms per
division for 8/16/32); bs256 schedules differently (attention is 1.67x more
per-image-efficient there), so re-check once. Run alone on the chip."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from devit_tpu.kernels import attention as A


from bench import time_fn as timeit  # the one shared timing recipe


def main():
    from devit_tpu.runtime import setup_runtime

    setup_runtime()
    batch = 256
    img = jax.random.normal(jax.random.key(2), (batch, 224, 224, 3), jnp.bfloat16)

    orig = A.fused_attention
    for bb in (4, 8, 16, 32):
        A.fused_attention = functools.partial(orig, block_b=bb)
        try:
            fwd, ens_vars, cms = bench.build()
            ms = timeit(fwd, ens_vars, img)
            print(f"block_b={bb}: {ms:.1f} ms -> {batch/ms*1e3:.0f} img/s")
        except Exception as e:
            print(f"block_b={bb}: FAILED {type(e).__name__}: {str(e)[:150]}")
        finally:
            A.fused_attention = orig


if __name__ == "__main__":
    main()
