"""Per-division serving times -> measured multi-chip projection.

The deployment topology (parallel/serve.py) commits each compact division to
its own chip and ships only the (B, C) token pairs to the fusion chip, so
D-chip throughput is batch / (max_d(division ms) + fusion ms + transfer).
This probe measures each division's compact program ALONE at bs256, plus the
EnsMLP fusion alone, on the one real chip — the per-chip numbers the
projection needs (ICI transfer of 2*(B,384) bf16 tokens = ~0.4 MB is
negligible at ICI bandwidths).

Run alone on the chip: python scripts/probe_division_times.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from bench import time_fn


def main():
    from devit_tpu.runtime import setup_runtime

    setup_runtime()
    from devit_tpu.models.compact_vit import compact_forward
    from devit_tpu.models.ensemble import EnsMLP

    batch = 256
    fwd, ens_vars, cms = bench.build()
    img = jax.random.normal(jax.random.key(2), (batch, 224, 224, 3), jnp.bfloat16)

    ms_full = time_fn(fwd, ens_vars, img)
    print(f"full 4-division sequential: {ms_full:.1f} ms "
          f"({batch / ms_full * 1e3:.0f} img/s)")

    div_ms = []
    for d, cm in enumerate(cms):
        f = jax.jit(lambda x, cm=cm: compact_forward(
            cm, x, patch_size=16, features_only=True))
        ms = time_fn(f, img)
        div_ms.append(ms)
        print(f"division {d} alone: {ms:.2f} ms")

    ens = EnsMLP(num_classes=100, sub_size=384, num_divisions=4,
                 teacher_size=768, family="deit")
    cls_t = jax.random.normal(jax.random.key(3), (4, batch, 384), jnp.bfloat16)
    f_fuse = jax.jit(lambda ev, c, t: ens.apply(ev, c, t).logits)
    ms_fuse = time_fn(f_fuse, ens_vars, cls_t, cls_t)
    print(f"EnsMLP fusion alone: {ms_fuse:.2f} ms")

    worst = max(div_ms)
    proj = batch / (worst + ms_fuse) * 1e3
    print(f"projected 4-chip collaborative serving (max division {worst:.2f} "
          f"+ fusion {ms_fuse:.2f} ms, ICI transfer ~0.4 MB negligible): "
          f"~{proj:.0f} img/s "
          f"({proj / (batch / ms_full * 1e3):.2f}x one chip)")


if __name__ == "__main__":
    main()
