"""Measurement: stacked common-geometry vmapped ensemble vs the deployed
ragged-sequential serving path at bs256 (VERDICT r2 next #8).

compact_divisions pads every division to the max-over-divisions kept
geometry so ONE vmapped program runs all four; the deployed path compiles
four exact-width programs and runs them sequentially in one jit. The
stacked variant trades padding FLOPs for whole-program scheduling.

Run on TPU (alone — concurrent CPU load corrupts tunnel timings):
python scripts/probe_stacked.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench


from bench import time_fn as timeit  # the one shared timing recipe


def main():
    from devit_tpu.runtime import setup_runtime

    setup_runtime()
    from devit_tpu.core.compact import compact_divisions
    from devit_tpu.models.ensemble import EnsMLP, stack_division_params
    from devit_tpu.models.vit import VisionTransformer

    batch = 256
    # identical policies/weights to bench.build()
    fwd, ens_vars, cms = bench.build()
    img = jax.random.normal(jax.random.key(2), (batch, 224, 224, 3), jnp.bfloat16)
    ms_ragged = timeit(fwd, ens_vars, img)
    print(f"ragged-sequential (deployed): {ms_ragged:.1f} ms "
          f"-> {batch / ms_ragged * 1e3:.0f} img/s")

    # the same params/gates the deployed bench compacts (shared builder)
    num_div = 4
    cfg, params, gates_list = bench.build_inputs(num_div)
    padded, common_cfg = compact_divisions(params, gates_list, cfg)
    stacked = stack_division_params(padded)
    stacked = jax.tree_util.tree_map(lambda a: jax.device_put(jnp.asarray(a)), stacked)
    print(f"common geometry: heads {common_cfg.num_heads}/{cfg.num_heads}, "
          f"hidden {common_cfg.hidden_override}/{cfg.hidden_dim}")

    ens = EnsMLP(num_classes=100, sub_size=cfg.embed_dim, num_divisions=num_div,
                 teacher_size=768, family="deit")

    for pallas in (True, False):
        pad_model = VisionTransformer(common_cfg, use_pallas=pallas,
                                      fast_math=True)

        def stacked_fwd(sp, ev, im):
            out = jax.vmap(
                lambda pp: pad_model.apply({"params": pp}, im, features_only=True)
            )(sp)
            return ens.apply(ev, out.cls_feat, out.dist_feat).logits

        try:
            jf = jax.jit(stacked_fwd)
            ms_stacked = timeit(jf, stacked, ens_vars, img)
            print(f"stacked common-geometry vmap (pallas={pallas}): "
                  f"{ms_stacked:.1f} ms -> {batch / ms_stacked * 1e3:.0f} img/s "
                  f"({ms_stacked / ms_ragged:.2f}x the ragged time)")
        except Exception as e:
            print(f"stacked vmap (pallas={pallas}) failed: {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
