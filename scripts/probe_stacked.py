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
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench


def timeit(fn, *args, iters=5, repeats=3):
    reduce_ = jax.jit(lambda outs: sum(jnp.asarray(o, jnp.float32).sum()
                                       for o in jax.tree_util.tree_leaves(outs)))
    jax.device_get(reduce_([fn(*args) for _ in range(iters)]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.device_get(reduce_(outs))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    from devit_tpu.runtime import setup_runtime

    setup_runtime()
    from devit_tpu.configs import get_vit_config
    from devit_tpu.core.compact import compact_divisions
    from devit_tpu.core.rank import build_gates
    from devit_tpu.core.shrink import screen
    from devit_tpu.models.ensemble import EnsMLP, stack_division_params
    from devit_tpu.models.vit import VisionTransformer

    batch = 256
    # identical policies/weights to bench.build()
    fwd, ens_vars, cms = bench.build()
    img = jax.random.normal(jax.random.key(2), (batch, 224, 224, 3), jnp.bfloat16)
    ms_ragged = timeit(fwd, ens_vars, img)
    print(f"ragged-sequential (deployed): {ms_ragged:.1f} ms "
          f"-> {batch / ms_ragged * 1e3:.0f} img/s")

    # rebuild the same params/gates (bench.build internals, same seeds)
    num_div = 4
    cfg = get_vit_config("dedeit", num_classes=25)
    rngnp = np.random.default_rng(0)
    policies = [screen(0.3 * 9.19, 1, 0.0, 0.9, cfg.depth, seed=42 + i)[0]
                for i in range(num_div)]
    n_rank = np.stack([rngnp.permutation(cfg.hidden_dim) for _ in range(cfg.depth)])
    h_rank = np.stack([rngnp.permutation(cfg.num_heads) for _ in range(cfg.depth)])
    gates_list = [build_gates(n_rank, h_rank, p[: cfg.depth], p[cfg.depth:])
                  for p in policies]
    model = VisionTransformer(cfg)
    sample = jnp.zeros((2, 224, 224, 3), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.key(0), sample)["params"]

    def make_params(seed):
        rng = np.random.default_rng(seed)
        return jax.tree_util.tree_map(
            lambda s: rng.normal(scale=0.02, size=s.shape).astype(np.float32),
            shapes)

    params = [make_params(i) for i in range(num_div)]
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
