"""Headline benchmark: 4-division dedeit ensemble collaborative inference
(the reference's evaluate_ens_disjoint path, engine.py:212-242) — images/sec
on one TPU chip, bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the BASELINE.md target of 10,000 img/s/chip on v5e.

Config mirrors the canonical CIFAR-100 workload (BASELINE.md): 4 x dedeit
(ViT-S geometry, 224x224, 25 classes each — heads never materialised in the
ensemble path) + EnsMLP fusion to 100 classes with teacher_size 768. The
divisions run as ONE stacked/vmapped computation, not 4 sequential calls
(the reference loops sequentially, ensemble_models.py:33).

Measurement note: on this platform block_until_ready() does not reliably wait,
so timing uses a pre-compiled reducer whose value depends on every iteration's
output and a single device_get sync; reported number is the best of 3 runs.
"""

import json
import time

import jax
import jax.numpy as jnp


def build():
    from devit_tpu.models import create_vit
    from devit_tpu.models.ensemble import EnsMLP, ensemble_forward, init_multivit

    num_div = 4
    # inference-speed configuration: Pallas fused attention + bf16 norm/softmax
    model = create_vit("dedeit", num_classes=25, use_pallas=True, fast_math=True)
    ens = EnsMLP(num_classes=100, sub_size=model.cfg.embed_dim,
                 num_divisions=num_div, teacher_size=768, family="deit")

    sample = jnp.zeros((2, 224, 224, 3), jnp.bfloat16)
    stacked = init_multivit(model, jax.random.key(0), sample, num_div)
    cls_t = jnp.zeros((num_div, 2, model.cfg.embed_dim))
    ens_vars = ens.init(jax.random.key(1), cls_t, cls_t)

    # NOTE: params must be jit *arguments*, not closure constants — closing
    # over them embeds ~88M floats into the program as constants and stalls
    # compilation.
    def fwd(sv, ev, images):
        return ensemble_forward(model, ens, sv, ev, images).logits

    return jax.jit(fwd), stacked, ens_vars


def measure(fwd, stacked, ens_vars, batch: int, iters: int = 5, repeats: int = 3) -> float:
    images = jax.random.normal(jax.random.key(2), (batch, 224, 224, 3), jnp.bfloat16)
    reduce_ = jax.jit(lambda outs: sum(o.astype(jnp.float32).sum() for o in outs))
    # warmup + compile both programs
    jax.device_get(reduce_([fwd(stacked, ens_vars, images) for _ in range(iters)]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fwd(stacked, ens_vars, images) for _ in range(iters)]
        jax.device_get(reduce_(outs))
        best = min(best, (time.perf_counter() - t0) / iters)
    return batch / best


def main():
    fwd, stacked, ens_vars = build()
    best, best_batch = 0.0, 0
    for batch in (512,):
        try:
            ips = measure(fwd, stacked, ens_vars, batch)
        except Exception:
            break
        if ips > best:
            best, best_batch = ips, batch
    result = {
        "metric": "images/sec/chip 4-division dedeit ensemble inference (bf16, bs=%d)" % best_batch,
        "value": round(best, 1),
        "unit": "img/s",
        "vs_baseline": round(best / 10000.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
