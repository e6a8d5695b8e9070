"""Training-step MFU (round 3): completes the perf accounting story —
serving has measured MFU (BASELINE.md); this measures the stage-2 train step
the same way.

Measured quantities (one v5e chip, bs256, full dedeit, remat on):
  A. the real stage-2 train step (pallas custom-VJP attention, mixup, EMA,
     AdamW) — reproduces the 105.5 ms/step number
  B. fwd+bwd of the bare full-width weight-matmul chain (qkv/proj/fc1/fc2
     x12) — the achievable MXU rate for the training matmuls
with analytic matmul FLOPs: full remat makes the weight-matmul work
4x forward (fwd + remat re-forward + 2x backward).

Run alone on the chip: python scripts/probe_train_mfu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from bench import time_fn as timeit  # the one shared timing recipe


def forward_matmul_gflops_per_img(seq=198, C=384, hidden=1536, heads=6,
                                  num_classes=100, patches=196):
    dh = C // heads
    f = 2 * patches * (16 * 16 * 3) * C           # patch embed
    per_layer = (2 * seq * C * 3 * C              # qkv
                 + 2 * seq * C * C                # proj
                 + 2 * seq * C * hidden * 2)      # fc1+fc2
    attn = 12 * (2 * seq * seq * dh * heads * 2)
    f += 12 * per_layer + 2 * C * num_classes * 2
    return f / 1e9, attn / 1e9


def main():
    from devit_tpu.runtime import setup_runtime

    setup_runtime()
    from devit_tpu.cli import common as C_
    from devit_tpu.data.mixup import MixupConfig
    from devit_tpu.train import steps as S
    from devit_tpu.train.optim import OptimConfig, make_optimizer
    from devit_tpu.train.state import TrainState

    batch = 256
    args = type("A", (), dict(model="dedeit", input_size=224, patch_size=16,
                              drop=0.0, drop_path=0.1, embed_dim=None,
                              depth=None, num_heads=None, use_pallas=True,
                              dtype="bfloat16"))()
    model = C_.build_model("dedeit", 25, args)
    x0 = jnp.zeros((2, 224, 224, 3), jnp.bfloat16)
    params = model.init(jax.random.key(0), x0)["params"]
    tx = make_optimizer(OptimConfig(lr=5e-4, epochs=100), 100)
    state = TrainState.create(params, tx, use_ema=True)
    mix = MixupConfig(mixup_alpha=0.8, cutmix_alpha=1.0, prob=1.0,
                      switch_prob=0.5, label_smoothing=0.1, num_classes=25)
    step = jax.jit(S.make_stage2_step(model, None, mixup=mix, smoothing=0.1,
                                      distillation_type="none"))
    img = jax.random.normal(jax.random.key(1), (batch, 224, 224, 3), jnp.bfloat16)
    lab = jnp.zeros((batch,), jnp.int32)

    def run_step(st, im, lb):
        st2, m = step(st, None, im, lb, jax.random.key(2))
        return m["loss"]

    ms_a = timeit(run_step, state, img, lab)
    wg, ag = forward_matmul_gflops_per_img()
    train_g = 4 * wg + 4.5 * ag  # fwd + remat refwd + 2x bwd (attn bwd ~2.5x)
    print(f"A stage-2 train step: {ms_a:.1f} ms/step = {batch/ms_a*1e3:.0f} img/s")
    print(f"  analytic matmul work ~{train_g:.1f} G/img "
          f"-> {train_g*batch/ms_a:.1f} TFLOPS = "
          f"{train_g*batch/ms_a/197:.0%} MFU")

    # B: achievable rate for the training matmuls: grad of the bare chain
    W = {f"l{i}": {
        "qkv": jax.random.normal(jax.random.key(10 + i), (384, 1152), jnp.bfloat16) * 0.02,
        "proj": jax.random.normal(jax.random.key(30 + i), (384, 384), jnp.bfloat16) * 0.02,
        "fc1": jax.random.normal(jax.random.key(50 + i), (384, 1536), jnp.bfloat16) * 0.02,
        "fc2": jax.random.normal(jax.random.key(70 + i), (1536, 384), jnp.bfloat16) * 0.02,
    } for i in range(12)}
    xa = jax.random.normal(jax.random.key(3), (batch * 198, 384), jnp.bfloat16)

    def chain(w, x):
        t = x
        for i in range(12):
            q = jnp.dot(t, w[f"l{i}"]["qkv"])
            t = jnp.dot(q[:, :384], w[f"l{i}"]["proj"]) + t
            h = jnp.dot(t, w[f"l{i}"]["fc1"])
            t = jnp.dot(h, w[f"l{i}"]["fc2"]) + t
        return jnp.sum(t.astype(jnp.float32))

    g = jax.jit(jax.grad(chain))
    ms_b = timeit(g, W, xa)
    per_layer = (2 * 198 * 384 * 1152 + 2 * 198 * 384 * 384
                 + 2 * 198 * 384 * 1536 * 2)
    chain_g = 3 * 12 * per_layer * batch / 1e9  # fwd+2x bwd, no remat
    print(f"B bare matmul chain fwd+bwd: {ms_b:.1f} ms "
          f"-> {chain_g/ms_b:.1f} TFLOPS ({chain_g/ms_b/197:.0%} of spec)")


if __name__ == "__main__":
    main()
