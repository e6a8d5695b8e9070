"""Cross-framework end-to-end parity vs the ACTUAL reference code
(VERDICT r1 missing #4): run /root/reference's engine.train_1epoch_qkv with
the reference's own models/de_vit.py + utils/losses.py on CPU at toy geometry,
and our make_dekd_step on identical data with identical initial weights (via
the .pth converter), then compare the composed training dynamics step by step.

timm/torchvision are not installed in this image, so tests/ref_shim provides
the few timm symbols those modules import (see ref_shim/loader.py).
torch.cuda.synchronize is monkeypatched to a no-op (CPU harness).
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0] + "/ref_shim")
from loader import load_reference  # noqa: E402

from devit_tpu.configs import get_vit_config
from devit_tpu.io.checkpoint import torch_vit_to_params
from devit_tpu.models.vit import VisionTransformer, full_gates
from devit_tpu.train import steps as S
from devit_tpu.train.state import TrainState

GEOM_S = dict(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
              num_classes=5)
GEOM_T = dict(img_size=32, patch_size=8, embed_dim=96, depth=2, num_heads=6,
              num_classes=5)
STEPS = 10
BATCH = 8
LR = 1e-3


class _RecordingScaler:
    """NativeScaler stand-in for CPU: backward + optional clip + step,
    recording the per-step loss (the quantity under comparison)."""

    def __init__(self):
        self.losses = []

    def __call__(self, loss, optimizer, clip_grad=None, parameters=None,
                 create_graph=False):
        self.losses.append(float(loss.detach()))
        loss.backward(create_graph=create_graph)
        if clip_grad:
            torch.nn.utils.clip_grad_norm_(parameters, clip_grad)
        optimizer.step()


def _torch_models(ref_de_vit):
    torch.manual_seed(0)
    student = ref_de_vit.VisionTransformer(
        in_chans=3, distilled=True, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0, **{k: v for k, v in GEOM_S.items()})
    teacher = ref_de_vit.VisionTransformer(
        in_chans=3, distilled=True, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0, **{k: v for k, v in GEOM_T.items()})
    student.train()
    teacher.eval()
    return student, teacher


def _data():
    rng = np.random.default_rng(0)
    images = rng.normal(size=(STEPS, BATCH, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, GEOM_S["num_classes"], size=(STEPS, BATCH))
    return images, labels


def _to_jax_params(torch_model, depth):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return torch_vit_to_params(sd, depth=depth)


def _patch_cpu(monkeypatch):
    """The reference assumes CUDA: torch.cuda.synchronize() in the loop and
    `x.get_device()` (returns -1 on CPU, then `.to(-1)` raises) in the gate
    mul (de_vit.py:43, 78). Neutralize both for the CPU harness."""
    monkeypatch.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
    monkeypatch.setattr(torch.Tensor, "get_device", lambda self: self.device)


def test_dekd_loss_trajectory_matches_reference(monkeypatch):
    ref_engine, ref_de_vit, ref_losses, _ = load_reference()
    _patch_cpu(monkeypatch)

    student_t, teacher_t = _torch_models(ref_de_vit)
    images, labels = _data()

    # ---- reference side: the reference's own hot loop (engine.py:48-140)
    criterion = ref_losses.DistillLoss(
        base_criterion=torch.nn.CrossEntropyLoss(),
        distillation_type="hard", alpha=0.5, tau=1.0)
    opt = torch.optim.AdamW(student_t.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    scaler = _RecordingScaler()
    loader = [
        (torch.from_numpy(images[i].transpose(0, 3, 1, 2)),
         torch.from_numpy(labels[i]))
        for i in range(STEPS)
    ]
    args = types.SimpleNamespace(distillation_inter=True, gama=[0.2, 0.1, 0.3])
    log = types.SimpleNamespace(info=lambda *a, **k: None)
    ref_engine.train_1epoch_qkv(
        student_t, teacher_t, criterion, loader, opt, torch.device("cpu"),
        epoch=0, loss_scaler=scaler, log=log, args=args, max_norm=None,
        model_ema=None, mixup_fn=None)
    assert len(scaler.losses) == STEPS

    # ---- our side: same initial weights via the .pth converter, same batches
    cfg_s = get_vit_config("dedeit", drop_path_rate=0.0, **GEOM_S)
    cfg_t = get_vit_config("deit_base_distilled_patch16_224",
                           drop_path_rate=0.0, **GEOM_T)
    student_j = VisionTransformer(cfg_s, dtype=jnp.float32)
    teacher_j = VisionTransformer(cfg_t, dtype=jnp.float32)

    # fresh torch models (the reference loop trained student_t in place)
    student_t2, teacher_t2 = _torch_models(ref_de_vit)
    s_params = _to_jax_params(student_t2, cfg_s.depth)
    t_params = _to_jax_params(teacher_t2, cfg_t.depth)

    import optax

    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    state = TrainState.create(s_params, tx)
    gates = full_gates(cfg_s)
    step = jax.jit(S.make_dekd_step(
        student_j, teacher_j, gamma=(0.2, 0.1, 0.3), mixup=None, smoothing=0.0,
        distillation_type="hard", distillation_alpha=0.5, distillation_tau=1.0))

    ours = []
    for i in range(STEPS):
        state, metrics = step(state, {"params": t_params}, gates,
                              jnp.asarray(images[i]), jnp.asarray(labels[i]),
                              jax.random.key(i))
        ours.append(float(metrics["loss"]))

    # step 0 pins the composed forward+loss before any optimizer divergence
    assert abs(ours[0] - scaler.losses[0]) < 1e-4, (ours[0], scaler.losses[0])
    # full trajectory: optimizer dynamics must track within float tolerance
    np.testing.assert_allclose(ours, scaler.losses, rtol=5e-3, atol=5e-3)


def test_eval_matches_reference_engine(monkeypatch):
    ref_engine, ref_de_vit, _, _ = load_reference()
    _patch_cpu(monkeypatch)

    student_t, _ = _torch_models(ref_de_vit)
    student_t.eval()
    images, labels = _data()
    loader = [
        (torch.from_numpy(images[i].transpose(0, 3, 1, 2)),
         torch.from_numpy(labels[i]))
        for i in range(3)
    ]
    ref_stats = ref_engine.evaluate(loader, student_t, torch.device("cpu"))

    cfg_s = get_vit_config("dedeit", drop_path_rate=0.0, **GEOM_S)
    student_j = VisionTransformer(cfg_s, dtype=jnp.float32)
    params = _to_jax_params(student_t, cfg_s.depth)
    eval_step = jax.jit(S.make_eval_step(student_j))
    totals = {"loss_sum": 0.0, "top1": 0, "top5": 0, "count": 0}
    for i in range(3):
        out = jax.device_get(eval_step({"params": params}, None,
                                       jnp.asarray(images[i]),
                                       jnp.asarray(labels[i])))
        for k in totals:
            totals[k] += float(out[k])
    acc1 = 100.0 * totals["top1"] / totals["count"]
    acc5 = 100.0 * totals["top5"] / totals["count"]
    assert abs(acc1 - float(ref_stats["acc1"])) < 1e-6
    assert abs(acc5 - float(ref_stats["acc5"])) < 1e-6
    assert abs(totals["loss_sum"] / totals["count"] - float(ref_stats["loss"])) < 1e-4
