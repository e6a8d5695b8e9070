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


from tests.ref_shim.harness import RecordingScaler as _RecordingScaler


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
    sd = {k: v.detach().numpy().copy() for k, v in torch_model.state_dict().items()}
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

    # 9 classes, NOT the shared 5-class GEOM_S: with 5 classes the top-5
    # window covers every class and acc5 is tautologically 100.0 on both
    # sides — the assertion would pass under any top-5 counter bug
    geom = dict(GEOM_S, num_classes=9)
    torch.manual_seed(0)
    student_t = ref_de_vit.VisionTransformer(
        in_chans=3, distilled=True, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0, **geom)
    student_t.eval()
    images, _ = _data()
    labels = np.random.default_rng(1).integers(0, 9, size=images.shape[:2])
    loader = [
        (torch.from_numpy(images[i].transpose(0, 3, 1, 2)),
         torch.from_numpy(labels[i]))
        for i in range(3)
    ]
    ref_stats = ref_engine.evaluate(loader, student_t, torch.device("cpu"))

    cfg_s = get_vit_config("dedeit", drop_path_rate=0.0, **geom)
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
    assert acc5 < 100.0, "9-class fixture must make acc5 discriminating"
    assert abs(acc1 - float(ref_stats["acc1"])) < 1e-6
    assert abs(acc5 - float(ref_stats["acc5"])) < 1e-6
    assert abs(totals["loss_sum"] / totals["count"] - float(ref_stats["loss"])) < 1e-4


# ------------------------------------------------- stage-5 ensemble parity


def _ref_ensemble_models(monkeypatch):
    """Reference MultiViT+EnsMLP at toy geometry: register a toy 'dedeit'
    factory in the shim timm registry so MultiViT's hardcoded create_model
    call (ensemble_models.py:22-27) builds small backbones."""
    _, ref_de_vit, _, _ = load_reference()
    import models.ensemble_models as ref_ens_models
    from timm.models import registry as shim_registry

    def toy_dedeit(pretrained=False, **kwargs):
        kwargs.pop("drop_block_rate", None)
        return ref_de_vit.VisionTransformer(
            in_chans=3, distilled=True, attn_drop_rate=0.0,
            **{**GEOM_S, "num_classes": kwargs.get("num_classes", 5),
               "embed_dim": 64},
            drop_rate=kwargs.get("drop_rate", 0.0),
            drop_path_rate=kwargs.get("drop_path_rate", 0.0))

    shim_registry._model_entrypoints["toy_dedeit"] = toy_dedeit
    torch.manual_seed(1)
    multi = ref_ens_models.MultiViT(model="toy_dedeit", drop=0, drop_path=0.0,
                                    num_classes_list=[5, 5], num_div=2)
    ens = ref_ens_models.EnsMLP(model="toy_dedeit", num_class=10, sub_size=64,
                                num_classes_list=[5, 5], teacher_size=96)
    return multi, ens


def _our_ensemble_from_torch(multi_t, ens_t):
    from devit_tpu.models.ensemble import EnsMLP as OurEnsMLP
    from devit_tpu.models.ensemble import stack_division_params

    cfg = get_vit_config("dedeit", drop_path_rate=0.0,
                         **{**GEOM_S, "num_classes": 0})
    backbone = VisionTransformer(cfg, dtype=jnp.float32)
    div_params = []
    for bb in multi_t.backbones:
        sd = {k: v.detach().numpy().copy() for k, v in bb.state_dict().items()}
        div_params.append(torch_vit_to_params(sd, depth=cfg.depth))
    stacked = stack_division_params(div_params)

    ens_j = OurEnsMLP(num_classes=10, sub_size=64, num_divisions=2,
                      teacher_size=96, family="deit", dtype=jnp.float32)
    esd = {k: v.detach().numpy().copy() for k, v in ens_t.state_dict().items()}
    ens_params = {
        name: {"kernel": esd[f"{name}.weight"].T, "bias": esd[f"{name}.bias"]}
        for name in ("cls_mlp", "cls_classifier", "dist_mlp", "dist_classifier")
    }
    return backbone, stacked, ens_j, ens_params


def test_ensemble_eval_matches_reference_engine(monkeypatch):
    """evaluate_ens_disjoint — the north-star benchmark path — vs our
    make_ensemble_eval_step on identical weights/data."""
    ref_engine, _, _, _ = load_reference()
    _patch_cpu(monkeypatch)
    multi_t, ens_t = _ref_ensemble_models(monkeypatch)

    images, _ = _data()
    rng = np.random.default_rng(3)
    labels10 = rng.integers(0, 10, size=(3, BATCH))
    loader = [
        (torch.from_numpy(images[i].transpose(0, 3, 1, 2)),
         torch.from_numpy(labels10[i]))
        for i in range(3)
    ]
    ref_stats = ref_engine.evaluate_ens_disjoint(loader, multi_t, ens_t,
                                                 torch.device("cpu"))

    backbone, stacked, ens_j, ens_params = _our_ensemble_from_torch(multi_t, ens_t)
    step = jax.jit(S.make_ensemble_eval_step(backbone, ens_j))
    totals = {"loss_sum": 0.0, "top1": 0, "top5": 0, "count": 0}
    for i in range(3):
        out = jax.device_get(step({"params": stacked}, {"params": ens_params},
                                  None, jnp.asarray(images[i]),
                                  jnp.asarray(labels10[i])))
        for k in totals:
            totals[k] += float(out[k])
    acc1 = 100.0 * totals["top1"] / totals["count"]
    acc5 = 100.0 * totals["top5"] / totals["count"]
    assert abs(acc1 - float(ref_stats["acc1"])) < 1e-6
    assert abs(acc5 - float(ref_stats["acc5"])) < 1e-6
    assert abs(totals["loss_sum"] / totals["count"] - float(ref_stats["loss"])) < 1e-4


def test_ensemble_train_trajectory_matches_reference(monkeypatch):
    """train_1epoch_ens_disjoint (one backward, two optimizers) vs our
    make_ensemble_train_step, distillation 'none', 6 steps."""
    ref_engine, _, _, _ = load_reference()
    _patch_cpu(monkeypatch)
    multi_t, ens_t = _ref_ensemble_models(monkeypatch)
    backbone, stacked, ens_j, ens_params = _our_ensemble_from_torch(multi_t, ens_t)

    steps_n = 6
    images, _ = _data()
    rng = np.random.default_rng(4)
    labels10 = rng.integers(0, 10, size=(steps_n, BATCH))
    loader = [
        (torch.from_numpy(images[i].transpose(0, 3, 1, 2)),
         torch.from_numpy(labels10[i]))
        for i in range(steps_n)
    ]

    class _Crit(torch.nn.Module):  # 'none' branch: criterion(samples, logits, targets)
        def forward(self, inputs, outputs, labels):
            return torch.nn.functional.cross_entropy(outputs, labels)

    opt_bb = torch.optim.AdamW(multi_t.parameters(), lr=1e-3, betas=(0.9, 0.999),
                               eps=1e-8, weight_decay=0.0)
    opt_ens = torch.optim.AdamW(ens_t.parameters(), lr=3e-3, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=0.0)
    scaler = torch.amp.GradScaler("cuda", enabled=False)
    ref_losses_rec = []
    orig_scale = scaler.scale

    def record_scale(loss):
        ref_losses_rec.append(float(loss.detach()))
        return orig_scale(loss)

    scaler.scale = record_scale
    args = types.SimpleNamespace(distillation_type="none")
    log = types.SimpleNamespace(info=lambda *a, **k: None)
    ref_engine.train_1epoch_ens_disjoint(
        multi_t, ens_t, _Crit(), loader, opt_bb, opt_ens, torch.device("cpu"),
        epoch=0, scaler=scaler, args=args, log=log, model_ema=None,
        ens_model_ema=None, mixup_fn=None, max_norm=None)
    assert len(ref_losses_rec) == steps_n

    import optax

    bb_state = TrainState.create(stacked, optax.adamw(1e-3, b1=0.9, b2=0.999,
                                                      eps=1e-8, weight_decay=0.0))
    ens_state = TrainState.create(ens_params, optax.adamw(3e-3, b1=0.9, b2=0.999,
                                                          eps=1e-8, weight_decay=0.0))
    step = jax.jit(S.make_ensemble_train_step(
        backbone, ens_j, None, mixup=None, smoothing=0.0,
        distillation_type="none"))
    ours = []
    for i in range(steps_n):
        bb_state, ens_state, metrics = step(
            bb_state, ens_state, None, None, jnp.asarray(images[i]),
            jnp.asarray(labels10[i]), jax.random.key(i))
        ours.append(float(metrics["loss"]))

    assert abs(ours[0] - ref_losses_rec[0]) < 1e-4, (ours[0], ref_losses_rec[0])
    np.testing.assert_allclose(ours, ref_losses_rec, rtol=5e-3, atol=5e-3)


def test_deit_vit_teacher_forward_matches():
    """models/deit_vit.py — the INTENDED teacher module (never imported by
    the reference's entry scripts, SURVEY §2.3; its multi-output forward is
    the behavior DistillationLoss/EnsLoss rely on via distill_token=True) —
    vs our VisionTransformer on converted weights: eval mean head, train-time
    (cls, dist) logit pair, and the distill_last_cls_token token surface."""
    load_reference()
    import models.deit_vit as ref_deit

    torch.manual_seed(33)
    t = ref_deit.VisionTransformer(
        in_chans=3, distilled=True, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0, **GEOM_S)
    t.eval()
    x = np.random.default_rng(34).normal(size=(3, 32, 32, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref_eval = t(xt).numpy()  # (x + x_dist) / 2
        lt, xc, xd = t(xt, distill_last_cls_token=True)
        ref_cls_tok, ref_dist_tok = lt[0].numpy(), lt[1].numpy()
        ref_cls_log, ref_dist_log = xc.numpy(), xd.numpy()

    cfg = get_vit_config("deit_base_distilled_patch16_224",
                         drop_path_rate=0.0, **GEOM_S)
    ours = VisionTransformer(cfg, dtype=jnp.float32)
    sd = {k: v.detach().numpy().copy() for k, v in t.state_dict().items()}
    params = torch_vit_to_params(sd, depth=cfg.depth)

    out = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out.logits), ref_eval,
                               rtol=2e-4, atol=2e-4)
    # distill_token surface: post-norm (cls, dist) feature tokens + the
    # train-style per-head logits (what DistillationLoss/EnsLoss consume)
    out2 = ours.apply({"params": params}, jnp.asarray(x), distill_token=True,
                      train=True, rngs={"dropout": jax.random.key(0)})
    o_cls_tok, o_dist_tok = out2.last_tokens
    np.testing.assert_allclose(np.asarray(o_cls_tok), ref_cls_tok,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(o_dist_tok), ref_dist_tok,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out2.cls_logits), ref_cls_log,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out2.dist_logits), ref_dist_log,
                               rtol=2e-4, atol=2e-4)


# ------------------------------------------------- stage-3 ranking parity


def test_hsic_ranks_match_reference_imp_rank(monkeypatch):
    """The reference's own core/imp_rank.py (module discovery over the torch
    model, HSIC relevance/redundancy, 0.1/0.9 blend, argsort) vs our
    core/rank.py on identical weights and the same single batch."""
    _, ref_de_vit, _, _ = load_reference()
    _patch_cpu(monkeypatch)
    # HSICLoss(...).cuda() is called unconditionally (imp_rank.py:17-18)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    import core.imp_rank as ref_rank

    student_t, _ = _torch_models(ref_de_vit)
    student_t.eval()
    rng = np.random.default_rng(7)
    x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 5, size=(8,))
    loader = [(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(y))]

    ref_n = ref_rank.mlp_neuron_rank(student_t, loader, mode="cpu")
    ref_h = ref_rank.attn_head_rank(student_t, loader, mode="cpu")

    from devit_tpu.core.rank import attn_head_rank, mlp_neuron_rank

    cfg_s = get_vit_config("dedeit", drop_path_rate=0.0, **GEOM_S)
    student_j = VisionTransformer(cfg_s, dtype=jnp.float32)
    params = _to_jax_params(student_t, cfg_s.depth)
    rank_apply = jax.jit(
        lambda v, xx, g, c: student_j.apply(v, xx, gates=g, capture_rank_stats=c),
        static_argnums=(3,),
    )
    ours_n = mlp_neuron_rank(rank_apply, {"params": params}, jnp.asarray(x))
    ours_h = attn_head_rank(rank_apply, {"params": params}, jnp.asarray(x))

    np.testing.assert_array_equal(np.stack(ref_n), np.asarray(ours_n))
    np.testing.assert_array_equal(np.stack(ref_h), np.asarray(ours_h))


# ------------------------------------------------- CCT family parity


def test_cct_forward_matches_reference_model():
    """Whole-model CCT parity vs the reference's own models/cct.py (conv
    tokenizer + pre-norm encoder + seq-pool + head) on converted weights."""
    load_reference()
    import models.cct as ref_cct

    from devit_tpu.configs import get_cct_config
    from devit_tpu.io.checkpoint import torch_cct_to_params
    from devit_tpu.models.cct import CCT

    torch.manual_seed(2)
    ref = ref_cct.CCT(
        img_size=32, embedding_dim=64, n_conv_layers=2, kernel_size=3,
        stride=1, padding=1, num_layers=2, num_heads=2, mlp_ratio=2.0,
        num_classes=7, dropout=0.0, attention_dropout=0.0,
        stochastic_depth=0.0, positional_embedding="learnable").eval()

    cfg = get_cct_config(
        "cct_2", img_size=32, embed_dim=64, n_conv_layers=2, kernel_size=3,
        stride=1, padding=1, num_layers=2, num_heads=2, mlp_ratio=2.0,
        num_classes=7, dropout=0.0, attention_dropout=0.0,
        stochastic_depth=0.0, positional_embedding="learnable")
    ours = CCT(cfg, dtype=jnp.float32)

    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    params = torch_cct_to_params(sd, num_layers=2, n_conv_layers=2)

    x = np.random.default_rng(5).normal(size=(3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out.logits), ref_logits,
                               rtol=2e-4, atol=2e-4)


def test_cct_backbone_pooled_matches_reference():
    """Headless CCTTransformer backbone (ensemble feature path) parity."""
    load_reference()
    import models.cct as ref_cct

    from devit_tpu.configs import get_cct_config
    from devit_tpu.io.checkpoint import torch_cct_to_params
    from devit_tpu.models.cct import CCT

    torch.manual_seed(3)
    ref = ref_cct.CCT(
        img_size=32, embedding_dim=64, n_conv_layers=1, kernel_size=3,
        stride=1, padding=1, num_layers=2, num_heads=2, mlp_ratio=2.0,
        num_classes=7, dropout=0.0, attention_dropout=0.0,
        stochastic_depth=0.0, positional_embedding="sine",
        backbone=True).eval()

    cfg = get_cct_config(
        "cct_2", img_size=32, embed_dim=64, n_conv_layers=1, kernel_size=3,
        stride=1, padding=1, num_layers=2, num_heads=2, mlp_ratio=2.0,
        num_classes=7, dropout=0.0, attention_dropout=0.0,
        stochastic_depth=0.0, positional_embedding="sine", backbone=True)
    ours = CCT(cfg, dtype=jnp.float32)

    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    params = torch_cct_to_params(sd, num_layers=2, n_conv_layers=1)
    params.pop("positional_emb", None)  # sine PE is computed, not a param

    x = np.random.default_rng(6).normal(size=(3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ref_pooled = (ref_out[0] if isinstance(ref_out, tuple) else ref_out).numpy()
    out = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out.pooled), ref_pooled,
                               rtol=2e-4, atol=2e-4)


def test_cct_ensemble_eval_matches_reference(monkeypatch):
    """The reference's own MultiCCT + EnsembleCCT (ensemble_models.py:93-151)
    scored by its evaluate_ens_disjoint vs our stacked-vmap CCT ensemble eval
    step on converted weights — closes the CCT leg of the stage-5 parity
    (the ViT leg is test_ensemble_eval_matches_reference)."""
    ref_engine, _, _, _ = load_reference()
    _patch_cpu(monkeypatch)
    import models.ensemble_models as ref_ens_models

    torch.manual_seed(21)
    # MultiCCT hardcodes get_decct -> cct_7 (layers 7, heads 4, mlp 2, embed
    # 256); 'decct_3x1' = kernel 3, 1 conv layer; backbone=True
    multi = ref_ens_models.MultiCCT("decct_3x1", num_classes_list=[5, 5],
                                    num_sub_models=2, input_size=32)
    ens_t = ref_ens_models.EnsembleCCT(sub_size=256, teacher_size=96,
                                       num_sub_models=2, num_classes=10)
    multi.eval()
    ens_t.eval()

    rng = np.random.default_rng(22)
    images = rng.normal(size=(3, 8, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 10, size=(3, 8))
    loader = [(torch.from_numpy(images[i].transpose(0, 3, 1, 2)),
               torch.from_numpy(labels[i])) for i in range(3)]

    # REFERENCE BUG (pinned): a backbone CCT returns a bare (B, C) pooled
    # tensor (cct.py:155-157 -> transformers.py:477), but MultiCCT.forward
    # indexes `model.forward(x)[0]` (ensemble_models.py:113) — a stale
    # tuple-return assumption that silently takes the FIRST SAMPLE's feature
    # vector, so evaluate_ens_disjoint crashes on the shape mismatch inside
    # EnsembleCCT. The reference's CCT ensemble cannot run as committed.
    with pytest.raises(RuntimeError, match="cannot be multiplied"):
        ref_engine.evaluate_ens_disjoint(loader, multi, ens_t,
                                         torch.device("cpu"))

    class FixedMultiCCT(torch.nn.Module):
        """MultiCCT with the intended semantics: per-backbone pooled features
        (what EnsembleCCT's stack expects, ensemble_models.py:140)."""

        def __init__(self, models):
            super().__init__()
            self.models = models

        def forward(self, x):
            return [m(x) for m in self.models]

    ref_stats = ref_engine.evaluate_ens_disjoint(loader, FixedMultiCCT(multi.models),
                                                 ens_t, torch.device("cpu"))

    from devit_tpu.configs import get_cct_config
    from devit_tpu.io.checkpoint import torch_cct_to_params
    from devit_tpu.models.cct import CCT
    from devit_tpu.models.ensemble import EnsembleCCT as OurEnsembleCCT
    from devit_tpu.models.ensemble import stack_division_params

    cfg = get_cct_config("cct_7", img_size=32, embed_dim=256, n_conv_layers=1,
                         kernel_size=3, num_layers=7, num_heads=4,
                         mlp_ratio=2.0, num_classes=5, dropout=0.0,
                         attention_dropout=0.0, stochastic_depth=0.0,
                         positional_embedding="learnable", backbone=True)
    backbone = CCT(cfg, dtype=jnp.float32)
    div_params = []
    for m in multi.models:
        sd = {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}
        div_params.append(torch_cct_to_params(sd, num_layers=7, n_conv_layers=1))
    stacked = {"params": stack_division_params(div_params)}

    ens_j = OurEnsembleCCT(num_classes=10, sub_size=256, num_divisions=2,
                           teacher_size=96, dtype=jnp.float32)
    esd = {k: v.detach().numpy().copy() for k, v in ens_t.state_dict().items()}
    ens_vars = {"params": {
        name: {"kernel": esd[f"{name}.weight"].T, "bias": esd[f"{name}.bias"]}
        for name in ("cls_mlp", "cls_classifier")
    }}

    step = jax.jit(S.make_cct_ensemble_eval_step(backbone, ens_j))
    totals = {"loss_sum": 0.0, "top1": 0, "top5": 0, "count": 0}
    for i in range(3):
        out = jax.device_get(step(stacked, ens_vars, None, jnp.asarray(images[i]),
                                  jnp.asarray(labels[i])))
        for k in totals:
            totals[k] += float(out[k])
    acc1 = 100.0 * totals["top1"] / totals["count"]
    acc5 = 100.0 * totals["top5"] / totals["count"]
    assert abs(acc1 - float(ref_stats["acc1"])) < 1e-6
    assert abs(acc5 - float(ref_stats["acc5"])) < 1e-6
    assert abs(totals["loss_sum"] / totals["count"] - float(ref_stats["loss"])) < 1e-4


# ------------------------------------------------- loss & metric parity
# (direct function-level checks against the reference's own code — the unit
# suite pins these with handwritten fixtures; these pin them against the
# genuine implementations)


def test_losses_match_reference_functions():
    load_reference()
    import utils.losses as RL

    from devit_tpu.train import losses as L

    rng = np.random.default_rng(11)
    B, H, N, dh_t, dh_s, K = 4, 3, 9, 16, 8, 7
    tq = rng.normal(size=(B, H, N, dh_t)).astype(np.float32)
    sq = rng.normal(size=(B, H, N, dh_s)).astype(np.float32)
    frl_ref = float(RL.feature_relation_loss(torch.from_numpy(tq), torch.from_numpy(sq)))
    frl_ours = float(L.feature_relation_loss(jnp.asarray(tq), jnp.asarray(sq)))
    assert abs(frl_ref - frl_ours) < 1e-5, (frl_ref, frl_ours)

    s_logits = rng.normal(size=(B, K)).astype(np.float32)
    t_logits = rng.normal(size=(B, K)).astype(np.float32)
    labels = rng.integers(0, K, size=(B,))
    for dt, tau in (("hard", 1.0), ("soft", 2.5)):
        dl = RL.DistillLoss(base_criterion=torch.nn.CrossEntropyLoss(),
                            distillation_type=dt, alpha=0.3, tau=tau)
        ref_v = float(dl(torch.from_numpy(s_logits), torch.from_numpy(t_logits),
                         torch.from_numpy(labels)))
        ours_v = float(L.distill_loss(
            jnp.asarray(s_logits), jnp.asarray(s_logits), jnp.asarray(t_logits),
            jnp.asarray(labels), L.cross_entropy,
            distillation_type=dt, alpha=0.3, tau=tau))
        assert abs(ref_v - ours_v) < 1e-5, (dt, ref_v, ours_v)

    ls_ref = RL.LabelSmoothingCrossEntropy(smoothing=0.2)
    ref_v = float(ls_ref(torch.from_numpy(s_logits), torch.from_numpy(labels)))
    ours_v = float(L.label_smoothing_cross_entropy(jnp.asarray(s_logits),
                                                   jnp.asarray(labels), 0.2))
    assert abs(ref_v - ours_v) < 1e-5

    ref_v = float(RL.soft_cross_entropy(torch.from_numpy(s_logits),
                                        torch.from_numpy(t_logits)))
    ours_v = float(L.soft_cross_entropy(jnp.asarray(s_logits), jnp.asarray(t_logits)))
    assert abs(ref_v - ours_v) < 1e-5


def test_ens_loss_matches_reference_class():
    """EnsLoss deit branch (token MSE on cls+dist, blended cls loss) vs ours,
    teacher outputs fed identically."""
    load_reference()
    import utils.losses as RL

    from devit_tpu.train import losses as L

    rng = np.random.default_rng(12)
    B, C, K = 4, 16, 10
    s_cls = rng.normal(size=(B, C)).astype(np.float32)
    s_dist = rng.normal(size=(B, C)).astype(np.float32)
    t_cls = rng.normal(size=(B, C)).astype(np.float32)
    t_dist = rng.normal(size=(B, C)).astype(np.float32)
    s_logits = rng.normal(size=(B, K)).astype(np.float32)
    t_logits = rng.normal(size=(B, K)).astype(np.float32)
    labels = rng.integers(0, K, size=(B,))

    class _Teacher(torch.nn.Module):
        def forward(self, x, distill_token=False):
            return {"output": torch.from_numpy(t_logits),
                    "last_tokens": (torch.from_numpy(t_cls), torch.from_numpy(t_dist))}

    for loss_type in ("mse", "kldiv"):
        ens = RL.EnsLoss(base_criterion=torch.nn.CrossEntropyLoss(),
                         teacher_model=_Teacher(), model="dedeit",
                         distillation_type="hard", alpha=0.4, tau=1.0,
                         loss_type=loss_type)
        tok_ref, cls_ref = ens(
            torch.zeros(B, 3, 8, 8),
            ((torch.from_numpy(s_cls), torch.from_numpy(s_dist)),
             torch.from_numpy(s_logits)),
            torch.from_numpy(labels))
        tok_ours, cls_ours = L.ens_loss(
            (jnp.asarray(s_cls), jnp.asarray(s_dist)), jnp.asarray(s_logits),
            (jnp.asarray(t_cls), jnp.asarray(t_dist)), jnp.asarray(t_logits),
            jnp.asarray(labels), L.cross_entropy,
            model_family="deit", distillation_type="hard", alpha=0.4, tau=1.0,
            token_loss_type=loss_type)
        assert abs(float(tok_ref) - float(tok_ours)) < 1e-5, loss_type
        assert abs(float(cls_ref) - float(cls_ours)) < 1e-5, loss_type


def test_metrics_match_reference_compute_metric():
    load_reference()
    import core.compute_metric as RM

    from devit_tpu.core import metrics as M

    rng = np.random.default_rng(13)
    for _ in range(5):
        L_ = 12
        n_sp = rng.uniform(0, 0.9, L_).tolist()
        h_sp = rng.uniform(0, 0.9, L_).tolist()
        kw = dict(emb=384, seq_length=197, mlp_ratio=4, head=6, layer=L_,
                  num_class=100)
        assert abs(RM.cal_shrink_paras(n_sp, h_sp, **kw)
                   - M.cal_shrink_paras(n_sp, h_sp, **kw)) < 1e-9
        assert abs(RM.cal_shrink_flops(n_sp, h_sp, **kw)
                   - M.cal_shrink_flops(n_sp, h_sp, **kw)) < 1e-9
        assert abs(RM.cal_shrink_macs(n_sp, h_sp, **kw)
                   - M.cal_shrink_macs(n_sp, h_sp, **kw)) < 1e-9


def test_masked_forward_matches_reference_gate_semantics(monkeypatch):
    """Composed shrink semantics: rank -> mask (int-floor keep, top ranked) ->
    gate -> forward, reference imp_rank machinery on the torch model vs our
    build_gates on converted weights. Logits must match."""
    _, ref_de_vit, _, _ = load_reference()
    _patch_cpu(monkeypatch)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    import core.imp_rank as ref_rank

    student_t, _ = _torch_models(ref_de_vit)
    student_t.eval()
    rng = np.random.default_rng(9)
    x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 5, size=(8,))
    loader = [(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(y))]

    n_rank = ref_rank.mlp_neuron_rank(student_t, loader, mode="cpu")
    h_rank = ref_rank.attn_head_rank(student_t, loader, mode="cpu")
    n_sp = [0.4, 0.7]
    h_sp = [0.25, 0.5]
    ref_rank.mlp_neuron_shrink(student_t, ref_rank.mlp_neuron_mask(student_t, n_sp, n_rank))
    ref_rank.attn_head_shrink(student_t, ref_rank.attn_head_mask(student_t, h_sp, h_rank))
    with torch.no_grad():
        ref_logits = student_t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ref_rank.check_neuron_sparsity(student_t)[0] > 0  # masks applied

    from devit_tpu.core.rank import build_gates

    cfg_s = get_vit_config("dedeit", drop_path_rate=0.0, **GEOM_S)
    student_j = VisionTransformer(cfg_s, dtype=jnp.float32)
    params = _to_jax_params(student_t, cfg_s.depth)
    gates = build_gates(np.stack(n_rank), np.stack(h_rank), n_sp, h_sp)
    out = student_j.apply({"params": params}, jnp.asarray(x), gates=gates)
    np.testing.assert_allclose(np.asarray(out.logits), ref_logits,
                               rtol=2e-4, atol=2e-4)


def test_stage2_distillation_loss_matches_reference(monkeypatch):
    """DistillationLoss (stage-2 criterion incl. the distill-token MSE path,
    losses.py:44-119) vs our stage-2 loss composition."""
    ref_engine, ref_de_vit, ref_losses, _ = load_reference()
    _patch_cpu(monkeypatch)

    rng = np.random.default_rng(14)
    B, K, C = 4, 5, 16
    s_cls = rng.normal(size=(B, K)).astype(np.float32)
    s_dist = rng.normal(size=(B, K)).astype(np.float32)
    t_logits = rng.normal(size=(B, K)).astype(np.float32)
    t_token = rng.normal(size=(B, C)).astype(np.float32)
    s_token = rng.normal(size=(B, C)).astype(np.float32)
    labels = rng.integers(0, K, size=(B,))

    class _Teacher(torch.nn.Module):
        def forward(self, x, distill_token=False):
            if distill_token:
                return torch.from_numpy(t_token), torch.from_numpy(t_logits)
            return torch.from_numpy(t_logits)

    from devit_tpu.train import losses as L

    for dt, tau in (("hard", 1.0), ("soft", 3.0)):
        # token-distillation variant
        crit = ref_losses.DistillationLoss(
            base_criterion=torch.nn.CrossEntropyLoss(), teacher_model=_Teacher(),
            distillation_type=dt, alpha=0.5, tau=tau, distill_token=True)
        cls_ref, tok_ref = crit(
            torch.zeros(B, 3, 8, 8),
            (torch.from_numpy(s_cls), torch.from_numpy(s_dist)),
            torch.from_numpy(labels), token_outputs=torch.from_numpy(s_token))
        cls_ours = float(L.distill_loss(
            jnp.asarray(s_cls), jnp.asarray(s_dist), jnp.asarray(t_logits),
            jnp.asarray(labels), L.cross_entropy,
            distillation_type=dt, alpha=0.5, tau=tau))
        tok_ours = float(L.mse_loss(jnp.asarray(s_token), jnp.asarray(t_token)))
        assert abs(float(cls_ref) - cls_ours) < 1e-5, dt
        assert abs(float(tok_ref) - tok_ours) < 1e-5, dt


# ------------------------------------------------- stage-2 training parity


def test_stage2_train_trajectory_matches_reference(monkeypatch):
    """The reference's OWN stage-2 hot loop (train_subdata.train_one_epoch,
    train_subdata.py:233-287, imported from /root/reference) vs our
    make_stage2_step: identical initial weights (via the .pth converter),
    identical batches, hard distillation from the same teacher — per-step
    loss trajectories must track (composed forward + DistillationLoss +
    AdamW dynamics)."""
    from loader import load_reference_train_subdata

    ref_engine, ref_de_vit, ref_losses, _ = load_reference()
    ref_train = load_reference_train_subdata()
    _patch_cpu(monkeypatch)

    student_t, teacher_t = _torch_models(ref_de_vit)
    images, labels = _data()

    # ---- reference side: train_subdata's own loop + DistillationLoss
    ref_train.args = types.SimpleNamespace(distillation_token=False)
    criterion = ref_losses.DistillationLoss(
        base_criterion=torch.nn.CrossEntropyLoss(), teacher_model=teacher_t,
        distillation_type="hard", alpha=0.5, tau=1.0, distill_token=False)
    opt = torch.optim.AdamW(student_t.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    scaler = _RecordingScaler()
    loader = [
        (torch.from_numpy(images[i].transpose(0, 3, 1, 2)),
         torch.from_numpy(labels[i]))
        for i in range(STEPS)
    ]
    log = types.SimpleNamespace(info=lambda *a, **k: None)
    ref_train.train_one_epoch(
        student_t, criterion, loader, opt, torch.device("cpu"), epoch=0,
        loss_scaler=scaler, log=log, max_norm=0, model_ema=None, mixup_fn=None)
    assert len(scaler.losses) == STEPS

    # ---- our side: same initial weights, same batches, same hyperparams
    cfg_s = get_vit_config("dedeit", drop_path_rate=0.0, **GEOM_S)
    cfg_t = get_vit_config("deit_base_distilled_patch16_224",
                           drop_path_rate=0.0, **GEOM_T)
    student_j = VisionTransformer(cfg_s, dtype=jnp.float32)
    teacher_j = VisionTransformer(cfg_t, dtype=jnp.float32)

    student_t2, teacher_t2 = _torch_models(ref_de_vit)
    s_params = _to_jax_params(student_t2, cfg_s.depth)
    t_params = _to_jax_params(teacher_t2, cfg_t.depth)

    import optax

    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    state = TrainState.create(s_params, tx)
    step = jax.jit(S.make_stage2_step(
        student_j, teacher_j, mixup=None, smoothing=0.0,
        distillation_type="hard", distillation_alpha=0.5,
        distillation_tau=1.0, distill_token=False))

    ours = []
    for i in range(STEPS):
        state, metrics = step(state, {"params": t_params},
                              jnp.asarray(images[i]), jnp.asarray(labels[i]),
                              jax.random.key(i))
        ours.append(float(metrics["loss"]))

    # step 0 pins the composed forward + DistillationLoss before divergence
    assert abs(ours[0] - scaler.losses[0]) < 1e-4, (ours[0], scaler.losses[0])
    # full trajectory: AdamW dynamics must track within float tolerance
    np.testing.assert_allclose(ours, scaler.losses, rtol=5e-3, atol=5e-3)


# ------------------------------------------------- stage-2 RASampler parity


def test_repeated_aug_matches_reference_rasampler():
    """BatchIterator's repeated-aug index stream vs the reference's own
    RASampler (utils/samplers.py:8-64): interleaving the per-rank streams of
    an 8-way RASampler reconstructs one consecutive global stream; ours must
    have the same composition — identical length, identical per-sample copy
    multiset (each selected sample exactly `repeats` times), copies adjacent
    so they land in the same global batch. (Permutations differ — torch vs
    numpy generators — so composition, not raw order, is the contract.)"""
    load_reference()
    import utils.samplers as ref_samplers

    from devit_tpu.data.datasets import BatchIterator, synthetic_dataset

    n, world, repeats = 512, 8, 3
    ds = synthetic_dataset(4, n, img_size=8)

    ranks = [ref_samplers.RASampler(list(range(n)), num_replicas=world, rank=r,
                                    shuffle=True, num_repeats=repeats)
             for r in range(world)]
    for s in ranks:
        s.set_epoch(3)
    streams = [list(iter(s)) for s in ranks]
    # global stream: position i of rank r sits at interleaved index i*world+r
    ref_global = np.empty(sum(len(s) for s in streams), dtype=np.int64)
    for r, s in enumerate(streams):
        ref_global[r::world] = s

    it = BatchIterator(ds, 64, shuffle=True, seed=0, repeated_aug=repeats)
    it.set_epoch(3)
    ours = it._epoch_indices()

    # identical epoch length: floor(n/256)*256
    assert len(ours) == len(ref_global) == (n // 256) * 256
    # identical copy-count multiset (each selected sample exactly 3 times,
    # up to the one truncation-boundary sample)
    ref_counts = sorted(np.unique(ref_global, return_counts=True)[1])
    our_counts = sorted(np.unique(ours, return_counts=True)[1])
    assert ref_counts == our_counts
    # adjacency: the copies of each sample are consecutive, as in the
    # reconstructed reference stream (repeat_interleave, samplers.py:48)
    for k in range(0, len(ours) - repeats + 1, repeats):
        assert len(set(ours[k : k + repeats])) == 1
    for k in range(0, len(ref_global) - repeats + 1, repeats):
        assert len(set(ref_global[k : k + repeats])) == 1
