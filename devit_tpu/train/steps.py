"""Jitted train/eval steps for the five pipeline stages.

Parity surface:
- stage 2 (sub-model finetune): train_subdata.train_one_epoch
  (train_subdata.py:233-287) with optional DeiT-style distillation
  (DistillationLoss, losses.py:44-119)
- stage 4 (DEKD): engine.train_1epoch_qkv (engine.py:48-140)
- stage 5 (ensemble): engine.train_1epoch_ens_disjoint (engine.py:143-210),
  one backward / two optimizers
- eval: engine.evaluate (engine.py:17-45), engine.evaluate_ens_disjoint
  (engine.py:212-242)

Every builder returns a function ready to be jitted (or pjit'ed by wrapping in
jax.jit with shardings). Mixup/cutmix runs inside the step on device. The
reference's NaN-check-and-exit (engine.py:119-121) is replaced by returning
the loss in the metrics; the host-side loop decides (train/loop.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from devit_tpu.data.mixup import MixupConfig, mixup_cutmix
from devit_tpu.models.ensemble import EnsMLP, multicct_features, multivit_features
from devit_tpu.models.vit import Gates, VisionTransformer
from devit_tpu.train import losses as L
from devit_tpu.train.state import TrainState

Array = jax.Array


# ---------------------------------------------------------------- evaluation


def eval_counters(logits, labels):
    """Summed CE loss + top-1/top-5 correct counts for one batch — the shared
    payload of every eval step (engine.py:17-45 accuracy/loss bookkeeping).

    Rows with label < 0 are PADDING (run_eval pads the drop_last=False tail
    batch to the steady shape so every geometry compiles exactly one eval
    program): they contribute nothing to any counter, including `count`, so
    aggregated accuracy/loss are exactly those of the unpadded set."""
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    _, pred5 = jax.lax.top_k(logits, min(5, logits.shape[-1]))
    hit = (pred5 == safe[:, None]) & valid[:, None]
    return {
        "loss_sum": jnp.sum(jnp.where(valid, nll, 0.0)),
        "top1": jnp.sum(hit[:, 0].astype(jnp.int32)),
        "top5": jnp.sum(jnp.any(hit, axis=-1).astype(jnp.int32)),
        "count": jnp.sum(valid.astype(jnp.int32)),
    }


def make_eval_step(model: VisionTransformer):
    """Per-batch eval: returns summed loss and top-1/top-5 correct counts so
    accuracy aggregates exactly over uneven final batches (engine.py:17-45).
    Kernel selection (pallas vs XLA) lives on the model instance."""

    def step(variables, gates: Optional[Gates], images, labels):
        out = model.apply(variables, images, gates=gates)
        return eval_counters(out.logits, labels)

    return step


# --------------------------------------------------------------- stage 2


def make_stage2_step(
    model: VisionTransformer,
    teacher_model: Optional[VisionTransformer] = None,
    *,
    mixup: Optional[MixupConfig] = None,
    smoothing: float = 0.1,
    distillation_type: str = "none",
    distillation_alpha: float = 0.5,
    distillation_tau: float = 1.0,
    distill_token: bool = False,
):
    """Sub-model finetune step (train_subdata.py:233-287).

    Signature: step(state, teacher_variables, images, labels, rng) ->
    (state, metrics). teacher_variables may be None when distillation is off.
    """
    if distillation_type != "none" and teacher_model is None:
        # fail at build time with a clear message, not at trace time with
        # AttributeError: 'NoneType' object has no attribute 'apply'
        raise ValueError(
            f"distillation_type={distillation_type!r} requires a teacher "
            "model (--teacher-path)")
    mixup_active = mixup is not None and mixup.active
    base_criterion = L.make_base_criterion(mixup_active, smoothing)

    def step(state: TrainState, teacher_variables, images, labels, rng):
        rng_mix, rng_drop = jax.random.split(rng)
        if mixup_active:
            images_m, targets = mixup_cutmix(rng_mix, images, labels, mixup)
        else:
            images_m, targets = images, labels

        teacher_logits = teacher_token = None
        if distillation_type != "none":
            t_out = teacher_model.apply(
                teacher_variables, images_m, distill_token=distill_token
            )
            teacher_logits = t_out.logits
            teacher_token = t_out.last_tokens

        def loss_fn(params):
            out = model.apply(
                {"params": params}, images_m, train=True,
                rngs={"dropout": rng_drop}, distill_token=distill_token,
            )
            cls_logits = out.cls_logits
            kd_logits = out.dist_logits if out.dist_logits is not None else out.cls_logits
            base = base_criterion(cls_logits, targets)
            metrics = {}
            if distillation_type == "none":
                loss = base
            else:
                kd = L.cls_distill_loss(kd_logits, teacher_logits, distillation_type,
                                        distillation_tau)
                loss = base * (1 - distillation_alpha) + kd * distillation_alpha
                if distill_token:
                    # token MSE vs teacher last tokens (losses.py:56,103-117)
                    s_tok, t_tok = out.last_tokens, teacher_token
                    if isinstance(s_tok, tuple):
                        token_loss = L.mse_loss(s_tok[0], t_tok[0]) + L.mse_loss(s_tok[1], t_tok[1])
                    else:
                        token_loss = L.mse_loss(s_tok, t_tok)
                    metrics["cls_loss"] = loss
                    metrics["token_loss"] = token_loss
                    loss = loss + token_loss  # train_subdata.py:257
            metrics["loss"] = loss
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        return state, metrics

    return step


# --------------------------------------------------------------- stage 4 DEKD


def make_dekd_step(
    student: VisionTransformer,
    teacher: VisionTransformer,
    *,
    gamma: Tuple[float, float, float] = (0.2, 0.1, 0.3),
    mixup: Optional[MixupConfig] = None,
    smoothing: float = 0.1,
    distillation_type: str = "hard",
    distillation_alpha: float = 0.5,
    distillation_tau: float = 1.0,
    distillation_inter: bool = True,
):
    """DEKD step (engine.train_1epoch_qkv, engine.py:48-140): student forward
    with middle-layer QKV capture, no-grad teacher forward ditto, cls
    distillation + per-Q/K/V feature-relation losses weighted by gamma.

    Signature: step(state, teacher_variables, gates, images, labels, rng).
    Shrink gates are applied to the student (distill_sub.py:391-401).

    distillation_inter=False drops the relation losses and the QKV captures
    (engine.py:69's else branch INTENT — loss = cls distillation only; the
    reference's else branch as committed crashes on criterion kwargs,
    engine.py:115 vs DistillLoss's signature).
    """
    mixup_active = mixup is not None and mixup.active
    base_criterion = L.make_base_criterion(mixup_active, smoothing)
    capture = "middle" if distillation_inter else "none"

    def step(state: TrainState, teacher_variables, gates: Gates, images, labels, rng):
        rng_mix, rng_drop = jax.random.split(rng)
        if mixup_active:
            images_m, targets = mixup_cutmix(rng_mix, images, labels, mixup)
        else:
            images_m, targets = images, labels

        t_out = teacher.apply(teacher_variables, images_m, capture_qkv=capture)
        teacher_logits, teacher_qkv = t_out.logits, t_out.qkv

        def loss_fn(params):
            out = student.apply(
                {"params": params}, images_m, gates=gates, train=True,
                rngs={"dropout": rng_drop}, capture_qkv=capture,
            )
            cls_logits = out.cls_logits
            kd_logits = out.dist_logits if out.dist_logits is not None else out.cls_logits
            if distillation_inter:
                total, aux = L.dekd_loss(
                    (cls_logits, kd_logits), out.qkv, teacher_logits, teacher_qkv,
                    targets, base_criterion,
                    depth=student.cfg.depth, gamma=gamma,
                    distillation_type=distillation_type,
                    alpha=distillation_alpha, tau=distillation_tau,
                )
            else:
                cls = L.distill_loss(
                    cls_logits, kd_logits, teacher_logits, targets,
                    base_criterion, distillation_type,
                    distillation_alpha, distillation_tau)
                total, aux = cls, {"cls_loss": cls}
            aux["loss"] = total
            return total, aux

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        return state, metrics

    return step


# --------------------------------------------------------------- stage 5 ensemble


def make_ensemble_train_step(
    backbone: VisionTransformer,
    ens_model: EnsMLP,
    teacher: Optional[VisionTransformer] = None,
    *,
    mixup: Optional[MixupConfig] = None,
    smoothing: float = 0.1,
    distillation_type: str = "hard",
    distillation_alpha: float = 0.5,
    distillation_tau: float = 1.0,
    token_loss_type: str = "mse",
):
    """Ensemble step (engine.train_1epoch_ens_disjoint, engine.py:143-210):
    MultiViT features -> EnsMLP fusion -> EnsLoss, ONE backward through both,
    gradients split to two optimizers (backbone_state over the stacked division
    params, ens_state over the fusion head) exactly like the reference's two
    optimizer.step() calls off a single scaler.scale(loss).backward().

    Signature: step(backbone_state, ens_state, teacher_variables, stacked_gates,
    images, labels, rng) -> (backbone_state, ens_state, metrics).
    """
    if distillation_type != "none":
        if teacher is None:
            raise ValueError(
                f"distillation_type={distillation_type!r} requires a teacher "
                "model (--teacher-path)")
        if getattr(ens_model, "teacher_size", None) is None:
            # EnsMLP(teacher_size=None) returns ens_tokens=None, which
            # L.ens_loss would dereference deep inside the jit trace
            raise ValueError(
                "ensemble distillation requires EnsMLP(teacher_size=...) so "
                "the fused tokens are projected for the token loss")
    mixup_active = mixup is not None and mixup.active
    base_criterion = L.make_base_criterion(mixup_active, smoothing)
    family = "deit" if backbone.cfg.distilled else "vit"

    def step(backbone_state, ens_state, teacher_variables, stacked_gates, images, labels, rng):
        rng_mix, rng_drop = jax.random.split(rng)
        if mixup_active:
            images_m, targets = mixup_cutmix(rng_mix, images, labels, mixup)
        else:
            images_m, targets = images, labels

        if distillation_type != "none":
            t_out = teacher.apply(teacher_variables, images_m, distill_token=True)
            tea_logits, tea_tokens = t_out.logits, t_out.last_tokens
        else:
            tea_logits = tea_tokens = None

        def loss_fn(bb_params, ens_params):
            # train=True: the reference trains the backbones with stochastic
            # depth active (engine.py:146 model.train(True); MultiViT builds
            # them with drop_path=args.drop_path, ensemble_models.py:14)
            cls_t, dist_t = multivit_features(
                backbone, {"params": bb_params}, images_m, stacked_gates,
                train=True, rng=rng_drop,
            )
            ens_out = ens_model.apply(
                {"params": ens_params}, cls_t, dist_t, distill=True, train=True
            )
            if distillation_type == "none":
                loss = base_criterion(ens_out.logits, targets)
                return loss, {"loss": loss}
            token_loss, cls_loss = L.ens_loss(
                ens_out.ens_tokens, ens_out.logits, tea_tokens, tea_logits,
                targets, base_criterion,
                model_family=family, distillation_type=distillation_type,
                alpha=distillation_alpha, tau=distillation_tau,
                token_loss_type=token_loss_type,
            )
            loss = token_loss + cls_loss  # engine.py:176
            return loss, {"loss": loss, "token_loss": token_loss, "cls_loss": cls_loss}

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(backbone_state.params, ens_state.params)
        backbone_state = backbone_state.apply_gradients(grads[0])
        ens_state = ens_state.apply_gradients(grads[1])
        return backbone_state, ens_state, metrics

    return step


def make_ensemble_eval_step(backbone: VisionTransformer, ens_model: EnsMLP):
    """Collaborative-inference eval — THE benchmark path
    (engine.evaluate_ens_disjoint, engine.py:212-242)."""

    def step(stacked_variables, ens_variables, stacked_gates, images, labels):
        cls_t, dist_t = multivit_features(backbone, stacked_variables, images, stacked_gates)
        out = ens_model.apply(ens_variables, cls_t, dist_t)
        return eval_counters(out.logits, labels)

    return step


# --------------------------------------------------------- stage 5 (CCT family)


def make_cct_ensemble_train_step(
    backbone,
    ens_model,
    teacher=None,
    *,
    mixup: Optional[MixupConfig] = None,
    smoothing: float = 0.1,
    distillation_type: str = "none",
    distillation_alpha: float = 0.5,
    distillation_tau: float = 1.0,
    token_loss_type: str = "mse",
):
    """CCT collaborative-ensemble step (MultiCCT + EnsembleCCT,
    ensemble_models.py:93-151): single pooled token per division, 'vit'-style
    EnsLoss (one token, one classifier)."""
    if distillation_type != "none":
        from devit_tpu.models.cct import CCT

        if teacher is None:
            raise ValueError(
                f"distillation_type={distillation_type!r} requires a teacher "
                "model (--teacher-path)")
        if not isinstance(teacher, CCT):
            # the token loss consumes the teacher's POOLED feature; a ViT
            # teacher (the CLI default) has no pooled output — fail at build
            # time with a clear message, not at trace time on .pooled
            raise ValueError(
                "CCT ensemble distillation requires a CCT teacher "
                f"(--teacher-model cct_*); got {type(teacher).__name__}")
        if getattr(ens_model, "teacher_size", None) is None:
            raise ValueError(
                "ensemble distillation requires EnsembleCCT(teacher_size=...) "
                "so the fused token is projected for the token loss")
    mixup_active = mixup is not None and mixup.active
    base_criterion = L.make_base_criterion(mixup_active, smoothing)

    def step(backbone_state, ens_state, teacher_variables, stacked_gates,
             images, labels, rng):
        rng_mix, rng_drop = jax.random.split(rng)
        if mixup_active:
            images_m, targets = mixup_cutmix(rng_mix, images, labels, mixup)
        else:
            images_m, targets = images, labels

        if distillation_type != "none":
            t_out = teacher.apply(teacher_variables, images_m)
            tea_logits, tea_token = t_out.logits, t_out.pooled
        else:
            tea_logits = tea_token = None

        def loss_fn(bb_params, ens_params):
            # train=True: backbones train with their dropout/drop-path active
            # (engine.py:146 model.train(True))
            feats = multicct_features(backbone, {"params": bb_params}, images_m,
                                      stacked_gates, train=True, rng=rng_drop)
            ens_out = ens_model.apply(
                {"params": ens_params}, feats, distill=True, train=True
            )
            if distillation_type == "none":
                loss = base_criterion(ens_out.logits, targets)
                return loss, {"loss": loss}
            token_loss, cls_loss = L.ens_loss(
                ens_out.ens_tokens, ens_out.logits, tea_token, tea_logits,
                targets, base_criterion,
                model_family="vit", distillation_type=distillation_type,
                alpha=distillation_alpha, tau=distillation_tau,
                token_loss_type=token_loss_type,
            )
            loss = token_loss + cls_loss
            return loss, {"loss": loss, "token_loss": token_loss, "cls_loss": cls_loss}

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(backbone_state.params, ens_state.params)
        backbone_state = backbone_state.apply_gradients(grads[0])
        ens_state = ens_state.apply_gradients(grads[1])
        return backbone_state, ens_state, metrics

    return step


def make_cct_ensemble_eval_step(backbone, ens_model):
    def step(stacked_variables, ens_variables, stacked_gates, images, labels):
        feats = multicct_features(backbone, stacked_variables, images,
                                  stacked_gates)
        out = ens_model.apply(ens_variables, feats)
        return eval_counters(out.logits, labels)

    return step
