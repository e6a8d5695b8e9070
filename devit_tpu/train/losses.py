"""All training losses, as pure functions.

Parity surface: reference `utils/losses.py` — LabelSmoothingCrossEntropy (:10),
soft_cross_entropy (:37), DistillationLoss (:44), DistillLoss (:122), EnsLoss
(:180), feature_relation_loss (:307) — and the DEKD combination in
`engine.train_1epoch_qkv` (engine.py:79-106).

All reductions are computed in fp32 regardless of compute dtype.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _log_softmax32(x: Array, axis: int = -1) -> Array:
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=axis)


def cross_entropy(logits: Array, labels: Array) -> Array:
    """Mean CE with integer labels (torch F.cross_entropy semantics)."""
    logp = _log_softmax32(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def label_smoothing_cross_entropy(logits: Array, labels: Array, smoothing: float = 0.1) -> Array:
    """reference losses.py:10-34."""
    logp = _log_softmax32(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def soft_target_cross_entropy(logits: Array, target_probs: Array) -> Array:
    """CE against a soft target distribution (timm SoftTargetCrossEntropy,
    used with mixup). target_probs are probabilities, not logits."""
    logp = _log_softmax32(logits)
    return jnp.mean(jnp.sum(-target_probs.astype(jnp.float32) * logp, axis=-1))


def soft_cross_entropy(predict_logits: Array, target_logits: Array) -> Array:
    """reference losses.py:37-41: CE between softmax(target) and log_softmax(pred)."""
    logp = _log_softmax32(predict_logits)
    p_t = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-p_t * logp, axis=-1))


def make_base_criterion(mixup_active: bool, smoothing: float):
    """Pick the stage criterion the way the reference does (train_subdata.py:407-415):
    mixup -> soft-target CE, else label-smoothing CE (or plain CE if smoothing=0)."""
    if mixup_active:
        return soft_target_cross_entropy
    if smoothing > 0:
        return lambda logits, labels: label_smoothing_cross_entropy(logits, labels, smoothing)
    return cross_entropy


def soft_distill_loss(student_logits: Array, teacher_logits: Array, tau: float) -> Array:
    """KL(student/T || teacher/T) * T^2 / numel — 'legacy PyTorch behaviour'
    divides the summed KL by B*num_classes (losses.py:69-77)."""
    s = _log_softmax32(student_logits / tau)
    t = _log_softmax32(teacher_logits / tau)
    kl = jnp.sum(jnp.exp(t) * (t - s))
    return kl * (tau * tau) / student_logits.size


def hard_distill_loss(student_logits: Array, teacher_logits: Array) -> Array:
    """CE against teacher argmax (losses.py:81-82)."""
    return cross_entropy(student_logits, jnp.argmax(teacher_logits, axis=-1))


def cls_distill_loss(student_logits: Array, teacher_logits: Array,
                     distillation_type: str, tau: float) -> Array:
    if distillation_type == "soft":
        return soft_distill_loss(student_logits, teacher_logits, tau)
    if distillation_type == "hard":
        return hard_distill_loss(student_logits, teacher_logits)
    raise ValueError(f"bad distillation_type {distillation_type!r}")


def distill_loss(
    cls_logits: Array,
    kd_logits: Array,
    teacher_logits: Array,
    labels: Array,
    base_criterion,
    distillation_type: str = "hard",
    alpha: float = 0.5,
    tau: float = 1.0,
) -> Array:
    """`DistillLoss` (losses.py:122-177): base loss on the first output, KD loss
    on the second (the distillation head for DeiT-style students), blended by
    alpha. With an undistilled student pass cls_logits == kd_logits (losses.py:169)."""
    base = base_criterion(cls_logits, labels)
    if distillation_type == "none":
        return base
    kd = cls_distill_loss(kd_logits, teacher_logits, distillation_type, tau)
    return base * (1.0 - alpha) + kd * alpha


def mse_loss(a: Array, b: Array) -> Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def kldiv_batchmean_log_target(student_log: Array, teacher_log: Array) -> Array:
    """torch.nn.KLDivLoss(reduction='batchmean', log_target=True) semantics:
    sum(exp(t) * (t - s)) / batch_size."""
    s = student_log.astype(jnp.float32)
    t = teacher_log.astype(jnp.float32)
    return jnp.sum(jnp.exp(t) * (t - s)) / student_log.shape[0]


def feature_relation_loss(teacher_feature: Array, student_feature: Array) -> Array:
    """The DEKD inter-feature loss (losses.py:307-327).

    Inputs are per-layer Q (or K or V) of shape (B, H, N, dh). Heads are
    concatenated per token, a token-by-token Gram matrix is scaled by
    1/sqrt(head_dim) (the per-head dim, which makes the loss width-independent),
    and the KL between log-softmaxed relation matrices is taken batchmean-style.
    """
    tb, th, tn, td = teacher_feature.shape
    sd = student_feature.shape[-1]

    def relation_log(f: Array, head_size: int) -> Array:
        # (B, H, N, d) -> (B, N, H*d): concat heads per token (losses.py:313-316)
        B, H, N, d = f.shape
        f = f.transpose(0, 2, 1, 3).reshape(B, N, H * d).astype(jnp.float32)
        rel = jnp.einsum("bnc,bmc->bnm", f, f) / math.sqrt(head_size)
        return jax.nn.log_softmax(rel, axis=-1)

    t_log = relation_log(teacher_feature, td)
    s_log = relation_log(student_feature, sd)
    return kldiv_batchmean_log_target(s_log, t_log)


def dekd_qkv_losses(
    student_qkv: Array, teacher_qkv: Array, depth: int
) -> Tuple[Array, Array, Array]:
    """Per-Q/K/V relation losses for the captured (middle) layer, each divided
    by student depth exactly as engine.py:102-104 does.

    student_qkv/teacher_qkv: (3, B, H, N, dh) middle-layer captures.
    """
    q = feature_relation_loss(teacher_qkv[0], student_qkv[0]) / depth
    k = feature_relation_loss(teacher_qkv[1], student_qkv[1]) / depth
    v = feature_relation_loss(teacher_qkv[2], student_qkv[2]) / depth
    return q, k, v


def dekd_loss(
    student_logits_pair: Tuple[Array, Array],
    student_qkv: Array,
    teacher_logits: Array,
    teacher_qkv: Array,
    labels: Array,
    base_criterion,
    *,
    depth: int,
    gamma: Tuple[float, float, float],
    distillation_type: str = "hard",
    alpha: float = 0.5,
    tau: float = 1.0,
):
    """Full DEKD objective: cls + g0*q + g1*k + g2*v (engine.py:79-106)."""
    cls_logits, kd_logits = student_logits_pair
    cls = distill_loss(cls_logits, kd_logits, teacher_logits, labels,
                       base_criterion, distillation_type, alpha, tau)
    q, k, v = dekd_qkv_losses(student_qkv, teacher_qkv, depth)
    total = cls + gamma[0] * q + gamma[1] * k + gamma[2] * v
    aux = {"cls_loss": cls, "q_loss": q, "k_loss": k, "v_loss": v}
    return total, aux


def ens_loss(
    stu_tokens,
    stu_logits: Array,
    tea_tokens,
    tea_logits: Array,
    labels: Array,
    base_criterion,
    *,
    model_family: str = "deit",
    distillation_type: str = "hard",
    alpha: float = 0.5,
    tau: float = 1.0,
    token_loss_type: str = "mse",
):
    """`EnsLoss` (losses.py:180-244): token-matching loss between the fused
    ensemble token(s) and the teacher's last token(s), plus blended cls loss.

    For 'deit' family: stu_tokens/tea_tokens are (cls_token, dist_token) pairs.
    For 'vit': single arrays.
    Returns (token_loss, cls_loss) like the reference.
    """
    if token_loss_type == "mse":
        token_criterion = mse_loss
    elif token_loss_type == "kldiv":
        token_criterion = kldiv_batchmean_log_target
    else:
        raise ValueError(token_loss_type)

    cls_loss = (1.0 - alpha) * base_criterion(stu_logits, labels) + alpha * cls_distill_loss(
        stu_logits, tea_logits, distillation_type, tau
    )

    if "deit" in model_family:
        s_cls, s_dist = stu_tokens
        t_cls, t_dist = tea_tokens
        token_loss = token_criterion(s_cls, t_cls) + token_criterion(s_dist, t_dist)
    else:
        token_loss = token_criterion(stu_tokens, tea_tokens)
    return token_loss, cls_loss


def qkv_gram_loss(stu_qkv_list, tea_qkv_list) -> Array:
    """`cal_qkv_loss` (losses.py:247-268): all-layer Q/K/V self-Gram matching.

    Each list element is a (q, k, v) triple of (B, H, N, dh) arrays. The
    reference flattens (B, H, N, dh) via `.contiguous().view(B, N, H*dh)` — a
    raw memory reinterpretation, NOT a per-token head concat (unlike
    feature_relation_loss's unbind/stack). jnp.reshape on the same row-major
    layout reproduces it bit-for-bit; we keep the quirk for parity.
    Gram = (M/sqrt(dh)) @ M^T per projection, soft-CE against the teacher's,
    averaged over 3 projections x layers.
    """
    layer_num = len(stu_qkv_list)
    loss = jnp.float32(0.0)
    for stu_qkv, tea_qkv in zip(stu_qkv_list, tea_qkv_list):
        B, Hs, N, Cs = stu_qkv[0].shape
        _, Ht, _, Ct = tea_qkv[0].shape
        for i in range(3):
            Ms = stu_qkv[i].reshape(B, N, Hs * Cs).astype(jnp.float32)
            Mt = tea_qkv[i].reshape(B, N, Ht * Ct).astype(jnp.float32)
            Ms12 = jnp.einsum("bnc,bmc->bnm", Ms / Cs**0.5, Ms)
            Mt12 = jnp.einsum("bnc,bmc->bnm", Mt / Ct**0.5, Mt)
            loss = loss + soft_cross_entropy(Ms12, Mt12)
    return loss / (3.0 * layer_num)


def qkv_cross_gram_loss(stu_qkv_list, tea_qkv_list) -> Array:
    """`cal_qkv_loss2` (losses.py:271-293): the 3x3 cross-projection variant —
    Gram(i, j) = (M_i/sqrt(dh)) @ M_j^T for every (i, j) in Q/K/V x Q/K/V,
    soft-CE vs the teacher's, averaged over 9 pairs x layers. Same raw
    `.view` flattening quirk as qkv_gram_loss."""
    layer_num = len(stu_qkv_list)
    loss = jnp.float32(0.0)
    for stu_qkv, tea_qkv in zip(stu_qkv_list, tea_qkv_list):
        B, Hs, N, Cs = stu_qkv[0].shape
        _, Ht, _, Ct = tea_qkv[0].shape
        s_flat = [stu_qkv[i].reshape(B, N, Hs * Cs).astype(jnp.float32) for i in range(3)]
        t_flat = [tea_qkv[i].reshape(B, N, Ht * Ct).astype(jnp.float32) for i in range(3)]
        for i in range(3):
            for j in range(3):
                Ms12 = jnp.einsum("bnc,bmc->bnm", s_flat[i] / Cs**0.5, s_flat[j])
                Mt12 = jnp.einsum("bnc,bmc->bnm", t_flat[i] / Ct**0.5, t_flat[j])
                loss = loss + soft_cross_entropy(Ms12, Mt12)
    return loss / (9.0 * layer_num)


def hidden_relation_loss(stu_hid_list, tea_hid_list) -> Array:
    """`cal_hid_relation_loss` (losses.py:296-305): per-layer token-relation
    MSE on L2-normalized hidden states (..., N, C), averaged over layers.
    torch F.normalize clamps the norm at eps=1e-12, reproduced here."""
    layer_num = len(stu_hid_list)
    loss = jnp.float32(0.0)
    for stu_hid, tea_hid in zip(stu_hid_list, tea_hid_list):

        def _normalize(x):
            x = x.astype(jnp.float32)
            n = jnp.linalg.norm(x, axis=-1, keepdims=True)
            return x / jnp.maximum(n, 1e-12)

        s = _normalize(stu_hid)
        t = _normalize(tea_hid)
        s_rel = jnp.einsum("...nc,...mc->...nm", s, s)
        t_rel = jnp.einsum("...nc,...mc->...nm", t, t)
        loss = loss + jnp.mean(jnp.square(s_rel - t_rel))
    return loss / layer_num


def accuracy_topk(logits: Array, labels: Array, topk=(1, 5)):
    """timm-style top-k accuracy in percent."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)
    correct = pred == labels[:, None]
    return tuple(
        100.0 * jnp.mean(jnp.any(correct[:, :k], axis=-1).astype(jnp.float32)) for k in topk
    )
