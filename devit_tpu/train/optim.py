"""Optimizer / schedule / EMA factory — TPU-native equivalents of the timm
`create_optimizer` + `create_scheduler` + `ModelEma` stack the reference leans
on (SURVEY.md §1 "External load-bearing dependency").

- AdamW with the reference defaults (opt='adamw', eps=1e-8; train_subdata.py:61-71)
- cosine schedule with linear warmup (sched='cosine', warmup_lr=1e-6,
  min_lr=1e-5, warmup 5 epochs, cooldown 10; train_subdata.py:74-98). The
  reference steps its scheduler per epoch; we schedule per step (smoother,
  standard in JAX) — documented deviation.
- linear LR scaling lr * global_batch / 512 (train_subdata.py:405)
- weight-decay mask: only matrix-like kernels decay; pos_embed/cls/dist tokens,
  biases and norm scales are excluded (de_vit.py:226-228 no_weight_decay +
  timm's 1-d exclusion)
- EMA of params with decay 0.99996 (train_subdata.py:57)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import optax


@dataclasses.dataclass
class OptimConfig:
    lr: float = 5e-4
    min_lr: float = 1e-5
    warmup_lr: float = 1e-6
    warmup_epochs: int = 5
    cooldown_epochs: int = 10
    epochs: int = 100
    weight_decay: float = 0.05
    opt_eps: float = 1e-8
    beta1: float = 0.9
    beta2: float = 0.999
    clip_grad: Optional[float] = None
    scale_lr_by_batch: bool = False
    global_batch: int = 512

    def scaled_lr(self) -> float:
        if self.scale_lr_by_batch:
            return self.lr * self.global_batch / 512.0
        return self.lr


def cosine_schedule(cfg: OptimConfig, steps_per_epoch: int) -> optax.Schedule:
    """Linear warmup (warmup_lr -> lr) then cosine decay (lr -> min_lr); the
    cooldown tail holds min_lr, matching timm's cooldown_epochs semantics."""
    peak = cfg.scaled_lr()
    warmup_steps = max(cfg.warmup_epochs * steps_per_epoch, 1)
    decay_epochs = max(cfg.epochs - cfg.warmup_epochs - cfg.cooldown_epochs, 1)
    decay_steps = decay_epochs * steps_per_epoch

    warmup = optax.linear_schedule(cfg.warmup_lr, peak, warmup_steps)
    cosine = optax.cosine_decay_schedule(peak, decay_steps, alpha=cfg.min_lr / peak)
    tail = optax.constant_schedule(cfg.min_lr)
    return optax.join_schedules(
        [warmup, cosine, tail], [warmup_steps, warmup_steps + decay_steps]
    )


def _decay_mask(params):
    """True where weight decay applies: kernels (matrices; with nn.scan stacking
    they are >=2-D per layer slice) — not biases, norm scales, or the
    pos_embed/cls_token/dist_token parameters."""
    flat = jax.tree_util.tree_map_with_path(
        lambda path, p: _decays(path, p), params
    )
    return flat


_NO_DECAY_NAMES = {"pos_embed", "cls_token", "dist_token", "bias", "scale"}


def _decays(path, p) -> bool:
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    if any(n in _NO_DECAY_NAMES for n in names):
        return False
    return p.ndim >= 2


def make_optimizer(
    cfg: OptimConfig, steps_per_epoch: int, schedule: Optional[optax.Schedule] = None
) -> optax.GradientTransformation:
    sched = schedule if schedule is not None else cosine_schedule(cfg, steps_per_epoch)
    chain = []
    if cfg.clip_grad is not None:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad))
    chain.append(
        optax.adamw(
            learning_rate=sched,
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=cfg.opt_eps,
            weight_decay=cfg.weight_decay,
            mask=_decay_mask,
        )
    )
    return optax.chain(*chain)


def ema_update(ema_params, params, decay: float = 0.99996):
    """timm ModelEma semantics (train_subdata.py:57, :278-279)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )
