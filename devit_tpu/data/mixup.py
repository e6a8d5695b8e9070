"""Device-side Mixup / CutMix — TPU-native equivalent of timm's `Mixup`
(used at train_subdata.py:378-384 with mixup=0.8, cutmix=1.0, prob=1.0,
switch_prob=0.5, mode='batch', label smoothing folded into the soft target).

Runs inside the jitted train step on device (pure JAX, batch mode): one Beta
draw per batch, one coin flip to switch mixup<->cutmix, soft targets built as
smoothed one-hots mixed with lam.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    prob: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.1
    num_classes: int = 100

    @property
    def active(self) -> bool:
        return self.mixup_alpha > 0 or self.cutmix_alpha > 0


def _beta(rng: Array, alpha: float) -> Array:
    return jax.random.beta(rng, alpha, alpha)


def _one_hot_smooth(labels: Array, num_classes: int, smoothing: float) -> Array:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(rng: Array, h: int, w: int, lam: Array) -> Tuple[Array, Array, Array, Array]:
    """timm rand_bbox: cut a sqrt(1-lam)-scaled box at a uniform center."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ry, rx = jax.random.randint(rng, (2,), 0, jnp.array([h, w]))
    y1 = jnp.clip(ry - cut_h // 2, 0, h)
    y2 = jnp.clip(ry + cut_h // 2, 0, h)
    x1 = jnp.clip(rx - cut_w // 2, 0, w)
    x2 = jnp.clip(rx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def mixup_cutmix(
    rng: Array, images: Array, labels: Array, cfg: MixupConfig
) -> Tuple[Array, Array]:
    """Batch-mode mixup/cutmix. images (B,H,W,C) NHWC, int labels (B,).

    Returns (mixed images, soft targets (B,K)). Pairing is batch-reversal
    (timm batch mode mixes x with x.flip(0)).
    """
    B, H, W, _ = images.shape
    targets = _one_hot_smooth(labels, cfg.num_classes, cfg.label_smoothing)
    if not cfg.active:
        return images, targets

    r_apply, r_switch, r_mix, r_cut, r_box = jax.random.split(rng, 5)
    use_cutmix = jnp.logical_and(
        jax.random.uniform(r_switch) < cfg.switch_prob, cfg.cutmix_alpha > 0
    )
    if cfg.mixup_alpha <= 0:
        use_cutmix = jnp.array(True)

    lam_mix = _beta(r_mix, cfg.mixup_alpha) if cfg.mixup_alpha > 0 else jnp.array(1.0)
    lam_cut = _beta(r_cut, cfg.cutmix_alpha) if cfg.cutmix_alpha > 0 else jnp.array(1.0)

    flipped = images[::-1]

    # mixup branch
    lam_m = lam_mix
    mixed_mix = images * lam_m + flipped * (1.0 - lam_m)

    # cutmix branch: paste the flipped batch's box, correct lam by box area
    y1, y2, x1, x2 = _rand_bbox(r_box, H, W, lam_cut)
    yy = jnp.arange(H)[None, :, None, None]
    xx = jnp.arange(W)[None, None, :, None]
    in_box = (yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2)
    mixed_cut = jnp.where(in_box, flipped, images)
    lam_c = 1.0 - ((y2 - y1) * (x2 - x1)) / (H * W)

    mixed = jnp.where(use_cutmix, mixed_cut, mixed_mix)
    lam = jnp.where(use_cutmix, lam_c, lam_m).astype(targets.dtype)

    # apply-probability gate (prob=1.0 by default)
    apply = jax.random.uniform(r_apply) < cfg.prob
    mixed = jnp.where(apply, mixed, images)
    lam = jnp.where(apply, lam, 1.0)

    soft = targets * lam + targets[::-1] * (1.0 - lam)
    return mixed.astype(images.dtype), soft
