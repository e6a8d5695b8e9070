"""Device-side Mixup / CutMix — TPU-native equivalent of timm's `Mixup`
(used at train_subdata.py:378-384 with mixup=0.8, cutmix=1.0, prob=1.0,
switch_prob=0.5, mode='batch', label smoothing folded into the soft target).

All three timm modes are implemented with timm-0.5.4 semantics
(train_subdata.py:125-137 exposes --mixup-mode {batch,pair,elem} and
--cutmix-minmax):
  batch: one Beta draw + one box per batch;
  elem:  per-sample lam / switch / box, each sample mixes with its
         flipped-batch counterpart;
  pair:  per-PAIR lam/box shared by (i, B-1-i) — both members get the same
         lam and (for cutmix) swap the same box, so the lam vector is
         symmetric (timm's `np.concatenate((lam_batch, lam_batch[::-1]))`).
cutmix_minmax replaces the Beta-derived box with side lengths drawn
uniformly from [minmax0*H, minmax1*H) (timm rand_bbox_minmax) and forces
cutmix_alpha=1.0 the way timm's __init__ does. lam is always area-corrected
(timm correct_lam=True default).

Runs inside the jitted train step on device (pure JAX): modes are static
config, so each recipe traces to one fused program — the per-sample boxes of
elem/pair lower to elementwise iota masks, not gathers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    cutmix_minmax: Optional[Tuple[float, float]] = None
    prob: float = 1.0
    switch_prob: float = 0.5
    mode: str = "batch"  # batch | pair | elem
    label_smoothing: float = 0.1
    num_classes: int = 100

    @property
    def effective_cutmix_alpha(self) -> float:
        # timm Mixup.__init__: cutmix_minmax forces cutmix_alpha = 1.0
        return 1.0 if self.cutmix_minmax is not None else self.cutmix_alpha

    @property
    def active(self) -> bool:
        return self.mixup_alpha > 0 or self.effective_cutmix_alpha > 0


def _beta(rng: Array, alpha: float, shape=()) -> Array:
    return jax.random.beta(rng, alpha, alpha, shape)


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


def _rand_bbox_minmax(rng: Array, h: int, w: int,
                      minmax: Tuple[float, float]) -> Tuple[Array, Array, Array, Array]:
    """timm rand_bbox_minmax: side lengths uniform in [minmax0*S, minmax1*S),
    top-left uniform so the box fits."""
    r_h, r_w, r_y, r_x = jax.random.split(rng, 4)
    cut_h = jax.random.randint(r_h, (), int(h * minmax[0]), int(h * minmax[1]))
    cut_w = jax.random.randint(r_w, (), int(w * minmax[0]), int(w * minmax[1]))
    # randint with a traced exclusive-high bound: floor(u * (S - cut))
    y1 = jnp.floor(jax.random.uniform(r_y) * (h - cut_h)).astype(jnp.int32)
    x1 = jnp.floor(jax.random.uniform(r_x) * (w - cut_w)).astype(jnp.int32)
    return y1, y1 + cut_h, x1, x1 + cut_w


def _sample_box(rng: Array, h: int, w: int, lam: Array, cfg: MixupConfig):
    if cfg.cutmix_minmax is not None:
        return _rand_bbox_minmax(rng, h, w, cfg.cutmix_minmax)
    return _rand_bbox(rng, h, w, lam)


def _params(rng: Array, cfg: MixupConfig, shape=()) -> Tuple[Array, Array]:
    """(lam, use_cutmix) with timm's sampling order (`_params_per_elem` /
    `_mix_batch`): switch coin first, then the matching Beta, then the
    apply-probability gate folds lam back to 1."""
    r_apply, r_switch, r_mix, r_cut = jax.random.split(rng, 4)
    cutmix_alpha = cfg.effective_cutmix_alpha
    if cfg.mixup_alpha > 0 and cutmix_alpha > 0:
        use_cutmix = jax.random.uniform(r_switch, shape) < cfg.switch_prob
        lam = jnp.where(use_cutmix,
                        _beta(r_cut, cutmix_alpha, shape),
                        _beta(r_mix, cfg.mixup_alpha, shape))
    elif cfg.mixup_alpha > 0:
        use_cutmix = jnp.zeros(shape, bool)
        lam = _beta(r_mix, cfg.mixup_alpha, shape)
    else:
        use_cutmix = jnp.ones(shape, bool)
        lam = _beta(r_cut, cutmix_alpha, shape)
    apply = jax.random.uniform(r_apply, shape) < cfg.prob
    return jnp.where(apply, lam, 1.0), use_cutmix


def _mix_with_flipped(images: Array, lam: Array, use_cutmix: Array,
                      boxes, h: int, w: int) -> Tuple[Array, Array]:
    """Apply per-sample (or broadcast scalar) mixing against the flipped
    batch; returns (mixed, area-corrected lam)."""
    flipped = images[::-1]
    y1, y2, x1, x2 = boxes
    lam_b = lam.reshape(lam.shape + (1,) * (images.ndim - lam.ndim))
    mixed_mix = images * lam_b + flipped * (1.0 - lam_b)
    yy = jnp.arange(h)[None, :, None, None]
    xx = jnp.arange(w)[None, None, :, None]

    def exp(v):  # (.,) box coord -> broadcastable against (B,H,W,C)
        return jnp.asarray(v).reshape(jnp.shape(v) + (1,) * 3)

    in_box = (yy >= exp(y1)) & (yy < exp(y2)) & (xx >= exp(x1)) & (xx < exp(x2))
    mixed_cut = jnp.where(in_box, flipped, images)
    lam_c = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)
    # lam == 1 (apply gate off) must stay untouched even on the cutmix branch
    use_cut = use_cutmix & (lam != 1.0)
    uc = use_cut.reshape(use_cut.shape + (1,) * (images.ndim - use_cut.ndim))
    mixed = jnp.where(uc, mixed_cut, mixed_mix)
    lam_out = jnp.where(use_cut, lam_c, lam)
    return mixed, lam_out


def mixup_cutmix(
    rng: Array, images: Array, labels: Array, cfg: MixupConfig
) -> Tuple[Array, Array]:
    """timm Mixup.__call__: images (B,H,W,C) NHWC, int labels (B,).

    Returns (mixed images, soft targets (B,K)). Pairing is batch-reversal in
    every mode (timm mixes x with x.flip(0)).
    """
    B, H, W, _ = images.shape
    targets = _one_hot_smooth(labels, cfg.num_classes, cfg.label_smoothing)
    if not cfg.active:
        return images, targets

    if cfg.mode == "batch":
        r_par, r_box = jax.random.split(rng)
        lam, use_cutmix = _params(r_par, cfg)
        boxes = _sample_box(r_box, H, W, lam, cfg)
    elif cfg.mode == "elem":
        r_par, r_box = jax.random.split(rng)
        lam, use_cutmix = _params(r_par, cfg, (B,))
        boxes = jax.vmap(lambda k, l: _sample_box(k, H, W, l, cfg))(
            jax.random.split(r_box, B), lam)
    elif cfg.mode == "pair":
        if B % 2 != 0:
            raise ValueError("mixup mode='pair' needs an even batch (timm asserts this)")
        r_par, r_box = jax.random.split(rng)
        lam_h, cut_h = _params(r_par, cfg, (B // 2,))
        boxes_h = jax.vmap(lambda k, l: _sample_box(k, H, W, l, cfg))(
            jax.random.split(r_box, B // 2), lam_h)
        # pair (i, B-1-i) shares lam and swaps the SAME box -> mirror
        lam = jnp.concatenate([lam_h, lam_h[::-1]])
        use_cutmix = jnp.concatenate([cut_h, cut_h[::-1]])
        boxes = tuple(jnp.concatenate([b, b[::-1]]) for b in boxes_h)
    else:
        raise ValueError(f"mixup mode {cfg.mode!r}: expected batch|pair|elem")

    mixed, lam = _mix_with_flipped(images, lam, use_cutmix, boxes, H, W)
    lam_t = jnp.asarray(lam, targets.dtype)
    lam_t = lam_t.reshape(lam_t.shape + (1,) * (targets.ndim - lam_t.ndim))
    soft = targets * lam_t + targets[::-1] * (1.0 - lam_t)
    return mixed.astype(images.dtype), soft
