"""Device-side decode/augment/normalize pipeline, compiled into the step.

Parity surface: reference `data/get_dataset.py:71-109` build_transform —
train: RandomResizedCrop + hflip (+ RandAugment, color-jitter, random erasing
via timm create_transform, :80-91; small-image RandomCrop(pad 4) swap :92-96);
eval: Resize(256/224*size, bicubic) + CenterCrop + IMAGENET normalize
(:99-109).

The reference runs these per-sample in CPU DataLoader workers; here every op
is batched JAX on uint8 device arrays, fused by XLA into the training step
(the "XLA decode/augment/normalize pipeline" of BASELINE.json north_star).
RandAugment lives in devit_tpu/data/randaugment.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    img_size: int = 224
    # timm create_transform(no_aug=True): deterministic Resize(img_size) +
    # CenterCrop + Normalize — NO randomness at all (get_dataset.py:74-78).
    # Also what cross-framework trajectory parity runs use.
    no_aug: bool = False
    hflip: bool = True
    rrc_scale: Tuple[float, float] = (0.08, 1.0)
    rrc_ratio: Tuple[float, float] = (3 / 4, 4 / 3)
    # --train-interpolation (train_subdata.py:107): RRC resample filter;
    # 'random' picks bilinear/bicubic per sample like timm's
    # RandomResizedCropAndInterpolation
    interpolation: str = "bicubic"  # bicubic | bilinear | random
    color_jitter: float = 0.4
    reprob: float = 0.25  # random erasing probability (train_subdata.py:115)
    re_mode: str = "pixel"  # --remode pixel|rand|const (train_subdata.py:117)
    re_count: int = 1  # --recount: timm max_count, count ~ randint(1, max)
    randaugment: bool = True
    ra_magnitude: int = 9  # rand-m9-mstd0.5-inc1 (train_subdata.py:103)
    ra_std: float = 0.5
    ra_num_ops: int = 2
    ra_inc: bool = True  # 'inc1' increasing transform set; False = timm's
    # non-increasing maps (recipes without inc1)
    ra_weighted: bool = False  # 'w0' op-choice weights (timm
    # _RAND_CHOICE_WEIGHTS_0; 0.5.4 supports it with the non-inc set only)
    # AutoAugment policy name ('original'/'cifar10') for --aa original etc.;
    # mutually exclusive with randaugment, host-PIL path only
    # (data/autoaugment.py)
    autoaugment: Optional[str] = None
    small_image: bool = False  # RandomCrop(pad 4) path for 32x32 inputs


def normalize(images: Array, dtype=jnp.bfloat16) -> Array:
    """uint8/float [0,255] -> standardized float."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return ((x - mean) / std).astype(dtype)


def resize_bicubic(images: Array, size: int) -> Array:
    B, H, W, C = images.shape
    return jax.image.resize(
        images.astype(jnp.float32), (B, size, size, C), method="cubic"
    )


def resize_center_crop(images: Array, scale_size: int, img_size: int,
                       method: str = "cubic") -> Array:
    """torchvision Resize(int)+CenterCrop: scale the SHORTER side to
    scale_size preserving aspect (long side int-truncated), then CenterCrop
    with top/left = int(round((dim-crop)/2)). Returns float32 pixels."""
    B, H, W, C = images.shape
    if H <= W:
        nh, nw = scale_size, int(scale_size * W / H)
    else:
        nh, nw = int(scale_size * H / W), scale_size
    x = jax.image.resize(images.astype(jnp.float32), (B, nh, nw, C), method=method)
    top = int(round((nh - img_size) / 2.0))
    left = int(round((nw - img_size) / 2.0))
    return x[:, top : top + img_size, left : left + img_size, :]


def eval_transform(images: Array, img_size: int = 224, dtype=jnp.bfloat16) -> Array:
    """Resize(int(256/224*size)) + CenterCrop(size) + normalize
    (get_dataset.py:99-109). For inputs already at target size, just normalize.
    Shapes here are static per batch, so the target dims are Python ints and
    XLA sees one fixed-shape program per source geometry."""
    B, H, W, C = images.shape
    if (H, W) == (img_size, img_size):
        return normalize(images, dtype)
    x = resize_center_crop(images, int((256 / 224) * img_size), img_size)
    return normalize(x, dtype)


def _random_resized_crop(rng: Array, image: Array, cfg: AugmentConfig) -> Array:
    """Single-image RRC with torchvision get_params semantics: 10 rejection
    tries of (area, aspect) with integer crop sizes/offsets, first valid try
    wins; on total rejection, the ratio-clamped center-crop fallback.
    (timm create_transform's RandomResizedCropAndInterpolation has the same
    sampling; reference get_dataset.py:80-91.) Vectorized: all 10 tries are
    sampled at once and the first valid one is selected with argmax."""
    H, W, C = image.shape
    r_area, r_ratio, r_pos = jax.random.split(rng, 3)
    area = H * W * jax.random.uniform(
        r_area, (10,), minval=cfg.rrc_scale[0], maxval=cfg.rrc_scale[1]
    )
    ratio = jnp.exp(jax.random.uniform(
        r_ratio, (10,), minval=jnp.log(cfg.rrc_ratio[0]),
        maxval=jnp.log(cfg.rrc_ratio[1]),
    ))
    ws = jnp.round(jnp.sqrt(area * ratio))
    hs = jnp.round(jnp.sqrt(area / ratio))
    valid = (ws > 0) & (ws <= W) & (hs > 0) & (hs <= H)
    idx = jnp.argmax(valid)  # first True (argmax returns first max)
    any_valid = jnp.any(valid)

    # torchvision fallback (static for a static source size): clamp aspect,
    # center crop
    in_ratio = W / H
    if in_ratio < cfg.rrc_ratio[0]:
        fw, fh = W, int(round(W / cfg.rrc_ratio[0]))
    elif in_ratio > cfg.rrc_ratio[1]:
        fh, fw = H, int(round(H * cfg.rrc_ratio[1]))
    else:
        fw, fh = W, H

    w = jnp.where(any_valid, ws[idx], float(fw))
    h = jnp.where(any_valid, hs[idx], float(fh))
    # integer offsets: i ~ U{0, H-h}, j ~ U{0, W-w} (torchvision randint)
    ki, kj = jax.random.split(r_pos)
    i = jax.random.randint(ki, (), 0, (H - h + 1).astype(jnp.int32))
    j = jax.random.randint(kj, (), 0, (W - w + 1).astype(jnp.int32))
    y0 = jnp.where(any_valid, i.astype(jnp.float32), (H - fh) // 2)
    x0 = jnp.where(any_valid, j.astype(jnp.float32), (W - fw) // 2)

    # crop+resize in one scale_and_translate, filter per --train-interpolation
    # (bicubic is the reference's default)
    scale = jnp.array([cfg.img_size / h, cfg.img_size / w])
    translation = -jnp.array([y0, x0]) * scale

    def rrc(method):
        return jax.image.scale_and_translate(
            image.astype(jnp.float32),
            (cfg.img_size, cfg.img_size, C),
            (0, 1),
            scale,
            translation,
            method=method,
        )

    if cfg.interpolation == "random":
        # timm 'random': coin-flip bilinear/bicubic per sample. Both filters
        # are computed and selected — under vmap a cond would do the same,
        # and RRC resampling is a negligible slice of the step. Coin index 2:
        # split(r_pos) above yields fold_in indices 0/1 (ki/kj), so index 1
        # would alias the x-offset draw and couple filter choice to position.
        coin = jax.random.uniform(jax.random.fold_in(r_pos, 2)) < 0.5
        return jnp.where(coin, rrc("cubic"), rrc("linear"))
    method = {"bicubic": "cubic", "bilinear": "linear"}.get(cfg.interpolation)
    if method is None:
        raise ValueError(f"--train-interpolation {cfg.interpolation!r}: "
                         "expected bicubic|bilinear|random")
    return rrc(method)


def _random_crop_pad4(rng: Array, image: Array, cfg: AugmentConfig) -> Array:
    """Small-image branch (get_dataset.py:92-96): pad 4 reflect? torchvision
    RandomCrop(padding=4) zero-pads; crop back to size."""
    H, W, C = image.shape
    padded = jnp.pad(image.astype(jnp.float32), ((4, 4), (4, 4), (0, 0)))
    oy, ox = jax.random.randint(rng, (2,), 0, 9)
    return jax.lax.dynamic_slice(padded, (oy, ox, 0), (H, W, C))


def _color_jitter(rng: Array, image: Array, strength: float) -> Array:
    """torchvision ColorJitter(brightness=s, contrast=s, saturation=s):
    factors ~ U[max(0, 1-s), 1+s], the three ops applied in a RANDOM ORDER
    (torchvision shuffles per call), each clamping to the valid range.
    Contrast blends toward the mean of the GRAYSCALE image (torchvision
    F.adjust_contrast), saturation toward per-pixel grayscale. ITU-R 601
    luma weights, matching torchvision rgb_to_grayscale."""
    rb, rc, rs, rp = jax.random.split(rng, 4)
    lo = max(0.0, 1.0 - strength)
    b = jax.random.uniform(rb, minval=lo, maxval=1 + strength)
    c = jax.random.uniform(rc, minval=lo, maxval=1 + strength)
    s = jax.random.uniform(rs, minval=lo, maxval=1 + strength)
    luma_w = jnp.asarray([0.299, 0.587, 0.114], image.dtype)

    def brightness(x):
        return jnp.clip(x * b, 0.0, 255.0)

    def contrast(x):
        gray_mean = jnp.mean(jnp.tensordot(x, luma_w, axes=(-1, 0)))
        return jnp.clip(gray_mean + c * (x - gray_mean), 0.0, 255.0)

    def saturation(x):
        gray = jnp.tensordot(x, luma_w, axes=(-1, 0))[..., None]
        return jnp.clip(gray + s * (x - gray), 0.0, 255.0)

    ops = [brightness, contrast, saturation]
    # all 6 permutations, selected uniformly (torchvision randperm(3))
    perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]

    def apply_perm(p):
        def f(x):
            for i in p:
                x = ops[i](x)
            return x
        return f

    k = jax.random.randint(rp, (), 0, len(perms))
    return jax.lax.switch(k, [apply_perm(p) for p in perms], image)


def _erase_one_box(rng: Array, image: Array, count: Array, mode: str) -> Array:
    """One timm erase box: 10-try rejection — sample (area/count, log-uniform
    aspect), round, accept the first with h < H and w < W; no valid try -> no
    erase (never clip an oversized box to fit). Fill per --remode: 'pixel' =
    per-pixel N(0,1), 'rand' = one N(0,1) color per channel, 'const' = 0."""
    H, W, C = image.shape
    r_area, r_ratio, r_pos, r_noise = jax.random.split(rng, 4)
    area = (H * W / count) * jax.random.uniform(r_area, (10,), minval=0.02,
                                                maxval=1 / 3)
    ratio = jnp.exp(jax.random.uniform(r_ratio, (10,), minval=jnp.log(0.3),
                                       maxval=jnp.log(10 / 3)))
    ehs = jnp.round(jnp.sqrt(area * ratio))
    ews = jnp.round(jnp.sqrt(area / ratio))
    valid = (ehs > 0) & (ehs < H) & (ews > 0) & (ews < W)
    idx = jnp.argmax(valid)  # first valid try
    eh = ehs[idx]
    ew = ews[idx]
    py, px = jax.random.uniform(r_pos, (2,))
    y0 = jnp.floor(py * (H - eh + 1))  # randint(0, H - h) inclusive
    x0 = jnp.floor(px * (W - ew + 1))
    yy = jnp.arange(H)[:, None, None].astype(jnp.float32)
    xx = jnp.arange(W)[None, :, None].astype(jnp.float32)
    in_box = (yy >= y0) & (yy < y0 + eh) & (xx >= x0) & (xx < x0 + ew)
    if mode == "pixel":
        fill = jax.random.normal(r_noise, image.shape, image.dtype)
    elif mode == "rand":
        fill = jnp.broadcast_to(
            jax.random.normal(r_noise, (1, 1, C), image.dtype), image.shape)
    elif mode == "const":
        fill = jnp.zeros_like(image)
    else:
        raise ValueError(f"--remode {mode!r}: expected pixel|rand|const")
    return jnp.where(in_box & jnp.any(valid), fill, image)


def _random_erase(rng: Array, image: Array, prob: float,
                  mode: str = "pixel", max_count: int = 1) -> Array:
    """timm RandomErasing (train_subdata.py:115-121), applied in the
    NORMALIZED domain (timm appends it after ToTensor+Normalize). One apply
    coin per image; count ~ randint(1, max_count) boxes (timm create_transform
    maps --recount to max_count with min_count=1), each budgeted area/count
    and filled per --remode. Boxes land sequentially, so overlaps overwrite
    exactly like the reference's in-place tensor writes."""
    r_apply, r_count, r_boxes = jax.random.split(rng, 3)
    apply = jax.random.uniform(r_apply) < prob
    if max_count == 1:
        count = jnp.asarray(1.0)
    else:  # python random.randint is INCLUSIVE on both ends
        count = jax.random.randint(r_count, (), 1, max_count + 1).astype(jnp.float32)
    out = image
    for k, kr in enumerate(jax.random.split(r_boxes, max_count)):
        erased = _erase_one_box(kr, out, count, mode)
        out = jnp.where(k < count, erased, out)
    return jnp.where(apply, out, image)


def finish_transform(
    rng: Array, images: Array, cfg: AugmentConfig, dtype=jnp.bfloat16
) -> Array:
    """Device-side tail for HOST-augmented batches (data/host_augment.py):
    normalize + random erasing only — RRC/flip/RandAugment already happened
    in the prefetch workers, mirroring the reference's CPU/GPU split (timm
    transforms in DataLoader workers; RandomErasing after Normalize)."""
    out = normalize(images, jnp.float32)
    if cfg.reprob > 0:
        keys = jax.random.split(rng, images.shape[0])
        out = jax.vmap(lambda k, im: _random_erase(
            k, im, cfg.reprob, cfg.re_mode, cfg.re_count))(keys, out)
    return out.astype(dtype)


def train_transform(
    rng: Array, images: Array, cfg: AugmentConfig, dtype=jnp.bfloat16
) -> Array:
    """Batched train augmentation on device. images: uint8 (B,H,W,3)."""
    if cfg.autoaugment is not None and not cfg.no_aug:
        raise ValueError(
            "AutoAugment (--aa original/cifar10) has no device implementation "
            "— its geometric ops are host-PIL only (data/autoaugment.py); "
            "use --aug-backend auto/host (cli.common.make_train_pipeline "
            "routes AA to the host-PIL backend)")
    if cfg.no_aug:
        # timm transforms_noaug_train: Resize(img_size)+CenterCrop+Normalize,
        # fully deterministic (note: plain Resize(size), NOT the eval path's
        # 256/224 upscale). The resize honors --train-interpolation, with
        # timm's 'random' -> bilinear fallback (timm 0.5.4 transforms_factory).
        B, H, W, C = images.shape
        method = {"bicubic": "cubic", "bilinear": "linear",
                  "random": "linear"}[cfg.interpolation]
        x = (images.astype(jnp.float32) if (H, W) == (cfg.img_size, cfg.img_size)
             else resize_center_crop(images, cfg.img_size, cfg.img_size,
                                     method=method))
        return normalize(x, dtype)
    B = images.shape[0]
    keys = jax.random.split(rng, B * 5).reshape(B, 5)

    def per_sample(ks, img):
        img = img.astype(jnp.float32)
        if cfg.small_image:
            img = _random_crop_pad4(ks[0], img, cfg)
        else:
            img = _random_resized_crop(ks[0], img, cfg)
        if cfg.hflip:
            img = jnp.where(jax.random.uniform(ks[1]) < 0.5, img[:, ::-1], img)
        if cfg.randaugment:
            from devit_tpu.data.randaugment import rand_augment

            img = rand_augment(ks[2], img, magnitude=cfg.ra_magnitude,
                               mag_std=cfg.ra_std, num_ops=cfg.ra_num_ops,
                               inc=cfg.ra_inc, weighted=cfg.ra_weighted)
        elif cfg.color_jitter > 0:
            # timm applies color-jitter only when no AA policy is set
            img = _color_jitter(ks[3], img, cfg.color_jitter)
        return img

    out = jax.vmap(per_sample)(keys, images)
    out = normalize(out, jnp.float32)
    if cfg.reprob > 0:
        # timm appends RandomErasing AFTER normalization: the 'pixel' fill is
        # N(0,1) in the normalized domain, not pixel-space noise
        out = jax.vmap(lambda k, im: _random_erase(
            k, im, cfg.reprob, cfg.re_mode, cfg.re_count))(keys[:, 4], out)
    return out.astype(dtype)
