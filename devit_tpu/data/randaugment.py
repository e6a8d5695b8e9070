"""RandAugment in pure JAX — device-side equivalent of timm's
`rand-m9-mstd0.5-inc1` policy (reference train_subdata.py:103-105 feeds this
string to timm create_transform; get_dataset.py:80-91).

Single-image ops in float [0,255] HWC domain, selected per sample with
lax.switch so the whole policy compiles into the training step. Magnitude
mappings follow the 'increasing' variants (inc1): severity grows with
magnitude for posterize/solarize/color/contrast/brightness/sharpness.

Op set (timm rand_augment_ops): AutoContrast, Equalize, Invert, Rotate,
Posterize, Solarize, SolarizeAdd, Color, Contrast, Brightness, Sharpness,
ShearX, ShearY, TranslateX, TranslateY.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.ndimage import map_coordinates

Array = jax.Array

_MAX_MAG = 10.0


# ---------------------------------------------------------------- geometry


# timm aa_params fillcolor: per-channel rounded IMAGENET mean (124,116,104)
# (timm transforms_factory img_mean), NOT gray 128.
_FILL = (124.0, 116.0, 104.0)


def _affine(image: Array, matrix: Array, center: bool = True) -> Array:
    """Apply inverse affine [a b ty; c d tx]; `center=True` anchors at the
    image center (PIL.rotate), `center=False` at the top-left origin
    (PIL ImageTransform.AffineTransform, used by timm's shear/translate).
    Bilinear (documented deviation: timm uses the train interpolation,
    bicubic — jax map_coordinates supports order <= 1)."""
    H, W, C = image.shape
    # PIL samples at continuous pixel centers: src = A*(out + 0.5) - 0.5
    # (Geometry.c affine_transform); center anchor is (H/2, W/2) continuous
    cy, cx = (H / 2.0, W / 2.0) if center else (0.0, 0.0)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    y = yy + 0.5 - cy
    x = xx + 0.5 - cx
    src_y = matrix[0] * y + matrix[1] * x + matrix[2] + cy - 0.5
    src_x = matrix[3] * y + matrix[4] * x + matrix[5] + cx - 0.5
    out = jnp.stack(
        [
            map_coordinates(image[..., c], [src_y, src_x], order=1,
                            mode="constant", cval=_FILL[c])
            for c in range(3)
        ],
        axis=-1,
    )
    return out


def _rotate(image: Array, mag: Array) -> Array:
    # PIL img.rotate(deg) is counterclockwise; inverse map verified vs PIL
    deg = mag / _MAX_MAG * 30.0
    rad = jnp.deg2rad(deg)
    c, s = jnp.cos(rad), jnp.sin(rad)
    return _affine(image, jnp.stack([c, s, jnp.zeros(()), -s, c, jnp.zeros(())]))


def _shear_x(image: Array, mag: Array) -> Array:
    # PIL AffineTransform (1, sh, 0, 0, 1, 0): src_x = x + sh*y, origin anchor
    sh = mag / _MAX_MAG * 0.3
    return _affine(image, jnp.stack([jnp.array(1.0), jnp.array(0.0), jnp.array(0.0),
                                     sh, jnp.array(1.0), jnp.array(0.0)]),
                   center=False)


def _shear_y(image: Array, mag: Array) -> Array:
    # PIL AffineTransform (1, 0, 0, sh, 1, 0): src_y = y + sh*x, origin anchor
    sh = mag / _MAX_MAG * 0.3
    return _affine(image, jnp.stack([jnp.array(1.0), sh, jnp.array(0.0),
                                     jnp.array(0.0), jnp.array(1.0), jnp.array(0.0)]),
                   center=False)


def _translate_x(image: Array, mag: Array) -> Array:
    W = image.shape[1]
    t = mag / _MAX_MAG * 0.45 * W
    return _affine(image, jnp.stack([jnp.array(1.0), jnp.array(0.0), jnp.array(0.0),
                                     jnp.array(0.0), jnp.array(1.0), t]),
                   center=False)


def _translate_y(image: Array, mag: Array) -> Array:
    H = image.shape[0]
    t = mag / _MAX_MAG * 0.45 * H
    return _affine(image, jnp.stack([jnp.array(1.0), jnp.array(0.0), t,
                                     jnp.array(0.0), jnp.array(1.0), jnp.array(0.0)]),
                   center=False)


# ---------------------------------------------------------------- intensity


def _autocontrast(image: Array, mag: Array) -> Array:
    lo = jnp.min(image, axis=(0, 1), keepdims=True)
    hi = jnp.max(image, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (image - lo) * scale
    return jnp.where(hi > lo, out, image)


def _equalize(image: Array, mag: Array) -> Array:
    """Per-channel histogram equalization, PIL ImageOps.equalize EXACT:
    step = (total - count_of_last_nonzero_bin) // 255; lut[i] =
    (step//2 + exclusive_cdf[i]) // step; step == 0 -> identity."""

    def eq_channel(ch):
        ints = jnp.clip(jnp.round(ch), 0, 255).astype(jnp.int32)
        hist = jnp.zeros(256, jnp.int32).at[ints.reshape(-1)].add(1)
        nz = hist > 0
        last_idx = 255 - jnp.argmax(nz[::-1])  # index of last nonzero bin
        step = (jnp.sum(hist) - hist[last_idx]) // 255
        cdf_excl = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                    jnp.cumsum(hist)[:-1]])
        lut = jnp.clip((step // 2 + cdf_excl) // jnp.maximum(step, 1), 0, 255)
        return jnp.where(step == 0, ints, lut[ints]).astype(jnp.float32)

    out = jnp.stack([eq_channel(image[..., c]) for c in range(3)], axis=-1)
    return out


def _invert(image: Array, mag: Array) -> Array:
    return 255.0 - image


def _posterize_bits(image: Array, bits: Array) -> Array:
    shift = (8 - bits).astype(jnp.float32)
    q = jnp.exp2(shift)
    return jnp.floor(image / q) * q


def _posterize(image: Array, mag: Array) -> Array:
    # timm PosterizeIncreasing: keep 4 - int(4*m/10) bits (m=9 -> 1 bit,
    # m=10 -> 0 bits -> black), a far stronger op than an 8-bit baseline
    bits = 4 - jnp.floor(mag / _MAX_MAG * 4).astype(jnp.int32)
    return _posterize_bits(image, bits)


def _posterize_noinc(image: Array, mag: Array) -> Array:
    # timm Posterize (non-increasing set): keep int(4*m/10) bits — severity
    # DECREASES with magnitude (m=0 -> black), as in the TF EfficientNet impl
    bits = jnp.floor(mag / _MAX_MAG * 4).astype(jnp.int32)
    return _posterize_bits(image, bits)


def _solarize(image: Array, mag: Array) -> Array:
    # timm SolarizeIncreasing: threshold 256 - int(256*m/10)
    thresh = 256.0 - jnp.floor(mag / _MAX_MAG * 256.0)
    return jnp.where(image >= thresh, 255.0 - image, image)


def _solarize_noinc(image: Array, mag: Array) -> Array:
    # timm Solarize (non-increasing): threshold int(256*m/10) directly
    thresh = jnp.floor(mag / _MAX_MAG * 256.0)
    return jnp.where(image >= thresh, 255.0 - image, image)


def _solarize_add(image: Array, mag: Array) -> Array:
    add = jnp.floor(mag / _MAX_MAG * 110.0)
    return jnp.where(image < 128.0, jnp.clip(image + add, 0, 255), image)


def _blend_factor(mag: Array) -> Array:
    # increasing variants: factor = 1 +/- 0.9*mag/10 (random sign handled by
    # caller). The NON-increasing enhance map (factor = 0.1 + 1.8*m/10,
    # unsigned) is expressed through the same 1+x blend: callers pass
    # mag' with 1 + _blend_factor(mag') == 0.1 + 1.8*mag/10 (see rand_augment).
    return mag / _MAX_MAG * 0.9


_LUMA = (0.299, 0.587, 0.114)  # ITU-R 601, PIL convert('L')


def _color(image: Array, mag: Array) -> Array:
    # PIL ImageEnhance.Color blends toward the LUMA grayscale, not the
    # channel mean (blue would otherwise weigh 2x too much)
    f = 1.0 + _blend_factor(mag)
    gray = jnp.tensordot(image, jnp.asarray(_LUMA), axes=(-1, 0))[..., None]
    return jnp.clip(gray + (image - gray) * f, 0, 255)


def _contrast(image: Array, mag: Array) -> Array:
    # PIL ImageEnhance.Contrast blends toward int(mean_of_luma + 0.5)
    f = 1.0 + _blend_factor(mag)
    mean = jnp.floor(
        jnp.mean(jnp.tensordot(image, jnp.asarray(_LUMA), axes=(-1, 0))) + 0.5)
    return jnp.clip(mean + (image - mean) * f, 0, 255)


def _brightness(image: Array, mag: Array) -> Array:
    f = 1.0 + _blend_factor(mag)
    return jnp.clip(image * f, 0, 255)


def _sharpness(image: Array, mag: Array) -> Array:
    f = 1.0 + _blend_factor(mag)
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    blurred = jax.lax.conv_general_dilated(
        image.transpose(2, 0, 1)[:, None],  # (C,1,H,W)
        kernel[None, None],
        (1, 1),
        "SAME",
    )[:, 0].transpose(1, 2, 0)
    # PIL's 3x3 filter leaves the 1-px border unfiltered — without this the
    # zero-padded SAME conv darkens borders and the blend paints a halo
    blurred = blurred.at[0, :].set(image[0, :]).at[-1, :].set(image[-1, :])
    blurred = blurred.at[:, 0].set(image[:, 0]).at[:, -1].set(image[:, -1])
    return jnp.clip(blurred + (image - blurred) * f, 0, 255)


OPS = [
    _autocontrast, _equalize, _invert, _rotate, _posterize, _solarize,
    _solarize_add, _color, _contrast, _brightness, _sharpness,
    _shear_x, _shear_y, _translate_x, _translate_y,
]
OP_NAMES = [
    "autocontrast", "equalize", "invert", "rotate", "posterize", "solarize",
    "solarize_add", "color", "contrast", "brightness", "sharpness",
    "shear_x", "shear_y", "translate_x", "translate_y",
]
# timm _RAND_CHOICE_WEIGHTS_0 ('w0', auto_augment.py) in OP_NAMES order —
# sums to exactly 1.0. Defined over the NON-increasing transform names only
# in timm-0.5.4 (w0 + inc1 KeyErrors there; parse_ra_string rejects it).
CHOICE_WEIGHTS_0 = (
    0.025,  # autocontrast
    0.005,  # equalize
    0.0,    # invert
    0.3,    # rotate
    0.0,    # posterize
    0.005,  # solarize
    0.005,  # solarize_add
    0.025,  # color
    0.005,  # contrast
    0.005,  # brightness
    0.025,  # sharpness
    0.2,    # shear_x
    0.2,    # shear_y
    0.1,    # translate_x
    0.1,    # translate_y
)
# enhance-blend op indices (color/contrast/brightness/sharpness)
_ENHANCE_OPS = {7, 8, 9, 10}
_GEOM_SIGNED = {3, 11, 12, 13, 14}  # rotate/shears/translates


def weighted_op_indices(rng: Array, num_ops: int) -> Array:
    """timm w0 op choice: num_ops indices drawn from CHOICE_WEIGHTS_0 WITHOUT
    replacement (np.random.choice(..., replace=choice_weights is None, ...)).
    Gumbel-top-k: the descending order of log-weight + Gumbel noise is
    distributionally identical to sequential weighted draws without
    replacement (Plackett-Luce); zero-weight ops are -inf and never chosen."""
    logits = jnp.log(jnp.asarray(CHOICE_WEIGHTS_0))
    gumbel = jax.random.gumbel(rng, (len(OPS),))
    return jax.lax.top_k(logits + gumbel, num_ops)[1]


def rand_augment(
    rng: Array,
    image: Array,
    magnitude: float = 9.0,
    mag_std: float = 0.5,
    num_ops: int = 2,
    prob: float = 0.5,
    inc: bool = True,
    weighted: bool = False,
) -> Array:
    """Apply `num_ops` randomly chosen ops, each with probability `prob`,
    magnitude jittered by N(0, mag_std) (the mstd0.5 part). Geometric ops
    mirror their direction with probability 0.5 (timm randomly negates).

    inc=True is the reference recipe's 'inc1' (increasing transform set:
    Posterize/Solarize/enhance severities grow with magnitude, enhance ops
    randomly negated). inc=False is timm's non-increasing set: posterize
    keeps int(4m/10) bits, solarize threshold int(256m/10), enhance factor
    0.1 + 1.8m/10 UNSIGNED (expressed through the same 1+0.9x blend via
    mag' = 2m - 10). weighted=True uses timm's w0 op-choice distribution
    (CHOICE_WEIGHTS_0), sampled WITHOUT replacement across the num_ops slots
    exactly as timm does (np.random.choice(..., replace=choice_weights is
    None, p=choice_weights)): the ops applied to one image are distinct.
    Implemented as Gumbel-top-k, which is distributionally identical to
    sequential weighted draws without replacement (Plackett-Luce)."""
    image = image.astype(jnp.float32)
    if weighted:
        weighted_idx = weighted_op_indices(jax.random.fold_in(rng, len(OPS)),
                                           num_ops)
    else:
        weighted_idx = None

    def one_op(img, k, slot):
        k_op, k_apply, k_mag, k_sign = jax.random.split(k, 4)
        if weighted_idx is not None:
            op_idx = weighted_idx[slot]
        else:
            op_idx = jax.random.randint(k_op, (), 0, len(OPS))
        if np.isinf(mag_std):
            # timm AugmentOp: magnitude_std == inf -> uniform(0, magnitude)
            # (same branch as data/host_augment.py; a gauss with inf std
            # would clip-degenerate every draw to 0 or _MAX_MAG)
            mag = jax.random.uniform(k_mag) * magnitude
        elif mag_std > 0:
            mag = magnitude + jax.random.normal(k_mag) * mag_std
        else:
            mag = jnp.asarray(magnitude, jnp.float32)
        mag = jnp.clip(mag, 0.0, _MAX_MAG)
        sign = jnp.where(jax.random.uniform(k_sign) < 0.5, -1.0, 1.0)
        signed_mag = mag * sign
        signed_ops = _GEOM_SIGNED | (_ENHANCE_OPS if inc else set())
        branches = []
        for i, op in enumerate(OPS):
            if not inc:
                if i == 4:
                    op = _posterize_noinc
                elif i == 5:
                    op = _solarize_noinc
            if i in _ENHANCE_OPS and not inc:
                # non-inc enhance: factor 0.1 + 1.8m/10 through the 1+0.9x/10
                # blend -> x = 2m - 10, no random negation
                m = 2.0 * mag - _MAX_MAG
            else:
                m = signed_mag if i in signed_ops else mag
            branches.append(lambda im, op=op, m=m: op(im, m))
        out = jax.lax.switch(op_idx, branches, img)
        return jnp.where(jax.random.uniform(k_apply) < prob, out, img)

    keys = jax.random.split(rng, num_ops)
    for i in range(num_ops):
        image = one_op(image, keys[i], i)
    return image
