"""RandAugment op parity vs PIL — the ground truth the reference's timm
policy (rand-m9-mstd0.5-inc1) is built on. Each fixed op is compared against
the corresponding PIL/timm implementation on a real random image.
(Magnitude mappings: timm 'increasing' variants, timm rand_augment_ops.)"""

import jax
import numpy as np
import jax.numpy as jnp
from PIL import Image, ImageEnhance, ImageOps

from devit_tpu.data import randaugment as R

RNG = np.random.default_rng(42)
IMG = RNG.integers(0, 256, (48, 40, 3), np.uint8)
PIL_IMG = Image.fromarray(IMG)
JIMG = jnp.asarray(IMG, jnp.float32)


def test_posterize_matches_pil_increasing():
    # timm PosterizeIncreasing: keep 4 - int(4*m/10) bits
    for m in (0.0, 3.0, 7.0, 9.0):
        bits = 4 - int(4 * m / 10)
        want = np.asarray(ImageOps.posterize(PIL_IMG, bits))
        got = np.asarray(R._posterize(JIMG, jnp.asarray(m)))
        np.testing.assert_array_equal(got.astype(np.uint8), want, err_msg=f"m={m}")


def test_solarize_matches_pil():
    for m in (0.0, 4.0, 9.0):
        thresh = 256 - int(256 * m / 10)
        want = np.asarray(ImageOps.solarize(PIL_IMG, thresh))
        got = np.asarray(R._solarize(JIMG, jnp.asarray(m)))
        np.testing.assert_array_equal(got.astype(np.uint8), want, err_msg=f"m={m}")


def test_equalize_matches_pil_exactly():
    want = np.asarray(ImageOps.equalize(PIL_IMG))
    got = np.asarray(R._equalize(JIMG, jnp.asarray(0.0)))
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_equalize_near_constant_channel_is_pil_identity():
    # PIL's step==0 case (single-bin histogram) leaves the channel unchanged
    flat = np.full((32, 32, 3), 77, np.uint8)
    want = np.asarray(ImageOps.equalize(Image.fromarray(flat)))
    got = np.asarray(R._equalize(jnp.asarray(flat, jnp.float32), jnp.asarray(0.0)))
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_color_contrast_brightness_match_pil_enhance():
    # increasing blend: factor = 1 +/- 0.9*m/10; PIL rounds through uint8
    for m, sign in ((9.0, 1.0), (9.0, -1.0), (4.0, 1.0)):
        f = 1.0 + 0.9 * m / 10 * sign
        for ours, pil_cls in ((R._color, ImageEnhance.Color),
                              (R._contrast, ImageEnhance.Contrast),
                              (R._brightness, ImageEnhance.Brightness)):
            want = np.asarray(pil_cls(PIL_IMG).enhance(f), np.float32)
            got = np.asarray(ours(JIMG, jnp.asarray(m * sign)))
            assert np.abs(got - want).max() <= 2.0, (ours.__name__, m, sign)


def test_sharpness_matches_pil_enhance():
    for m, sign in ((9.0, 1.0), (9.0, -1.0)):
        f = 1.0 + 0.9 * m / 10 * sign
        want = np.asarray(ImageEnhance.Sharpness(PIL_IMG).enhance(f), np.float32)
        got = np.asarray(R._sharpness(JIMG, jnp.asarray(m * sign)))
        # PIL leaves the 1-px border unfiltered — ours must too (no halo)
        np.testing.assert_allclose(got[0], IMG[0].astype(np.float32), atol=1.0)
        assert np.abs(got - want).max() <= 2.0, (m, sign)


def test_noninc_posterize_solarize_match_pil():
    """The NON-increasing level maps (recipes without inc1): posterize keeps
    int(4m/10) bits, solarize threshold int(256m/10) — severity DECREASES
    with magnitude, per timm's base _RAND_TRANSFORMS."""
    for m in (0.0, 3.0, 7.0, 10.0):
        bits = int(4 * m / 10)
        want = np.asarray(ImageOps.posterize(PIL_IMG, bits))
        got = np.asarray(R._posterize_noinc(JIMG, jnp.asarray(m)))
        np.testing.assert_array_equal(got.astype(np.uint8), want, err_msg=f"m={m}")
    for m in (0.0, 4.0, 9.0, 10.0):
        thresh = int(256 * m / 10)
        want = np.asarray(ImageOps.solarize(PIL_IMG, thresh))
        got = np.asarray(R._solarize_noinc(JIMG, jnp.asarray(m)))
        np.testing.assert_array_equal(got.astype(np.uint8), want, err_msg=f"m={m}")


def test_noninc_enhance_map_through_blend():
    """Non-inc enhance factor 0.1 + 1.8m/10 is reached through the shared
    1 + 0.9x/10 blend with x = 2m - 10 (rand_augment's non-inc branch)."""
    for m in (0.0, 2.5, 9.0, 10.0):
        f = 0.1 + 1.8 * m / 10
        x = 2.0 * m - 10.0
        assert abs((1.0 + 0.9 * x / 10) - f) < 1e-12
        want = np.asarray(ImageEnhance.Brightness(PIL_IMG).enhance(f), np.float32)
        got = np.asarray(R._brightness(JIMG, jnp.asarray(x)))
        assert np.abs(got - want).max() <= 2.0, m


def test_host_noninc_ops_match_pil():
    """The host-PIL backend's non-inc bodies (inc=False) are the literal
    timm-0.5.4 calls: posterize/solarize level maps + unsigned enhance."""
    from devit_tpu.data.host_augment import _apply_op

    rng = np.random.default_rng(0)
    for m in (0.0, 7.0, 10.0):
        got = np.asarray(_apply_op(PIL_IMG, "posterize", m, rng, inc=False))
        want = np.asarray(ImageOps.posterize(PIL_IMG, int(4 * m / 10)))
        np.testing.assert_array_equal(got, want)
        got = np.asarray(_apply_op(PIL_IMG, "solarize", m, rng, inc=False))
        want = np.asarray(ImageOps.solarize(PIL_IMG, int(256 * m / 10)))
        np.testing.assert_array_equal(got, want)
        got = np.asarray(_apply_op(PIL_IMG, "color", m, rng, inc=False))
        want = np.asarray(ImageEnhance.Color(PIL_IMG).enhance(0.1 + 1.8 * m / 10))
        np.testing.assert_array_equal(got, want)


def test_weighted_op_choice_distribution():
    """w0: both backends draw the num_ops ops for one image from timm's
    _RAND_CHOICE_WEIGHTS_0 WITHOUT replacement (timm RandAugment.__call__:
    np.random.choice(ops, num_layers, replace=choice_weights is None, p=w))
    — the ops applied to one image are distinct; rotate ~0.3 first draw,
    invert/posterize never."""
    from devit_tpu.data import host_augment as H
    from devit_tpu.data.host_augment import _CHOICE_WEIGHTS_0, _OP_NAMES

    assert abs(sum(_CHOICE_WEIGHTS_0) - 1.0) < 1e-12
    assert tuple(R.CHOICE_WEIGHTS_0) == tuple(_CHOICE_WEIGHTS_0)
    assert _CHOICE_WEIGHTS_0[_OP_NAMES.index("rotate")] == 0.3
    assert _CHOICE_WEIGHTS_0[_OP_NAMES.index("invert")] == 0.0
    assert _CHOICE_WEIGHTS_0[_OP_NAMES.index("posterize")] == 0.0

    # JAX backend: the actual selection helper rand_augment uses
    keys = jax.random.split(jax.random.key(1), 3000)
    idx = np.asarray(jax.vmap(lambda k: R.weighted_op_indices(k, 2))(keys))
    assert np.all(idx[:, 0] != idx[:, 1]), "ops within one image not distinct"
    for zero_op in ("invert", "posterize"):
        assert not np.any(idx == _OP_NAMES.index(zero_op))
    frac_rotate = np.mean(idx[:, 0] == _OP_NAMES.index("rotate"))
    assert 0.25 < frac_rotate < 0.35  # first draw marginal == the raw weight

    # host-PIL backend: record the names _rand_augment_pil actually applies
    rng = np.random.default_rng(1)
    per_image = []
    orig = H._apply_op
    H._apply_op = lambda img, name, *a, **kw: (per_image[-1].append(name), img)[1]
    try:
        for _ in range(1500):
            per_image.append([])
            H._rand_augment_pil(PIL_IMG, rng, 9.0, 0.0, num_ops=2, prob=1.0,
                                weighted=True)
    finally:
        H._apply_op = orig
    names = np.array(per_image)
    assert names.shape == (1500, 2)
    assert np.all(names[:, 0] != names[:, 1]), "host ops not distinct"
    assert not np.any(names == "invert") and not np.any(names == "posterize")
    frac_rotate = np.mean(names[:, 0] == "rotate")
    assert 0.25 < frac_rotate < 0.35


def test_shear_matches_pil_affine_transform():
    """PIL/timm ShearX: img.transform(size, AFFINE, (1, sh, 0, 0, 1, 0)) —
    horizontal displacement proportional to y, anchored at the ORIGIN."""
    sh = 0.3 * 9.0 / 10  # m=9
    for ours, data in ((R._shear_x, (1, sh, 0, 0, 1, 0)),
                       (R._shear_y, (1, 0, 0, sh, 1, 0))):
        want = np.asarray(
            PIL_IMG.transform(PIL_IMG.size, Image.AFFINE, data,
                              resample=Image.BILINEAR,
                              fillcolor=(124, 116, 104)), np.float32)
        got = np.asarray(ours(JIMG, jnp.asarray(9.0)))
        # interior comparison (border fill weighting differs by resampler)
        diff = np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2])
        assert np.median(diff) <= 1.0 and np.mean(diff) <= 4.0, ours.__name__


def test_translate_matches_pil_affine_transform():
    H, W = IMG.shape[:2]
    t = 0.45 * 9.0 / 10
    want = np.asarray(
        PIL_IMG.transform(PIL_IMG.size, Image.AFFINE, (1, 0, t * W, 0, 1, 0),
                          resample=Image.BILINEAR, fillcolor=(124, 116, 104)),
        np.float32)
    got = np.asarray(R._translate_x(JIMG, jnp.asarray(9.0)))
    diff = np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2])
    assert np.median(diff) <= 1.0 and np.mean(diff) <= 4.0


def test_rotate_matches_pil():
    for m in (9.0, -9.0):
        deg = 30.0 * m / 10
        want = np.asarray(PIL_IMG.rotate(deg, resample=Image.BILINEAR,
                                         fillcolor=(124, 116, 104)), np.float32)
        got = np.asarray(R._rotate(JIMG, jnp.asarray(m)))
        diff = np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2])
        assert np.median(diff) <= 1.0 and np.mean(diff) <= 4.0, m
