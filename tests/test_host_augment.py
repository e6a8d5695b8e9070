"""Host-side PIL augmentation pipeline (data/host_augment.py): the
reference's CPU-worker architecture — RRC + hflip + timm RandAugment with
literal PIL calls, threaded in BatchIterator's prefetch workers."""

import numpy as np

from devit_tpu.data.datasets import BatchIterator, synthetic_dataset
from devit_tpu.data.host_augment import make_host_train_augment
from devit_tpu.data.pipeline import AugmentConfig


CFG = AugmentConfig(img_size=32)


def _batch(n=8, s=48):
    return np.random.default_rng(0).integers(0, 256, (n, s, s, 3), np.uint8)


def test_shapes_and_dtype():
    tf = make_host_train_augment(CFG, seed=0)
    out = tf(_batch(), epoch=0, batch_index=0)
    assert out.shape == (8, 32, 32, 3) and out.dtype == np.uint8


def test_deterministic_per_epoch_and_batch():
    tf = make_host_train_augment(CFG, seed=0)
    a = tf(_batch(), 3, 7)
    b = tf(_batch(), 3, 7)
    np.testing.assert_array_equal(a, b)  # resumable epochs need this
    c = tf(_batch(), 4, 7)
    d = tf(_batch(), 3, 8)
    assert not np.array_equal(a, c) and not np.array_equal(a, d)


def test_train_interpolation_variants():
    """--train-interpolation threads through both augmentation backends:
    bilinear differs from bicubic on the same stream; 'random' mixes them
    per sample (timm RandomResizedCropAndInterpolation semantics)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from devit_tpu.data.pipeline import train_transform

    # host path
    outs = {}
    for interp in ("bicubic", "bilinear", "random"):
        cfg = dataclasses.replace(CFG, interpolation=interp)
        outs[interp] = make_host_train_augment(cfg, seed=0)(_batch(), 0, 0)
    assert not np.array_equal(outs["bicubic"], outs["bilinear"])
    # random draws per-sample coins on an independent stream; just shape-check
    assert outs["random"].shape == outs["bicubic"].shape

    # device path (cfg without RA so the only difference is the filter)
    imgs = jnp.asarray(_batch(16))
    dev = {}
    for interp in ("bicubic", "bilinear", "random"):
        cfg = dataclasses.replace(CFG, randaugment=False, reprob=0.0,
                                  color_jitter=0.0, interpolation=interp)
        dev[interp] = np.asarray(train_transform(
            jax.random.key(0), imgs, cfg, dtype=jnp.float32))
    assert not np.allclose(dev["bicubic"], dev["bilinear"])
    # 'random' must only toggle the FILTER: per sample the output equals the
    # fixed-filter variant with the identical crop (the coin key is fold_in
    # index 2, off the ki/kj offset draws — an index-1 coin would alias the
    # x-offset stream and change the crops), and both filters occur in 16.
    picked = []
    for k in range(16):
        is_cubic = np.array_equal(dev["random"][k], dev["bicubic"][k])
        is_linear = np.array_equal(dev["random"][k], dev["bilinear"][k])
        assert is_cubic or is_linear, f"sample {k}: crop changed under 'random'"
        picked.append(is_cubic)
    assert 0 < sum(picked) < 16, "coin never flipped across 16 samples"

    # --no-aug honors --train-interpolation (timm transforms_noaug_train),
    # with 'random' falling back to bilinear
    from devit_tpu.data.pipeline import normalize, resize_center_crop

    na = {}
    for interp in ("bicubic", "bilinear", "random"):
        cfg = dataclasses.replace(CFG, no_aug=True, interpolation=interp)
        na[interp] = np.asarray(train_transform(
            jax.random.key(0), imgs, cfg, dtype=jnp.float32))
    assert not np.allclose(na["bicubic"], na["bilinear"])
    np.testing.assert_array_equal(na["random"], na["bilinear"])
    expect = np.asarray(normalize(
        resize_center_crop(imgs, 32, 32, method="linear"), jnp.float32))
    np.testing.assert_array_equal(na["bilinear"], expect)


def test_per_sample_independent_streams():
    tf = make_host_train_augment(CFG, seed=0)
    imgs = np.repeat(_batch(1), 8, axis=0)  # identical inputs
    out = tf(imgs, 0, 0)
    # independent rng per sample -> the augmented copies differ
    assert any(not np.array_equal(out[0], out[k]) for k in range(1, 8))


def test_batch_iterator_applies_host_transform_in_prefetch():
    ds = synthetic_dataset(4, 64, img_size=48)
    seen = []

    def tf(imgs, epoch, k):
        seen.append((epoch, k, imgs.shape))
        return np.zeros((len(imgs), 32, 32, 3), np.uint8)

    it = BatchIterator(ds, 16, shuffle=True, seed=0, host_transform=tf)
    it.set_epoch(2)
    batches = list(it)
    assert len(batches) == 4
    for imgs, labels in batches:
        assert imgs.shape == (16, 32, 32, 3) and (imgs == 0).all()
        assert labels.shape == (16,)
    assert sorted(k for _e, k, _s in seen) == [0, 1, 2, 3]
    assert all(e == 2 for e, _k, _s in seen)


def test_no_randaugment_variant_still_crops():
    cfg = AugmentConfig(img_size=32, randaugment=False)
    tf = make_host_train_augment(cfg, seed=1)
    out = tf(_batch(), 0, 0)
    assert out.shape == (8, 32, 32, 3)


def test_mstdinf_uniform_magnitude_branch():
    """'rand-m9-mstdinf' (timm's magnitude_std == inf -> uniform(0, m))
    must work on BOTH augmentation backends — the device path previously
    computed gauss(m, inf) which clip-degenerated every draw to 0 or 10."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from devit_tpu.cli.common import parse_ra_string
    from devit_tpu.data.host_augment import _rand_augment_pil
    from devit_tpu.data.randaugment import rand_augment

    ra, mag, std, num_ops, inc, weighted = parse_ra_string("rand-m9-mstdinf-inc1")
    assert ra and mag == 9 and np.isinf(std) and num_ops == 2
    assert inc and not weighted

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    out = _rand_augment_pil(img, np.random.default_rng(1), 9.0, float("inf"),
                            num_ops=4, prob=1.0)
    assert np.asarray(out).shape == (32, 32, 3)

    dev = rand_augment(jax.random.key(0),
                       jnp.asarray(np.asarray(img), jnp.float32),
                       magnitude=9.0, mag_std=float("inf"), num_ops=4)
    arr = np.asarray(dev)
    assert arr.shape == (32, 32, 3) and np.isfinite(arr).all()


def test_parse_ra_string_contract():
    """The full timm-0.5.4 recipe grammar parses (m, n, mstd, inc, w0);
    components that are timm>=0.6-only or that CRASH timm-0.5.4 are rejected
    loudly instead of silently training a different policy."""
    import pytest

    from devit_tpu.cli.common import parse_ra_string

    assert parse_ra_string("rand-m9-mstd0.5-inc1") == (True, 9, 0.5, 2, True, False)
    assert parse_ra_string("rand-m7-n4-mstd0.5-inc1") == (True, 7, 0.5, 4, True, False)
    # the non-increasing transform set (no inc1) and the w0 weights
    assert parse_ra_string("rand-m9-mstd0.5") == (True, 9, 0.5, 2, False, False)
    assert parse_ra_string("rand-m9-mstd0.5-inc0") == (True, 9, 0.5, 2, False, False)
    assert parse_ra_string("rand-m9-mstd0.5-w0") == (True, 9, 0.5, 2, False, True)
    assert parse_ra_string("") == (False, 9, 0.5, 2, True, False)
    assert parse_ra_string("original") == (False, 9, 0.5, 2, True, False)
    for bad in ("rand-m9-w0-inc1",        # KeyErrors in timm-0.5.4
                "rand-m9-w1",             # timm asserts weight_idx == 0
                "rand-m9-mmax20-inc1",    # timm>=0.6 component
                "rand-m9-p0.5-inc1",      # timm>=0.6 component
                "rand-m9-bogus-inc1"):    # unknown token
        with pytest.raises(ValueError):
            parse_ra_string(bad)


def test_ra_geometric_ops_honor_train_interpolation():
    """--train-interpolation must drive the RA geometric ops' resampling
    (timm 0.5.4 aa_params['interpolation']), not just the RRC: bilinear gives
    timm's exact bilinear warp, and 'random' picks per op application."""
    from PIL import Image

    from devit_tpu.data.host_augment import _FILL, _apply_op

    rng_img = np.random.default_rng(3)
    img = Image.fromarray(rng_img.integers(0, 255, (32, 32, 3),
                                           dtype=np.uint8))
    got = np.asarray(_apply_op(img, "rotate", 7.0, np.random.default_rng(0),
                               resample=Image.BILINEAR))
    want = np.asarray(img.rotate(21.0, resample=Image.BILINEAR,
                                 fillcolor=_FILL))
    np.testing.assert_array_equal(got, want)
    bicubic = np.asarray(_apply_op(img, "rotate", 7.0,
                                   np.random.default_rng(0)))
    assert not np.array_equal(got, bicubic)
    # 'random': the tuple form must yield one of the two filters
    rnd = np.asarray(_apply_op(img, "shear_x", 5.0, np.random.default_rng(4),
                               resample=(Image.BILINEAR, Image.BICUBIC)))
    opts = [np.asarray(_apply_op(img, "shear_x", 5.0,
                                 np.random.default_rng(9), resample=r))
            for r in (Image.BILINEAR, Image.BICUBIC)]
    assert any(np.array_equal(rnd, o) for o in opts)
