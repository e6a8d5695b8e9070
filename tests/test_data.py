"""Data layer tests: splitter parity, division views, device-side pipeline."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.data.datasets import ArrayDataset, BatchIterator, synthetic_dataset
from devit_tpu.data.pipeline import AugmentConfig, eval_transform, normalize, train_transform
from devit_tpu.data.randaugment import OPS, rand_augment
from devit_tpu.data.splitter import DivisionManifest, local_label_map, split_classes


def test_split_classes_matches_reference_semantics():
    """Bit-exact with splite_dataset.py:51-56: random.seed(42), shuffle,
    PROPORTIONAL chunk boundaries i*n//D (NOT floor-chunks-with-remainder-
    in-last — for remainder >= 2 those differ; the reference's own formula
    at all five of its dataset branches is the proportional one)."""
    for n, d in [(100, 4), (10, 3), (102, 4), (196, 8), (37, 4)]:
        random.seed(42)
        label_list = list(range(n))
        random.shuffle(label_list)
        expected = [
            label_list[i * n // d : (i + 1) * n // d]
            if i < d - 1 else label_list[(d - 1) * n // d :]
            for i in range(d)
        ]  # verbatim splite_dataset.py:55-56
        got = split_classes(n, d, seed=42)
        assert got == expected, (n, d)
        flat = sorted(x for div in got for x in div)
        assert flat == list(range(n))
    # the flowers (102/4) case pins the proportional sizes — a remainder-to-
    # last split would give [25,25,25,27] with different membership
    assert [len(x) for x in split_classes(102, 4)] == [25, 26, 25, 26]


def test_local_label_map_string_sorted():
    """ImageFolder sorts directory names lexicographically: '10' < '2'."""
    m = local_label_map([2, 10, 1])
    assert m == {1: 0, 10: 1, 2: 2}


def test_manifest_division_view_and_remap():
    man = DivisionManifest.create(10, 2, seed=42)
    ds = synthetic_dataset(10, 64, img_size=8, seed=0)
    v0 = ds.division_view(man, 0)
    v1 = ds.division_view(man, 1)
    assert len(v0) + len(v1) == 64
    assert v0.num_classes == 5 and v1.num_classes == 5
    assert set(np.unique(v0.labels)).issubset(set(range(5)))
    # local -> global roundtrip
    g = man.global_label_of(0, 0)
    assert g in man.classes(0)
    mat = man.division_to_global_matrix()
    assert mat.shape == (2, 5)
    assert sorted(mat.flatten().tolist()) == list(range(10))


def test_batch_iterator_epochs_and_ra():
    ds = synthetic_dataset(4, 50, img_size=8)
    it = BatchIterator(ds, 16, shuffle=True, seed=1)
    batches = list(it)
    assert len(batches) == 3 and batches[0][0].shape == (16, 8, 8, 3)
    it.set_epoch(1)
    b2 = list(it)
    assert not np.array_equal(batches[0][1], b2[0][1])  # reshuffled
    # repeated augmentation: samples appear multiple times
    ra = BatchIterator(ds, 16, shuffle=True, seed=1, repeated_aug=3)
    labels = np.concatenate([b[1] for b in ra])
    assert len(labels) == 48


def test_eval_transform_shapes_and_range():
    imgs = np.random.default_rng(0).integers(0, 256, (2, 256, 256, 3), np.uint8)
    out = eval_transform(jnp.asarray(imgs), img_size=224, dtype=jnp.float32)
    assert out.shape == (2, 224, 224, 3)
    assert abs(float(jnp.mean(out))) < 1.0  # roughly standardized
    # same-size input path
    imgs32 = np.random.default_rng(0).integers(0, 256, (2, 32, 32, 3), np.uint8)
    out32 = eval_transform(jnp.asarray(imgs32), img_size=32, dtype=jnp.float32)
    np.testing.assert_allclose(out32, normalize(jnp.asarray(imgs32), jnp.float32), rtol=1e-6)


def test_eval_transform_aspect_preserving_matches_torchvision():
    """Non-square input: the reference resizes the SHORTER side to 256/224*size
    and center-crops (get_dataset.py:99-105); a square resize would squash
    aspect and feed different pixels. Parity vs torchvision on a smooth image
    (interpolation kernels differ slightly at hard edges, so use low-frequency
    content and a loose-but-meaningful tolerance; the aspect-squash bug this
    guards against produces errors ~100x larger)."""
    import torch
    import torch.nn.functional as TF

    def tv_resize_center_crop(img_np, short=256, crop=224):
        """torchvision Resize(int)+CenterCrop semantics via torch.interpolate
        (torchvision's tensor backend calls exactly this with antialias)."""
        h, w, _ = img_np.shape
        if h <= w:
            nh, nw = short, int(short * w / h)
        else:
            nh, nw = int(short * h / w), short
        t = torch.from_numpy(img_np).permute(2, 0, 1)[None].float()
        r = TF.interpolate(t, size=(nh, nw), mode="bicubic", antialias=True)
        top = int(round((nh - crop) / 2.0))
        left = int(round((nw - crop) / 2.0))
        r = r[:, :, top : top + crop, left : left + crop]
        return r[0].permute(1, 2, 0).numpy().astype(np.float32)

    rng = np.random.default_rng(0)
    # smooth non-square image: 300x500 gradient + low-freq noise
    yy, xx = np.mgrid[0:300, 0:500]
    base = (yy / 300 * 127 + xx / 500 * 127)[..., None].repeat(3, axis=2)
    noise = rng.normal(0, 10, (10, 17, 3))
    noise_up = np.kron(noise, np.ones((30, 30, 1)))[:300, :500]
    img = np.clip(base + noise_up, 0, 255).astype(np.uint8)

    ref = tv_resize_center_crop(img)
    got = eval_transform(jnp.asarray(img[None]), img_size=224, dtype=jnp.float32)
    # undo normalization to compare raw resampled pixels
    mean = np.array([0.485, 0.456, 0.406]) * 255
    std = np.array([0.229, 0.224, 0.225]) * 255
    got_px = np.asarray(got[0]) * std + mean

    assert got.shape == (1, 224, 224, 3)
    err = np.abs(got_px - ref).mean()
    assert err < 2.0, f"mean abs pixel error vs torchvision: {err}"

    # portrait orientation: shorter side is W
    img_p = np.ascontiguousarray(np.transpose(img, (1, 0, 2)))
    got_p = eval_transform(jnp.asarray(img_p[None]), img_size=224, dtype=jnp.float32)
    ref_p = tv_resize_center_crop(img_p)
    got_p_px = np.asarray(got_p[0]) * std + mean
    err_p = np.abs(got_p_px - ref_p).mean()
    assert err_p < 2.0, f"portrait mean abs pixel error: {err_p}"


def test_train_transform_jits_and_randomizes():
    cfg = AugmentConfig(img_size=32, randaugment=True, reprob=0.25)
    imgs = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 48, 48, 3), np.uint8))
    fn = jax.jit(lambda r, x: train_transform(r, x, cfg, dtype=jnp.float32))
    a = fn(jax.random.key(0), imgs)
    b = fn(jax.random.key(1), imgs)
    assert a.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(a, b)


def test_random_erase_modes_and_count():
    """timm RandomErasing --remode/--recount semantics (train_subdata.py:115-121):
    'const' zero-fills one rectangle, 'rand' fills one color per channel,
    'pixel' per-pixel noise; recount budgets area/count per box."""
    from devit_tpu.data.pipeline import _random_erase

    img = jnp.ones((32, 32, 3), jnp.float32)

    def run(key, mode, count):
        return np.asarray(_random_erase(jax.random.key(key), img, prob=1.0,
                                        mode=mode, max_count=count))

    # const: erased pixels are exactly 0, and the region is one rectangle
    out_c = None
    for k in range(6):  # find a draw whose 10-try geometry succeeded
        out_c = run(k, "const", 1)
        if (out_c != 1).any():
            break
    mask = (out_c != 1).any(-1)
    assert out_c[mask].max() == 0.0
    rows, cols = mask.any(1), mask.any(0)
    assert np.array_equal(mask, np.outer(rows, cols))  # a single rect
    # timm geometry: area in [0.02, 1/3] of the image
    assert 0.01 <= mask.mean() <= 0.40

    # rand: within the box each channel is one broadcast N(0,1) value
    out_r = run(k, "rand", 1)
    box = out_r[mask]
    for c in range(3):
        assert np.unique(box[:, c]).size == 1
    # pixel: per-pixel noise -> many distinct values
    out_p = run(k, "pixel", 1)
    assert np.unique(out_p[mask]).size > 10

    # recount=3: union of up to 3 rects, each area-budgeted /count -> total
    # bounded by ~1/3 still; erasure happens with prob=1
    out_3 = run(3, "const", 3)
    m3 = (out_3 != 1).any(-1)
    assert m3.any() and m3.mean() <= 0.5

    # prob=0 is identity
    np.testing.assert_array_equal(
        np.asarray(_random_erase(jax.random.key(0), img, prob=0.0,
                                 mode="pixel", max_count=2)), np.asarray(img))


def test_color_jitter_matches_torch_adjust_ops():
    """Pin each jitter op against torch's functional definitions (torchvision
    absent; adjust_* are simple blends: out = mean + f*(x-mean), clamped)."""
    from unittest import mock

    import torch

    from devit_tpu.data.pipeline import _color_jitter

    img = np.random.default_rng(0).uniform(0, 255, (8, 8, 3)).astype(np.float32)
    # force factors b, c, s and a fixed order (brightness, contrast, saturation)
    with mock.patch("jax.random.uniform", side_effect=[jnp.float32(1.2), jnp.float32(0.7), jnp.float32(1.5)]), \
         mock.patch("jax.random.randint", return_value=jnp.int32(0)):
        out = _color_jitter(jax.random.key(0), jnp.asarray(img), 0.4)

    t = torch.from_numpy(img)
    w = torch.tensor([0.299, 0.587, 0.114])
    x = torch.clamp(t * 1.2, 0, 255)
    gm = (x * w).sum(-1).mean()
    x = torch.clamp(gm + 0.7 * (x - gm), 0, 255)
    g = (x * w).sum(-1, keepdim=True)
    x = torch.clamp(g + 1.5 * (x - g), 0, 255)
    np.testing.assert_allclose(np.asarray(out), x.numpy(), rtol=1e-5, atol=1e-3)


def test_rrc_full_scale_is_identity_resize():
    """scale=(1,1), ratio=(1,1) on a square image -> the crop is the whole
    image; output must equal a plain bicubic resize."""
    from devit_tpu.data.pipeline import _random_resized_crop

    img = jnp.asarray(np.random.default_rng(0).normal(size=(48, 48, 3)).astype(np.float32))
    cfg = AugmentConfig(img_size=32, rrc_scale=(1.0, 1.0), rrc_ratio=(1.0, 1.0))
    out = _random_resized_crop(jax.random.key(0), img, cfg)
    ref = jax.image.resize(img, (32, 32, 3), method="cubic")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_rrc_rejection_fallback_matches_torchvision_center_crop():
    """All 10 tries invalid (requested aspect wider than the image) -> the
    torchvision fallback: w=W, h=round(W/min_ratio), centered."""
    from devit_tpu.data.pipeline import _random_resized_crop

    H, W = 64, 32
    img = jnp.asarray(np.random.default_rng(1).normal(size=(H, W, 3)).astype(np.float32))
    cfg = AugmentConfig(img_size=16, rrc_scale=(0.9, 1.0), rrc_ratio=(4 / 3, 4 / 3 + 1e-6))
    out = _random_resized_crop(jax.random.key(0), img, cfg)
    fw, fh = W, int(round(W / (4 / 3)))  # 32, 24
    y0, x0 = (H - fh) // 2, 0
    # expected = the same fused crop+resize with the fallback geometry pinned
    # (resize-of-a-crop differs at crop edges where the bicubic kernel spans
    # the boundary; the property under test is the SELECTED geometry)
    scale = jnp.array([16 / fh, 16 / fw])
    ref = jax.image.scale_and_translate(
        img, (16, 16, 3), (0, 1), scale, -jnp.array([y0, x0]) * scale,
        method="cubic")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_train_transform_small_image_branch():
    cfg = AugmentConfig(img_size=32, small_image=True, randaugment=False, color_jitter=0.4)
    imgs = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 32, 32, 3), np.uint8))
    out = train_transform(jax.random.key(0), imgs, cfg, dtype=jnp.float32)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_randaugment_each_op_finite_and_bounded():
    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (24, 24, 3)).astype(np.float32)
    )
    for i, op in enumerate(OPS):
        out = op(img, jnp.asarray(7.0))
        arr = np.asarray(out)
        assert np.isfinite(arr).all(), i
        assert arr.min() >= -1e-3 and arr.max() <= 255.001, (i, arr.min(), arr.max())


def test_randaugment_identity_ops_at_zero_magnitude():
    img = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (16, 16, 3)).astype(np.float32)
    )
    from devit_tpu.data import randaugment as R

    for op in (R._rotate, R._shear_x, R._shear_y, R._translate_x, R._translate_y,
               R._color, R._contrast, R._brightness, R._sharpness):
        out = op(img, jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1.0)


def test_rand_augment_pipeline():
    img = jnp.asarray(np.random.default_rng(2).integers(0, 256, (32, 32, 3)).astype(np.float32))
    out = rand_augment(jax.random.key(0), img, magnitude=9, mag_std=0.5, num_ops=2)
    assert out.shape == img.shape and np.isfinite(np.asarray(out)).all()


def test_ingest_plus_eval_matches_torchvision_resize_centercrop():
    """The composed path for ImageFolder data — aspect-preserving ingest cache
    (ingest_resize: PIL shorter-side-256 + center-crop 256) then
    eval_transform (identity resize + CenterCrop 224) — must equal
    torchvision's Resize(256, bicubic) + CenterCrop(224) applied directly to
    the ORIGINAL image (reference get_dataset.py:99-105), because the two
    center crops compose exactly. The old square-squash ingest failed this
    for every non-square photo."""
    from PIL import Image

    from devit_tpu.data.datasets import ingest_resize
    from devit_tpu.data.pipeline import eval_transform, normalize

    rng = np.random.default_rng(11)
    for (w, h) in [(300, 200), (200, 300), (375, 500)]:
        src = Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8))

        # torchvision reference: shorter side -> 256 (long side int-truncated,
        # PIL bicubic), then center-crop 224
        if w <= h:
            nw, nh = 256, int(256 * h / w)
        else:
            nh, nw = 256, int(256 * w / h)
        ref = src.resize((nw, nh), Image.BICUBIC)
        left = int(round((nw - 224) / 2.0))
        top = int(round((nh - 224) / 2.0))
        ref = np.asarray(ref.crop((left, top, left + 224, top + 224)))
        want = np.asarray(normalize(jnp.asarray(ref[None]), jnp.float32))[0]

        cached = np.asarray(ingest_resize(src, 224))  # the uint8 cache entry
        assert cached.shape == (256, 256, 3)
        got = np.asarray(eval_transform(jnp.asarray(cached[None]),
                                        img_size=224, dtype=jnp.float32))[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_image_folder_mmap_ingest_parity(tmp_path, monkeypatch):
    """ImageNet-scale ingest: past DEVIT_MMAP_BYTES the image-folder cache is
    a disk-backed uint8 memmap. Pixels/labels must be identical to the in-RAM
    path, division views must stay lazy (index indirection, no
    materialization), and BatchIterator must yield identical batches."""
    from PIL import Image

    from devit_tpu.data.datasets import load_image_folder

    rng = np.random.default_rng(3)
    root = tmp_path / "tree"
    for li, cls in enumerate(["a_cls", "b_cls"]):
        (root / cls).mkdir(parents=True)
        for j in range(4):
            arr = rng.integers(0, 256, (50, 44, 3), np.uint8)
            Image.fromarray(arr).save(root / cls / f"im{j}.png")

    eager = load_image_folder(str(root), img_size=32, cache=False)
    monkeypatch.setenv("DEVIT_MMAP_BYTES", "0")
    mm = load_image_folder(str(root), img_size=32, cache=True)
    assert isinstance(mm.images, np.memmap)
    np.testing.assert_array_equal(np.asarray(mm.images), eager.images)
    np.testing.assert_array_equal(mm.labels, eager.labels)

    # cache hit reopens the memmap (no re-decode)
    mm2 = load_image_folder(str(root), img_size=32, cache=True)
    assert isinstance(mm2.images, np.memmap)
    np.testing.assert_array_equal(np.asarray(mm2.images), eager.images)

    # division view over a memmap: lazy indirection, identical batches
    man = DivisionManifest.create(2, 2, seed=42)
    for d in range(2):
        lazy = mm.division_view(man, d)
        mat = eager.division_view(man, d)
        assert isinstance(lazy.images, np.memmap) and lazy.indices is not None
        assert len(lazy) == len(mat)
        np.testing.assert_array_equal(lazy.labels, mat.labels)
        for (li, ll), (mi, ml) in zip(
                BatchIterator(lazy, 2, shuffle=True, seed=5, prefetch=0),
                BatchIterator(mat, 2, shuffle=True, seed=5, prefetch=0)):
            np.testing.assert_array_equal(li, mi)
            np.testing.assert_array_equal(ll, ml)


def test_ingest_cli_builds_cache(tmp_path, monkeypatch):
    """`devit ingest` pre-builds the decoded cache for both splits (here
    forced onto the memmap form) so the first training run skips the decode."""
    from PIL import Image

    from devit_tpu.cli.__main__ import build_parser

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cls in ("c0", "c1"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for j in range(2):
                Image.fromarray(rng.integers(0, 256, (40, 40, 3), np.uint8)
                                ).save(d / f"{j}.png")
    monkeypatch.setenv("DEVIT_MMAP_BYTES", "0")
    args = build_parser().parse_args(
        ["ingest", "--dataset", "IMNET", "--data-path", str(tmp_path),
         "--input-size", "32"])
    args.fn(args)
    for split in ("train", "val"):
        assert (tmp_path / split / ".devit_cache_v3_32.u8").exists()
        assert (tmp_path / split / ".devit_cache_v3_32.u8.meta.npz").exists()


def test_train_sub_cli_runs_over_memmap_dataset(tmp_path, monkeypatch):
    """A full training stage over a memmap-backed image-folder dataset: the
    lazy division view, native gather over the memmap, aug pipeline, eval
    and checkpointing must all compose (the ImageNet-scale path end-to-end,
    not just BatchIterator parity)."""
    from PIL import Image

    from devit_tpu.cli.__main__ import build_parser

    rng = np.random.default_rng(0)
    data_root = tmp_path / "imnet"
    for split, n in (("train", 6), ("val", 3)):
        for cls in ("c0", "c1", "c2", "c3"):
            d = data_root / split / cls
            d.mkdir(parents=True)
            base = rng.integers(0, 200, (1, 1, 3))
            for j in range(n):
                arr = (base + rng.integers(0, 56, (40, 40, 3))).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{j}.png")
    monkeypatch.setenv("DEVIT_MMAP_BYTES", "0")

    out = str(tmp_path / "out")
    split_args = build_parser().parse_args(
        ["split", "--dataset", "IMNET", "--data-path", str(data_root),
         "--num_division", "2", "--output_dir", out])
    manifest = split_args.fn(split_args)

    args = build_parser().parse_args([
        "train_sub", "--dataset", "IMNET", "--data-path", str(data_root),
        "--num_division", "2", "--manifest", manifest,
        "--input-size", "32", "--patch-size", "8", "--embed-dim", "32",
        "--depth", "1", "--num-heads", "2", "--drop-path", "0.0",
        "--batch-size", "4", "--eval-batch-size", "4", "--epochs", "1",
        "--warmup-epochs", "0", "--cooldown-epochs", "0", "--lr", "1e-3",
        "--no-repeated-aug", "--aa", "", "--no-aug", "--mixup", "0",
        "--cutmix", "0", "--reprob", "0", "--color-jitter", "0",
        "--start-division", "0", "--output_dir", out + "/sub0",
    ])
    # the dataset really is memmap-backed in this configuration
    from devit_tpu.data.datasets import build_dataset

    ds = build_dataset("IMNET", str(data_root), train=True, img_size=32)
    assert isinstance(ds.images, np.memmap)
    best = args.fn(args)
    assert os.path.exists(os.path.join(out, "sub0", "checkpoint.msgpack"))
    assert np.isfinite(best)


def test_cifar_pickle_loaders(tmp_path):
    """load_cifar100 / load_cifar10 read the standard pickle layouts
    (cifar-100-python train/test with b'fine_labels'; cifar-10-batches-py
    data_batch_1..5 + test_batch with b'labels') and produce NHWC uint8
    row-major images. cifar10 covers the reference's dormant
    utils/data_loader.py surface through the live path."""
    import pickle

    from devit_tpu.data.datasets import build_dataset, load_cifar10, load_cifar100

    rng = np.random.default_rng(0)

    def rows(n, k):
        data = rng.integers(0, 256, (n, 3 * 32 * 32), dtype=np.uint8)
        labels = rng.integers(0, k, n).tolist()
        return data, labels

    c100 = tmp_path / "c100" / "cifar-100-python"
    c100.mkdir(parents=True)
    for split, n in (("train", 12), ("test", 6)):
        data, labels = rows(n, 100)
        with open(c100 / split, "wb") as f:
            pickle.dump({b"data": data, b"fine_labels": labels}, f)
        ds = load_cifar100(str(tmp_path / "c100"), split == "train")
        assert ds.images.shape == (n, 32, 32, 3) and ds.num_classes == 100
        # NCHW->NHWC transpose of the row-major pickle rows
        np.testing.assert_array_equal(
            ds.images[0], data[0].reshape(3, 32, 32).transpose(1, 2, 0))
        np.testing.assert_array_equal(ds.labels, labels)

    c10 = tmp_path / "c10" / "cifar-10-batches-py"
    c10.mkdir(parents=True)
    train_parts = []
    for i in range(1, 6):
        data, labels = rows(4, 10)
        train_parts.append((data, labels))
        with open(c10 / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
    data_t, labels_t = rows(5, 10)
    with open(c10 / "test_batch", "wb") as f:
        pickle.dump({b"data": data_t, b"labels": labels_t}, f)

    train = build_dataset("cifar10", str(tmp_path / "c10"), train=True)
    assert train.images.shape == (20, 32, 32, 3) and train.num_classes == 10
    np.testing.assert_array_equal(
        train.labels, np.concatenate([np.asarray(l) for _, l in train_parts]))
    np.testing.assert_array_equal(
        train.images[4], train_parts[1][0][0].reshape(3, 32, 32).transpose(1, 2, 0))
    test = build_dataset("cifar10", str(tmp_path / "c10"), train=False)
    assert len(test) == 5 and test.num_classes == 10

    # the class-disjoint division machinery works over cifar10 too
    manifest = DivisionManifest.create(10, 2, seed=42)
    view = train.division_view(manifest, 0)
    assert view.num_classes == 5 and set(np.unique(view.labels)) <= set(range(5))


def test_materialize_imagefolder_reference_layout(tmp_path):
    """`devit split --materialize` exports the reference's physical
    sub-dataset{i}/{train,test}_dataset/<class> trees (splite_dataset.py:
    120-177 copytree semantics): class dirs land verbatim in exactly the
    division the manifest assigns, files are hardlinked (same inode) with
    identical bytes, and the export is idempotent."""
    from PIL import Image

    from devit_tpu.data.splitter import materialize_imagefolder

    src = tmp_path / "data"
    classes = [f"class_{c}" for c in "abcdef"]  # lexicographic == given order
    rng = np.random.default_rng(0)
    for split, nfiles in (("train", 2), ("val", 1)):
        for cls in classes:
            d = src / split / cls
            d.mkdir(parents=True)
            for k in range(nfiles):
                Image.fromarray(
                    rng.integers(0, 256, (4, 4, 3), np.uint8)
                ).save(d / f"{split}_{k}.png")
    # torchvision's make_dataset walks class dirs RECURSIVELY — nested
    # session subdirs are real data and must export too (copytree semantics)
    nested = src / "train" / classes[0] / "session1"
    nested.mkdir()
    Image.new("RGB", (4, 4)).save(nested / "deep.png")

    manifest = DivisionManifest.create(6, 2, seed=42)
    out = tmp_path / "out"
    roots = materialize_imagefolder(manifest, str(src), str(out), log=None)
    assert roots == [str(out / "sub-dataset0"), str(out / "sub-dataset1")]

    seen = []
    for i in range(2):
        want = {classes[c] for c in manifest.divisions[i]}
        for sub, src_split in (("train_dataset", "train"),
                               ("test_dataset", "val")):
            got = set(os.listdir(out / f"sub-dataset{i}" / sub))
            assert got == want
            for cls in want:
                sdir = src / src_split / cls
                ddir = out / f"sub-dataset{i}" / sub / cls
                # compare the full recursive listing (nested dirs included)
                swalk = sorted(os.path.relpath(os.path.join(b, f), sdir)
                               for b, _, ns in os.walk(sdir) for f in ns)
                dwalk = sorted(os.path.relpath(os.path.join(b, f), ddir)
                               for b, _, ns in os.walk(ddir) for f in ns)
                assert dwalk == swalk
                for f in swalk:
                    s, d = sdir / f, ddir / f
                    assert os.path.samefile(s, d)  # hardlinked
                    assert s.read_bytes() == d.read_bytes()
        seen.append(want)
    # the nested session file landed wherever classes[0] was assigned
    div_of_c0 = 0 if 0 in manifest.divisions[0] else 1
    assert (out / f"sub-dataset{div_of_c0}" / "train_dataset" / classes[0]
            / "session1" / "deep.png").is_file()
    assert seen[0] | seen[1] == set(classes) and not (seen[0] & seen[1])

    # idempotent re-run; copy mode also lands identical bytes
    materialize_imagefolder(manifest, str(src), str(out), log=None)
    out2 = tmp_path / "out2"
    materialize_imagefolder(manifest, str(src), str(out2), link=False, log=None)
    p0 = classes[manifest.divisions[0][0]]
    f0 = sorted(os.listdir(src / "train" / p0))[0]
    assert not os.path.samefile(src / "train" / p0 / f0,
                                out2 / "sub-dataset0" / "train_dataset" / p0 / f0)
    assert (src / "train" / p0 / f0).read_bytes() == \
        (out2 / "sub-dataset0" / "train_dataset" / p0 / f0).read_bytes()

    # loud failures: no val/test split dir; class-count mismatch
    import pytest

    bad = tmp_path / "bad"
    (bad / "train" / "x").mkdir(parents=True)
    with pytest.raises(FileNotFoundError):
        materialize_imagefolder(manifest, str(bad), str(tmp_path / "o3"))
    with pytest.raises(ValueError):
        materialize_imagefolder(DivisionManifest.create(5, 2), str(src),
                                str(tmp_path / "o4"))


def test_split_main_materialize_cli(tmp_path, monkeypatch):
    """The split stage's --materialize flag drives the export end-to-end."""
    from PIL import Image

    from devit_tpu.cli.__main__ import build_parser
    from devit_tpu.data import datasets as DS

    src = tmp_path / "data"
    for split in ("train", "val"):
        for cls in ("ca", "cb", "cc", "cd"):
            d = src / split / cls
            d.mkdir(parents=True)
            Image.new("RGB", (4, 4)).save(d / "0.png")
    monkeypatch.setitem(DS.DATASET_NUM_CLASSES, "IMNET", 4)
    args = build_parser().parse_args(
        ["split", "--dataset", "IMNET", "--data-path", str(src),
         "--num_division", "2", "--output_dir", str(tmp_path / "o"),
         "--materialize"])
    args.fn(args)
    m = DivisionManifest.load(str(tmp_path / "o" / "division2" / "manifest.json"))
    names = ["ca", "cb", "cc", "cd"]
    for i in range(2):
        got = set(os.listdir(tmp_path / "o" / "division2" / f"sub-dataset{i}"
                             / "train_dataset"))
        assert got == {names[c] for c in m.divisions[i]}
