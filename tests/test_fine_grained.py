"""Execution coverage for the fine-grained dataset readers (VERDICT r2
missing #4 / weak #2): tiny synthetic fixtures in each dataset's standard
extracted layout — Flowers-102 .mat splits, Stanford Cars devkit annos,
Oxford-IIIT Pet annotation lists, iNaturalist json — plus the image-folder /
ImportError fallbacks in build_dataset.

Layout contracts match the reference's vendored torchvision datasets
(/root/reference/data/datasets.py:20-404) and its build_dataset dispatch
(get_dataset.py:17-58)."""

import os

import numpy as np
import pytest

from devit_tpu.data import fine_grained as FG
from devit_tpu.data.datasets import build_dataset

IMG = 32
S = int(IMG * 256 / 224)  # ingest cache side


def _write_jpg(path, seed):
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)  # non-square
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


# ------------------------------------------------------------- Flowers-102


@pytest.fixture()
def flowers_root(tmp_path):
    from scipy.io import savemat

    base = tmp_path / "flowers-102"
    for i in range(1, 7):
        _write_jpg(str(base / "jpg" / f"image_{i:05d}.jpg"), seed=i)
    # labels are 1-based in the .mat (reference datasets.py Flowers102)
    savemat(str(base / "imagelabels.mat"),
            {"labels": np.array([[1, 2, 3, 1, 2, 3]], dtype=np.uint8)})
    savemat(str(base / "setid.mat"), {
        "trnid": np.array([[1, 2]], np.uint16),
        "valid": np.array([[3, 4]], np.uint16),
        "tstid": np.array([[5, 6]], np.uint16),
    })
    return str(tmp_path)


def test_flowers102_reader(flowers_root):
    train = FG.load_flowers102(flowers_root, "train", img_size=IMG)
    # train = trnid + valid, like the reference splitter (splite_dataset.py:39-43)
    assert len(train) == 4
    assert train.images.shape == (4, S, S, 3)
    assert train.num_classes == 102
    np.testing.assert_array_equal(train.labels, [0, 1, 2, 0])  # 0-based
    test = FG.load_flowers102(flowers_root, "test", img_size=IMG)
    np.testing.assert_array_equal(test.labels, [1, 2])
    # cache round-trip is identical
    again = FG.load_flowers102(flowers_root, "train", img_size=IMG)
    np.testing.assert_array_equal(again.images, train.images)


def test_build_dataset_dispatches_flowers(flowers_root):
    ds = build_dataset("flowers", flowers_root, train=True, img_size=IMG)
    assert len(ds) == 4 and ds.num_classes == 102


# ---------------------------------------------------------- Stanford Cars


@pytest.fixture()
def cars_root(tmp_path):
    from scipy.io import savemat

    base = tmp_path / "stanford_cars"
    names = [f"{i:05d}.jpg" for i in range(1, 4)]
    for split, labels in (("cars_train", [1, 5, 196]), ("cars_test", [2, 5, 1])):
        for k, n in enumerate(names):
            _write_jpg(str(base / split / n), seed=100 + k)

    def annos(labels):
        ann = np.empty((len(labels),), dtype=[("bbox_x1", "O"), ("fname", "O"),
                                              ("class", "O")])
        for k, (n, c) in enumerate(zip(names, labels)):
            ann[k] = (np.array([[1]], np.uint8), n, np.array([[c]], np.uint8))
        return ann.reshape(1, -1)

    os.makedirs(str(base / "devkit"), exist_ok=True)
    savemat(str(base / "devkit" / "cars_train_annos.mat"),
            {"annotations": annos([1, 5, 196])})
    savemat(str(base / "cars_test_annos_withlabels.mat"),
            {"annotations": annos([2, 5, 1])})
    return str(tmp_path)


def test_stanford_cars_reader(cars_root):
    train = FG.load_stanford_cars(cars_root, "train", img_size=IMG)
    assert train.images.shape == (3, S, S, 3)
    assert train.num_classes == 196
    np.testing.assert_array_equal(train.labels, [0, 4, 195])
    test = FG.load_stanford_cars(cars_root, "test", img_size=IMG)
    np.testing.assert_array_equal(test.labels, [1, 4, 0])


# -------------------------------------------------------- Oxford-IIIT Pet


@pytest.fixture()
def pets_root(tmp_path):
    base = tmp_path / "oxford-iiit-pet"
    lines_tv = ["Abyssinian_1 1 1 1", "Abyssinian_2 1 1 1", "yorkshire_10 37 2 25"]
    lines_te = ["beagle_3 5 2 2"]
    for k, name in enumerate(["Abyssinian_1", "Abyssinian_2", "yorkshire_10",
                              "beagle_3"]):
        _write_jpg(str(base / "images" / f"{name}.jpg"), seed=200 + k)
    os.makedirs(str(base / "annotations"), exist_ok=True)
    (base / "annotations" / "trainval.txt").write_text("\n".join(lines_tv) + "\n")
    (base / "annotations" / "test.txt").write_text("\n".join(lines_te) + "\n")
    return str(tmp_path)


def test_oxford_pets_reader(pets_root):
    train = FG.load_oxford_pets(pets_root, "train", img_size=IMG)
    assert train.images.shape == (3, S, S, 3)
    assert train.num_classes == 37
    np.testing.assert_array_equal(train.labels, [0, 0, 36])
    test = FG.load_oxford_pets(pets_root, "test", img_size=IMG)
    np.testing.assert_array_equal(test.labels, [4])


def test_torn_extraction_fails_with_diagnosis(pets_root):
    """VERDICT r3 #10: a torn archive extraction (annotated image missing or
    zero bytes) must fail loudly with counts + examples, not surface as a
    silent decode skip; out-of-range labels likewise. A warm cache skips the
    check (the cache is self-contained; sources may legitimately be gone)."""
    img = os.path.join(pets_root, "oxford-iiit-pet", "images",
                       "Abyssinian_2.jpg")
    os.remove(img)
    with pytest.raises(FileNotFoundError, match=r"1 of 3 .* missing"):
        FG.load_oxford_pets(pets_root, "train", img_size=IMG)
    # zero-byte file = torn too
    open(img, "wb").close()
    with pytest.raises(FileNotFoundError, match="empty"):
        FG.load_oxford_pets(pets_root, "train", img_size=IMG)
    _write_jpg(img, seed=201)

    # out-of-range label (breed id 50 > 37) diagnosed before any decode
    ann = os.path.join(pets_root, "oxford-iiit-pet", "annotations",
                       "trainval.txt")
    good = open(ann).read()
    open(ann, "w").write(good + "bogus_1 50 1 1\n")
    with pytest.raises(ValueError, match=r"out of range \[0, 37\)"):
        FG.load_oxford_pets(pets_root, "train", img_size=IMG)
    open(ann, "w").write(good)

    # warm the cache, then delete a source image: cached load must still work
    FG.load_oxford_pets(pets_root, "train", img_size=IMG)
    os.remove(img)
    again = FG.load_oxford_pets(pets_root, "train", img_size=IMG)
    assert len(again) == 3


# ----------------------------------------------------------- iNaturalist


@pytest.fixture()
def inat_root(tmp_path):
    import json

    root = tmp_path
    cats = [
        {"id": 10, "name": "sp_a", "kingdom": "Animalia"},
        {"id": 20, "name": "sp_b", "kingdom": "Plantae"},
        {"id": 30, "name": "sp_c", "kingdom": "Animalia"},
    ]
    imgs = [{"id": i, "file_name": f"train_val2018/img_{i}.jpg"} for i in range(3)]
    anns = [{"image_id": 0, "category_id": 20}, {"image_id": 1, "category_id": 10},
            {"image_id": 2, "category_id": 30}]
    for i in range(3):
        _write_jpg(str(root / "train_val2018" / f"img_{i}.jpg"), seed=300 + i)
    (root / "train2018.json").write_text(
        json.dumps({"images": imgs, "annotations": anns}))
    (root / "val2018.json").write_text(
        json.dumps({"images": imgs[:1], "annotations": anns[:1]}))
    (root / "categories.json").write_text(json.dumps(cats))
    return str(root)


def test_inat_reader(inat_root):
    train = FG.load_inat(inat_root, "train", year=2018, img_size=IMG)
    assert train.images.shape == (3, S, S, 3)
    # label space = first-seen order of the chosen category field ('name')
    assert train.num_classes == 3
    np.testing.assert_array_equal(train.labels, [1, 0, 2])
    val = FG.load_inat(inat_root, "val", year=2018, img_size=IMG)
    assert len(val) == 1 and val.labels[0] == 1


def test_inat_kingdom_label_space(inat_root):
    """category='kingdom' collapses the label space (INatDataset semantics,
    reference datasets.py:379-387)."""
    ds = FG.load_inat(inat_root, "train", year=2018, category="kingdom",
                      img_size=IMG)
    assert ds.num_classes == 2
    np.testing.assert_array_equal(ds.labels, [1, 0, 0])


def test_build_dataset_dispatches_inat(inat_root):
    ds = build_dataset("INAT", inat_root, train=True, img_size=IMG)
    assert len(ds) == 3


def test_inat_cache_keyed_by_category(inat_root):
    """The decode cache must be keyed by category: a 'name' cache served to a
    --inat-category kingdom run would silently train on the wrong labels."""
    a = FG.load_inat(inat_root, "train", year=2018, category="name",
                     img_size=IMG)
    b = FG.load_inat(inat_root, "train", year=2018, category="kingdom",
                     img_size=IMG)
    assert a.num_classes == 3 and b.num_classes == 2
    np.testing.assert_array_equal(b.labels, [1, 0, 0])
    # and the category threads through build_dataset (--inat-category)
    c = build_dataset("INAT", inat_root, train=True, img_size=IMG,
                      inat_category="kingdom")
    assert c.num_classes == 2


# ------------------------------------------------------------- fallbacks


def test_build_dataset_falls_back_on_import_error(tmp_path, monkeypatch):
    """A missing scipy on a deployment host must fall through to the
    image-folder tree, not crash (VERDICT r2 weak #2)."""

    def no_scipy(*a, **k):
        raise ImportError("No module named 'scipy'")

    monkeypatch.setattr(FG, "load_flowers102", no_scipy)
    root = tmp_path / "flowers" / "train"
    for cls in ("c0", "c1"):
        _write_jpg(str(root / cls / "a.jpg"), seed=hash(cls) % 100)
    ds = build_dataset("flowers", str(tmp_path), train=True, img_size=IMG)
    assert len(ds) == 2 and ds.num_classes == 2


def test_build_dataset_missing_everything_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="flowers"):
        build_dataset("flowers", str(tmp_path), train=True, img_size=IMG)
