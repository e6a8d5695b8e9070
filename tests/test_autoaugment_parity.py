"""AutoAugment parity vs the ACTUAL reference implementation
(/root/reference/utils/autoaug.py + utils/transforms.py, the DeepVoltaire
AutoAugment-paper policies its --aa flag advertises).

Three layers, mirroring test_randaugment_parity.py:
- policy-table parity: our IMAGENET_POLICY/CIFAR10_POLICY rows resolve to the
  same (p, op, magnitude) triples as the reference's instantiated SubPolicy
  objects (probabilities, op classes, and the linspace-resolved magnitudes);
- op parity: every apply_op produces pixel-identical output to the
  reference's transforms.py op at the same magnitude/sign;
- dispatch: the host augment pipeline applies the policy (and the CLI wires
  --aa original/cifar10 into it via the auto backend).

The reference module crashes on numpy>=1.24 as committed (`astype(np.int)` in
SubPolicy.ranges) — a resolved reference bug pinned here by the np.int patch
required to even instantiate it.
"""

import random
import sys

import numpy as np
import pytest
from PIL import Image

from devit_tpu.data import autoaugment as A

sys.path.insert(0, __file__.rsplit("/", 1)[0] + "/ref_shim")


@pytest.fixture(scope="module")
def ref_autoaug():
    from loader import load_reference

    load_reference()  # sys.path + shim registration
    if not hasattr(np, "int"):
        np.int = int  # reference bug: removed from numpy 1.24+
    import utils.autoaug as ref_aa
    import utils.transforms as ref_tf

    return ref_aa, ref_tf


RNG = np.random.default_rng(7)
IMG = Image.fromarray(RNG.integers(0, 256, (40, 48, 3), np.uint8))

_REF_CLASS_TO_NAME = {
    "ShearX": "shearX", "ShearY": "shearY", "TranslateX": "translateX",
    "TranslateY": "translateY", "Rotate": "rotate", "Color": "color",
    "Posterize": "posterize", "Solarize": "solarize", "Contrast": "contrast",
    "Sharpness": "sharpness", "Brightness": "brightness",
    "AutoContrast": "autocontrast", "Equalize": "equalize", "Invert": "invert",
}


@pytest.mark.parametrize("ours,ref_cls", [
    ("original", "ImageNetPolicy"), ("cifar10", "CIFAR10Policy")])
def test_policy_tables_match_reference(ref_autoaug, ours, ref_cls):
    ref_aa, _ = ref_autoaug
    ref_policies = getattr(ref_aa, ref_cls)().policies
    table = A.get_policy(ours)
    assert len(table) == len(ref_policies) == 25
    for row, sp in zip(table, ref_policies):
        p1, op1, idx1, p2, op2, idx2 = row
        assert (p1, p2) == (sp.p1, sp.p2)
        assert _REF_CLASS_TO_NAME[type(sp.operation1).__name__] == op1
        assert _REF_CLASS_TO_NAME[type(sp.operation2).__name__] == op2
        np.testing.assert_allclose(A.op_magnitude(op1, idx1), sp.magnitude1)
        np.testing.assert_allclose(A.op_magnitude(op2, idx2), sp.magnitude2)


@pytest.mark.parametrize("name", sorted(_REF_CLASS_TO_NAME.values()))
def test_ops_match_reference_pixels(ref_autoaug, name, monkeypatch):
    _, ref_tf = ref_autoaug
    ref_op = {v: k for k, v in _REF_CLASS_TO_NAME.items()}[name]
    for idx in (2, 5, 9):
        for sign in (1, -1):
            # the reference draws the sign inside the op via random.choice;
            # pin it so both sides use the same sign
            monkeypatch.setattr(ref_tf.random, "choice",
                                lambda *a, _s=sign, **k: _s)
            mag = A.op_magnitude(name, idx)
            want = np.asarray(getattr(ref_tf, ref_op)()(IMG, mag))
            got = np.asarray(A.apply_op(IMG, name, mag, sign))
            np.testing.assert_array_equal(got, want, err_msg=f"{name} m[{idx}] s{sign}")


def test_subpolicy_application_matches_reference(ref_autoaug, monkeypatch):
    """Full SubPolicy.__call__ parity: drive the reference's global `random`
    with a recorded stream, replay the identical decisions through
    auto_augment_pil, compare pixels for several sub-policies."""
    ref_aa, ref_tf = ref_autoaug
    table = A.get_policy("original")
    ref_policies = ref_aa.ImageNetPolicy().policies
    for row_idx in (0, 3, 10, 13, 18):  # rotate/posterize/equalize/invert/shear mix
        draws = iter([0.1, 0.3])   # below both p1,p2 -> both ops fire
        signs = iter([1, -1, 1, -1])
        monkeypatch.setattr(ref_aa.random, "random", lambda: next(draws))
        monkeypatch.setattr(ref_tf.random, "choice", lambda *a, **k: next(signs))
        want = np.asarray(ref_policies[row_idx](IMG))

        p1, op1, idx1, p2, op2, idx2 = table[row_idx]
        got = IMG
        signs2 = iter([1, -1, 1, -1])
        for name, idx in ((op1, idx1), (op2, idx2)):
            s = next(signs2) if name in A._SIGNED else 1
            # consume the sign stream the same way the reference does: its
            # signed ops draw choice() once per application
            got = A.apply_op(got, name, A.op_magnitude(name, idx), s)
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=f"row {row_idx}")


def test_sub_policy_skips_ops_by_probability():
    img = IMG
    # p=0 rows never fire: policy with both probabilities 0 is identity
    out = A.auto_augment_pil(img, np.random.default_rng(0),
                             [(0.0, "invert", 0, 0.0, "invert", 0)])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    out = A.auto_augment_pil(img, np.random.default_rng(0),
                             [(1.0, "invert", 0, 1.0, "invert", 0)])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))  # double invert


def test_unknown_policy_rejected():
    with pytest.raises(ValueError, match="v0"):
        A.get_policy("v0")


# ---------------------------------------------------------------- wiring


def _aug_cfg(**kw):
    from devit_tpu.data.pipeline import AugmentConfig

    return AugmentConfig(**kw)


def test_host_pipeline_applies_autoaugment():
    from devit_tpu.data.host_augment import make_host_train_augment

    cfg = _aug_cfg(img_size=32, randaugment=False, autoaugment="cifar10",
                   reprob=0.0, small_image=True)
    tf = make_host_train_augment(cfg, seed=3)
    batch = np.asarray(RNG.integers(0, 256, (4, 32, 32, 3), np.uint8))
    out = tf(batch, epoch=0, batch_index=0)
    assert out.shape == (4, 32, 32, 3) and out.dtype == np.uint8
    # deterministic per (seed, epoch, batch, sample)
    np.testing.assert_array_equal(out, tf(batch, epoch=0, batch_index=0))
    assert np.any(out != tf(batch, epoch=1, batch_index=0))


def test_cli_wires_aa_original_to_host_backend():
    import argparse

    from devit_tpu.cli.common import (augment_config_from_args,
                                      make_train_pipeline)

    args = argparse.Namespace(
        aa="original", no_aug=False, color_jitter=0.4, reprob=0.25,
        aug_backend="auto", seed=0)
    cfg = augment_config_from_args(args, img_size=224, source_size=256)
    assert cfg.autoaugment == "original" and not cfg.randaugment
    _, host_tf = make_train_pipeline(args, cfg)
    assert host_tf is not None  # auto picks the host PIL path

    args.aug_backend = "device"
    with pytest.raises(ValueError, match="host-PIL only"):
        make_train_pipeline(args, cfg)


def test_cli_rejects_unknown_aa_string():
    import argparse

    from devit_tpu.cli.common import augment_config_from_args

    args = argparse.Namespace(aa="autoaug-v3", no_aug=False,
                              color_jitter=0.4, reprob=0.25)
    with pytest.raises(ValueError, match="unrecognized --aa"):
        augment_config_from_args(args, img_size=224, source_size=256)


def test_small_image_host_randomcrop_pad4():
    """Host small-image branch == torchvision RandomCrop(32, padding=4)
    semantics: output pixels are a 32x32 window of the zero-padded 40x40."""
    from devit_tpu.data.host_augment import make_host_train_augment

    cfg = _aug_cfg(img_size=32, randaugment=False, autoaugment=None,
                   color_jitter=0.0, reprob=0.0, small_image=True, hflip=False)
    tf = make_host_train_augment(cfg, seed=1)
    img = np.asarray(RNG.integers(1, 256, (1, 32, 32, 3), np.uint8))  # no zeros
    out = tf(img, epoch=0, batch_index=0)[0]
    padded = np.zeros((40, 40, 3), np.uint8)
    padded[4:36, 4:36] = img[0]
    matches = [(i, j) for i in range(9) for j in range(9)
               if np.array_equal(out, padded[i:i + 32, j:j + 32])]
    assert len(matches) == 1
