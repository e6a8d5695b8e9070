"""Import the ACTUAL reference modules from /root/reference for
cross-framework parity tests.

Two obstacles, both worked around here without touching the read-only
reference tree:
- timm 0.5.4 / torchvision are not installed -> tests/ref_shim/timm provides
  the handful of symbols the reference modules import.
- models/utils/config.py NameErrors as committed (uses partial/nn with no
  imports — SURVEY.md §2.3) -> a fixed module is pre-registered in
  sys.modules before models.de_vit imports it.
"""

import os
import sys
import types

REFERENCE = "/root/reference"
SHIM_DIR = os.path.dirname(os.path.abspath(__file__))

_loaded = {}


def load_reference():
    """Returns (engine, de_vit, losses, dist_utils) — the reference's own
    modules, importable and runnable on CPU."""
    if _loaded:
        return (_loaded["engine"], _loaded["de_vit"], _loaded["losses"],
                _loaded["dist_utils"])
    if SHIM_DIR not in sys.path:
        sys.path.insert(0, SHIM_DIR)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    from functools import partial

    import torch.nn as nn

    if "models.utils.config" not in sys.modules:
        import models.utils as _mu  # real (empty) package __init__s

        cfg = types.ModuleType("models.utils.config")
        # the intended contents (with working imports); geometry values as
        # committed except dedeit/devit embed 384/heads 6 — the actual dedeit
        # registration (de_vit.py:495-503), which the committed 192/3 config
        # contradicts (SURVEY.md §2.3 "BROKEN as committed")
        cfg.model_config = {
            name: {"patch_size": 16, "embed_dim": e, "depth": d, "num_heads": h,
                   "mlp_ratio": 4, "qkv_bias": True,
                   "norm_layer": partial(nn.LayerNorm, eps=1e-6)}
            for name, (e, d, h) in {
                "dedeit": (384, 12, 6),
                "devit": (384, 12, 6),
                "deit_base_distilled_patch16_224": (768, 12, 12),
                "vit_base_patch16_224": (768, 12, 12),
                "vit_large_patch16_224": (1024, 24, 16),
            }.items()
        }
        sys.modules["models.utils.config"] = cfg
        _mu.config = cfg

    import engine as ref_engine
    import models.de_vit as ref_de_vit
    import utils.dist_utils as ref_dist_utils
    import utils.losses as ref_losses

    _loaded.update(engine=ref_engine, de_vit=ref_de_vit, losses=ref_losses,
                   dist_utils=ref_dist_utils)
    return ref_engine, ref_de_vit, ref_losses, ref_dist_utils


def load_reference_train_subdata():
    """Import the reference's train_subdata.py (the stage-2 entry script) so
    its own train_one_epoch/evaluate loops run under the shim. Its module-level
    imports pull data.get_dataset -> torchvision, which is not installed; the
    trajectory tests never touch the data builders, so a pre-registered
    import-only stub module stands in (same technique as models.utils.config
    above)."""
    if "train_subdata" in _loaded:
        return _loaded["train_subdata"]
    load_reference()  # sys.path + models.utils.config registration

    if "data.get_dataset" not in sys.modules:
        import data as _data  # the real (header-only) reference package

        gd = types.ModuleType("data.get_dataset")

        def _unavailable(*a, **k):
            raise NotImplementedError(
                "ref_shim data.get_dataset is import-only (torchvision absent)")

        gd.build_dataset = _unavailable
        gd.build_division_dataset = _unavailable
        gd.build_transform = _unavailable
        sys.modules["data.get_dataset"] = gd
        _data.get_dataset = gd

    import train_subdata as ref_train

    _loaded["train_subdata"] = ref_train
    return ref_train
