"""Model registry — mirrors the reference's timm `create_model` surface
(reference de_vit.py:495-513, deit_vit.py:457-525, cct.py:226-458)."""

from devit_tpu.configs import VIT_CONFIGS, CCT_CONFIGS, get_vit_config, get_cct_config
from devit_tpu.models.vit import VisionTransformer, Gates, full_gates, create_vit, ViTOutput


def create_model(name: str, **overrides):
    """Factory for any registered backbone by name."""
    if name in VIT_CONFIGS:
        return create_vit(name, **overrides)
    if name.startswith("cct") or name.startswith("decct"):
        from devit_tpu.models.cct import create_cct

        return create_cct(name, **overrides)
    raise KeyError(f"unknown model {name!r}")


__all__ = [
    "create_model",
    "create_vit",
    "VisionTransformer",
    "Gates",
    "full_gates",
    "ViTOutput",
]
