"""Minimal timm shim (timm 0.5.4 surface) so the ACTUAL reference modules at
/root/reference (engine.py, models/de_vit.py, utils/losses.py) import and run
on CPU for cross-framework parity tests. Only the handful of symbols those
modules import are provided, implemented from the public timm API contracts —
no reference code is copied. This shim exists purely for tests; the product
framework (devit_tpu/) never imports it.
"""
