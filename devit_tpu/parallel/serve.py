"""Multi-device collaborative serving — the deployment story of the paper.

In the reference, each MultiViT backbone lives on a separate edge device and
ships its 384-d CLS/dist tokens over the network to the fusion device
(SURVEY.md §3.4; reference ensemble_models.py:33 runs them sequentially in
one process). The TPU-native mapping for the *compact ragged* serving
artifacts: every division is its own compiled program COMMITTED to its own
chip (ragged per-layer widths mean per-division programs regardless — see
models/compact_vit.py), dispatch is async so all divisions execute
concurrently across chips, and only the (B, C) token pairs cross chips to the
fusion device — the ICI analogue of the paper's token shipping. The EnsMLP
fusion runs on the fusion device.

On one chip this degrades gracefully to the sequential single-chip layout
(same programs, one device); with D chips the ensemble forward takes
max(division time) + fusion instead of sum(division times).

(The gated/stacked TRAINING-time ensemble uses the ('div','data') mesh in
parallel/mesh.py instead — uniform shapes there make SPMD the right tool.
This module is for the ragged deployed artifacts, where shapes differ per
division and per-device programs are the natural fit.)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from devit_tpu.models.compact_vit import CompactViT, compact_forward


def make_collaborative_server(
    cms: Sequence[CompactViT],
    ens_apply: Callable,
    ens_vars,
    *,
    patch_size: int = 16,
    devices: Optional[Sequence[jax.Device]] = None,
    dtype=jnp.bfloat16,
    use_pallas: bool = True,
    fast_math: bool = True,
) -> Callable:
    """Build `serve(ens_vars, images) -> logits` with division d committed to
    devices[d % len(devices)] and EnsMLP fusion on devices[0].

    ens_apply: (ens_vars, cls_stack, dist_stack) -> output with .logits
    (models/ensemble.py EnsMLP.apply wrapped accordingly). The `ens_vars`
    build argument only sizes the fusion program; callers pass (possibly
    updated) fusion weights on every call.
    """
    # local_devices, not jax.devices(): under multihost (DEVIT_MULTIHOST)
    # device_put to another process's devices is not addressable.
    devices = list(devices if devices is not None else jax.local_devices())
    fusion_dev = devices[0]
    placed = []
    for d, cm in enumerate(cms):
        dev = devices[d % len(devices)]
        placed.append(jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dev) if hasattr(x, "shape") else x, cm))

    def _division_fn(cm):
        def fn(images):
            return compact_forward(
                cm, images, patch_size=patch_size, dtype=dtype,
                use_pallas=use_pallas, fast_math=fast_math, features_only=True)
        return jax.jit(fn)

    div_fns = [_division_fn(cm) for cm in placed]

    @jax.jit
    def _fuse(ev, cls_stack, dist_stack):
        return ens_apply(ev, cls_stack, dist_stack)

    def serve(ens_vars, images) -> jax.Array:
        # replicate the batch to every participating device; committed inputs
        # keep each division's program on its own chip, and async dispatch
        # lets the D programs run concurrently
        per_dev = {}
        feats = []
        for d, fn in enumerate(div_fns):
            dev = devices[d % len(devices)]
            if dev not in per_dev:
                per_dev[dev] = jax.device_put(images, dev)
            feats.append(fn(per_dev[dev]))
        # only the (B, C) tokens cross chips (the paper's "communication
        # overhead"); stack on the fusion device
        cls_stack = jnp.stack(
            [jax.device_put(c, fusion_dev) for c, _ in feats])
        if feats[0][1] is None:  # undistilled backbones: cls tokens only
            dist_stack = None
        else:
            dist_stack = jnp.stack(
                [jax.device_put(t, fusion_dev) for _, t in feats])
        ev = jax.device_put(ens_vars, fusion_dev)
        return _fuse(ev, cls_stack, dist_stack).logits

    serve.division_devices = [devices[d % len(devices)] for d in range(len(cms))]
    serve.fusion_device = fusion_dev
    serve.placed_divisions = placed  # exposed so tests can assert real placement
    return serve
