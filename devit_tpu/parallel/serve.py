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

Fusion placement: when there are spare devices beyond the divisions, the
fusion program defaults onto the first spare chip. Fusion depends only on the
CURRENT batch's tokens, so with its own chip it runs concurrently with every
division's NEXT-batch forward; sharing division 0's chip would serialize
those (steady-state period max(div)+fusion instead of max(div) — the
difference between the measured-component projections ~11.4k and ~14.6k img/s
at bs256, BASELINE.md "Multi-chip serving projection").

The lag-`depth` `serve.stream(...)` generator realizes that overlap: JAX's
async dispatch already queues the per-chip programs without blocking, so the
only way to lose the pipelining is to synchronize between batches (e.g.
`np.asarray(logits)` per step). stream() keeps up to `depth` batches in
flight and materializes results that many batches behind dispatch.

On one chip this all degrades gracefully to the sequential single-chip layout
(same programs, one device); with D chips the ensemble forward takes
max(division time) + fusion, and with D+1 chips the steady-state streaming
period is max(division time) alone.

(The gated/stacked TRAINING-time ensemble uses the ('div','data') mesh in
parallel/mesh.py instead — uniform shapes there make SPMD the right tool.
This module is for the ragged deployed artifacts, where shapes differ per
division and per-device programs are the natural fit.)
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Optional, Sequence

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
    fusion_device: Optional[jax.Device] = None,
    dtype=jnp.bfloat16,
    use_pallas: bool = True,
    fast_math: bool = True,
) -> Callable:
    """Build `serve(ens_vars, images) -> logits` with division d committed to
    devices[d % len(devices)] and EnsMLP fusion on `fusion_device` (default:
    the first device not hosting a division, else devices[0]).

    ens_apply: (ens_vars, cls_stack, dist_stack) -> output with .logits
    (models/ensemble.py EnsMLP.apply wrapped accordingly). The `ens_vars`
    build argument only sizes the fusion program; callers pass (possibly
    updated) fusion weights on every call.

    The returned callable also carries `serve.stream(ens_vars, batches,
    depth=2)`: a generator yielding host logits per input batch, dispatching
    `depth` batches ahead so fusion of batch k overlaps the divisions'
    forwards of batches k+1..k+depth (see module docstring).
    """
    # local_devices, not jax.devices(): under multihost (DEVIT_MULTIHOST)
    # device_put to another process's devices is not addressable.
    devices = list(devices if devices is not None else jax.local_devices())
    if fusion_device is None:
        # first spare chip if one exists: fusion off the division chips keeps
        # the streaming steady state at max(division time) (module docstring)
        fusion_device = (devices[len(cms)] if len(devices) > len(cms)
                         else devices[0])
    fusion_dev = fusion_device
    placed = []
    for d, cm in enumerate(cms):
        dev = devices[d % len(devices)]
        placed.append(jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dev) if hasattr(x, "shape") else x, cm))

    def _division_fn(cm):
        # `cm` is DELIBERATELY closed into the jit (same pattern + rationale
        # as bench.py): CompactViT mixes per-layer Python ints (must be
        # static) with ragged weight arrays, and serving re-dispatches the
        # same frozen weights every batch — baking them as program constants
        # trades a slower one-time compile for constant-folded serving. The
        # CLAUDE.md "never close big pytrees" rule targets TRAINING pytrees
        # passed to fresh traces, where the compile stall repeats.
        def fn(images):
            return compact_forward(
                cm, images, patch_size=patch_size, dtype=dtype,
                use_pallas=use_pallas, fast_math=fast_math, features_only=True)
        return jax.jit(fn)

    div_fns = [_division_fn(cm) for cm in placed]

    @jax.jit
    def _fuse(ev, cls_stack, dist_stack):
        return ens_apply(ev, cls_stack, dist_stack)

    def _dispatch(ev, images) -> jax.Array:
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
        return _fuse(ev, cls_stack, dist_stack).logits

    def serve(ens_vars, images) -> jax.Array:
        return _dispatch(jax.device_put(ens_vars, fusion_dev), images)

    def stream(ens_vars, batches: Iterable, *, depth: int = 2):
        """Pipelined serving loop: yield HOST logits for each batch in order,
        keeping up to `depth` batches in flight on the devices. device_get of
        batch k happens only after batches k+1..k+depth are dispatched, so
        the fusion chip works on batch k while the division chips are already
        into later batches. depth=1 is plain double buffering; the default 2
        also absorbs host-side jitter between yields."""
        if depth < 1:
            raise ValueError(f"stream depth must be >= 1, got {depth}")
        ev = jax.device_put(ens_vars, fusion_dev)
        inflight: deque = deque()
        for images in batches:
            inflight.append(_dispatch(ev, images))
            if len(inflight) > depth:
                yield jax.device_get(inflight.popleft())
        while inflight:
            yield jax.device_get(inflight.popleft())

    serve.stream = stream
    serve.division_devices = [devices[d % len(devices)] for d in range(len(cms))]
    serve.fusion_device = fusion_dev
    serve.placed_divisions = placed  # exposed so tests can assert real placement
    return serve
