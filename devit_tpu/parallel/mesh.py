"""Device meshes and shardings — the TPU-native replacement for the
reference's DDP/NCCL stack (utils/dist_utils.py:215-237).

There is no process-group management: a `jax.sharding.Mesh` over the slice
plus NamedSharding annotations is the whole story. Gradient all-reduce is
implicit in XLA SPMD over ICI; metric sync is a `psum`.

Axes:
- 'data'  — batch sharding for every training stage (replaces DDP).
- 'div'   — division axis for the ensemble stage: each sub-model's stacked
  params live on a sub-mesh; the EnsMLP token concat becomes an all-gather
  over ICI (SURVEY.md §2.7 "TPU mapping").
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DIV_AXIS = "div"


def data_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first N) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def ensemble_mesh(
    num_divisions: int, num_devices: Optional[int] = None, devices=None
) -> Mesh:
    """2-D ('div', 'data') mesh: divisions across sub-meshes, batch within.

    With fewer devices than divisions (e.g. the single-chip benchmark), falls
    back to a pure data mesh with a degenerate div axis — the vmapped division
    forward then runs as one batched program on each chip, which is exactly
    the high-throughput single-chip layout.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    div = num_divisions if n % num_divisions == 0 and n >= num_divisions else 1
    grid = np.array(devices).reshape(div, n // div)
    return Mesh(grid, (DIV_AXIS, DATA_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard batch dim over 'data' (replicated over 'div' if present)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def division_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a leading division axis over 'div' (no-op spec if div not in mesh)."""
    if DIV_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DIV_AXIS))
    return NamedSharding(mesh, P())


def shard_division_tree(tree, mesh: Mesh, num_divisions: Optional[int] = None):
    """Shard each leaf's leading axis over 'div' where it matches the division
    count; replicate everything else (e.g. scalar optimizer counters)."""
    if num_divisions is None:
        num_divisions = mesh.shape.get(DIV_AXIS, 1)
    sh_div, sh_rep = division_sharding(mesh), replicated(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_divisions:
            return jax.device_put(x, sh_div)
        return jax.device_put(x, sh_rep)

    return jax.tree_util.tree_map(put, tree)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


# NOTE on metric sync: the reference all_reduces SmoothedValue counters
# across ranks (dist_utils.py:35-46). Here eval steps return summed counters
# computed under SPMD over the sharded batch — XLA already inserts the
# cross-device reduction for the jnp.sum, so the host-side aggregation in
# train/loop.run_eval sees globally-correct counts and no explicit psum
# helper is needed.
