"""Mesh construction and sharding rules.

The reference has no distributed training (single-device model.fit,
SURVEY.md section 2.3); parallelism here is defined TPU-first: a ~1M-param
DS-CNN over 3-second chunks scales by **batch data parallelism** over a
`jax.sharding.Mesh`. Parameters are replicated, batches are sharded along
the `data` axis, and XLA GSPMD inserts the gradient all-reduce over ICI.

Model parallelism (TP/PP/SP/EP) is intentionally absent — recorded in
SURVEY.md sections 5.7-5.8 as not applicable at this model scale.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Full replication (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a pytree of [B, ...] arrays with B sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(batch, multiple: int):
    """Right-pad the batch dim of a pytree to a multiple (for even sharding).

    Returns (padded_batch, real_count). Padding rows are zeros; callers
    mask losses/metrics with `real_count`.
    """
    def pad(x):
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)

    leaves = jax.tree_util.tree_leaves(batch)
    real = leaves[0].shape[0] if leaves else 0
    return jax.tree_util.tree_map(pad, batch), real
