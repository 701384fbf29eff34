"""Device-mesh and sharding helpers.

The reference has no distributed capability at all (single GPU + SGE array
jobs, SURVEY.md §2 parallelism statement); this module is the NEW scale-out
layer: a (data, model) ``jax.sharding.Mesh`` over the local chips (ICI) or,
with ``jax.distributed``, over hosts (DCN). Training shards the image batch
over 'data' (XLA inserts the gradient all-reduce over ICI); retrieval shards
the HBM-resident descriptor index over 'data' as well (ops/topk.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_data: int = 0,
    num_model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """A 2-D (data, model) mesh. ``num_data=0`` consumes all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if num_data <= 0:
        num_data = max(n // max(num_model, 1), 1)
    assert num_data * num_model <= n, (
        f"requested {num_data}x{num_model} mesh exceeds {n} devices"
    )
    grid = mesh_utils.create_device_mesh(
        (num_data, num_model), devices=list(devices)[: num_data * num_model]
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Optional[Mesh]) -> Any:
    """device_put a pytree with leading-axis data sharding for arrays whose
    first dim divides the data axis, replicating everything else (scalar
    payloads, PCA state...)."""
    if mesh is None:
        return jax.device_put(batch)
    n_data = mesh.shape[DATA_AXIS]
    data_s = batch_sharding(mesh)
    repl_s = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n_data == 0 and x.shape[0] > 0:
            return jax.device_put(x, data_s)
        return jax.device_put(x, repl_s)

    return jax.tree_util.tree_map(put, batch)


def shard_batch_stacked(batch: Any, mesh: Optional[Mesh]) -> Any:
    """shard_batch for K-step fused dispatch: leaves are stacked to
    (K, batch, ...), so the DATA axis is dim 1 — shard that, replicate the
    scan axis and everything that doesn't divide."""
    if mesh is None:
        return jax.device_put(batch)
    n_data = mesh.shape[DATA_AXIS]
    data_s = NamedSharding(mesh, P(None, DATA_AXIS))
    repl_s = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 2 and x.shape[1] % n_data == 0 and x.shape[1] > 0:
            return jax.device_put(x, data_s)
        return jax.device_put(x, repl_s)

    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Pad with repeats of row 0 so shape[axis] % multiple == 0 (static shapes;
    the reference pads eval/mining batches the same way,
    train/train.py:1026-1030,1160-1163)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = np.take(x, np.zeros(rem, dtype=int), axis=axis)
    return np.concatenate([x, pad], axis=axis)
