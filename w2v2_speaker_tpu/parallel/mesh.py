"""Device-mesh and sharding helpers.

The reference's only parallelism is PyTorch-Lightning DDP
(`/root/reference/config/trainer/trainer.yaml:9-16`,
`src/main.py:500-504`). The TPU-native equivalent is a `jax.sharding.Mesh`
with the batch dimension sharded over a ``data`` axis; gradients are reduced
by the XLA collectives pjit inserts automatically (riding ICI, not host
networking). A ``model`` axis is part of the mesh contract from day one so
larger backbones can shard parameters (tensor parallel) without changing the
step functions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "batch_sharding",
    "stacked_batch_sharding",
    "replicated",
    "shard_batch",
    "data_parallel_specs",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Mesh over all (or given) devices: ('data', 'model'), model minor so
    model-parallel groups map to ICI-adjacent chips."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def strip_host_fields(batch: dict) -> dict:
    """Drop host-only batch fields (keys, transcriptions, ...) that cannot
    cross into jit; collate fns attach them for host-side bookkeeping."""
    return {
        k: v
        for k, v in batch.items()
        if hasattr(v, "shape") or np.isscalar(v)
    }


def pad_batch_rows(
    batch: dict, target_rows: int, mask_fill: bool = False
) -> dict:
    """Right-pad every array's leading dim to ``target_rows`` so ragged
    trailing batches keep the static shape the data-axis sharding (and one
    compiled program per bucket) requires. Pad rows are zeros; the 'mask'
    entry pads with ``mask_fill`` (False = invalid rows, excluded by the
    padding-invariant model paths; True = all-valid rows for the CTC
    logits path, where zero-length rows would be degenerate and the pad
    rows are sliced off before decoding). Callers slice outputs back to
    the true row count."""
    n = next(iter(batch.values())).shape[0]
    pad = target_rows - n
    if pad <= 0:
        return batch
    return {
        k: np.concatenate(
            [
                v,
                np.full(
                    (pad,) + v.shape[1:],
                    mask_fill if k == "mask" else 0,
                    v.dtype,
                ),
            ]
        )
        for k, v in batch.items()
    }


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """For [K, B, ...] stacked batches (steps_per_dispatch chunks): the scan
    axis replicated, the batch axis sharded over data."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(batch, mesh: Mesh, stacked: bool = False):
    """Device-put a pytree of host arrays with the leading axis sharded over
    the data axis (per-host feeding; XLA handles the rest). Host-only fields
    are stripped. With ``stacked`` the leaves are [K, B, ...] chunks and the
    second axis is the sharded one."""
    sharding = stacked_batch_sharding(mesh) if stacked else batch_sharding(mesh)
    if isinstance(batch, dict):
        batch = strip_host_fields(batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def data_parallel_specs(mesh: Mesh):
    """(state_sharding, batch_sharding) for pjit-style data parallelism:
    replicated state, batch-sharded inputs."""
    return replicated(mesh), batch_sharding(mesh)
