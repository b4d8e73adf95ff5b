"""Device mesh and sharding helpers.

The reference has no distributed machinery at all (SURVEY.md §2: single GPU,
keras loader threads only). This module is the TPU-native scaling layer:
an explicit ``jax.sharding.Mesh`` with named axes

  - 'data'  : batch (pair) dimension for training — data parallelism
  - 'db'    : descriptor-database N axis for serving — map parallelism

XLA inserts the collectives; nothing here talks to transports directly.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("data",),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """A 1-D (default) mesh over the first ``n_devices`` devices.

    With multiple axis names, the first axis takes all devices and the rest
    have size 1 (extend when a real multi-axis layout is profiled in).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(mesh: Mesh, x: Any) -> jax.Array:
    """Replicate one host array over the mesh (multi-process safe: every
    process must pass the same value)."""
    s = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])


def put_sharded(mesh: Mesh, x: Any, axis: str = "data") -> jax.Array:
    """Shard one host array's leading dim over ``axis``.

    ``x`` is the full GLOBAL array, identical on every process; each process
    device_puts only the rows its local devices own (the standard multi-host
    input pattern — jax.make_array_from_single_device_arrays assembles the
    global array without any cross-host transfer)."""
    s = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])


def put_sharded_dim(mesh: Mesh, x: Any, dim: int = 0, axis: str = "data") -> jax.Array:
    """Shard one host array's dimension ``dim`` over ``axis`` (multi-process
    safe, same input pattern as :func:`put_sharded`). Used for K-stacked
    batches whose layout is (K, B, ...): dim=1 shards the batch dim."""
    spec = P(*([None] * dim + [axis]))
    s = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put a pytree of host arrays with the leading dim sharded.

    Works in both single-process and multi-process (jax.distributed) modes;
    in the latter, every process passes the same global batch and only the
    locally-owned rows are transferred."""
    return jax.tree.map(lambda x: put_sharded(mesh, x, axis), batch)


def pad_to_multiple(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the leading dim up to a multiple (for even sharding); returns the
    padded array and the original length."""
    n = batch.shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, n
    pad = multiple - rem
    pad_block = np.repeat(batch[-1:], pad, axis=0)
    return np.concatenate([batch, pad_block], axis=0), n
