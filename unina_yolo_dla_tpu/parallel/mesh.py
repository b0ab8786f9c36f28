"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's DDP env-var plumbing
(``train.py:29-34, 270-297``; SURVEY.md §2 #26/#28): instead of NCCL
subprocess orchestration, a 1-D ``jax.sharding.Mesh`` over the ``data``
axis with batch-sharded inputs and replicated params. XLA inserts the
gradient all-reduce (psum over ICI) automatically from the sharding
annotations; there is no hand-written collective in the DP path.

The model is a ~5M-param CNN, so data parallelism is the only profitable
strategy (the reference likewise has DP only — SURVEY.md §2 #27); the mesh
helpers still accept extra axes so larger variants can shard ('data',
'model') if ever needed.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("data",),
    shape: Sequence[int] | None = None,
) -> Mesh:
    """1-D data mesh by default; multi-axis if ``shape`` is given."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if shape is None:
        shape = (n,)
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for a pytree of arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch pytree with the batch axis split over the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
