"""Multi-process (multi-host) initialisation + rank-0 semantics.

The TPU-native equivalent of the reference's DDP process orchestration
(``/root/reference/unina_yolo_dla/train.py:270-297`` env-var plumbing,
``trainer.py:288-290`` per-worker re-initialisation): one
``jax.distributed.initialize`` call connects the hosts, after which
``jax.devices()`` is the GLOBAL device list and the existing 1-D data mesh
spans all hosts — gradient all-reduce rides ICI within a slice and DCN
across slices, inserted by XLA from the same sharding annotations as the
single-host path (SURVEY §5 "jax.distributed.initialize + pjit/shard_map
over ICI/DCN").

Rank-0 semantics (reference train.py:1064-1096 gates CP calibration on
RANK): ``is_main_process()`` gates every artifact write — checkpoints,
history, calibration caches, exports. There is no re-registration dance:
JAX processes run the same program, and module registration is ordinary
Python import.

Data: each host feeds only its slice of the global batch
(``process_index()``-strided — see ``data.dataset.batch_iterator``'s
``process_slice``) and ``make_global_batch`` assembles the global
jax.Arrays via ``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Env-var channel for launchers that can't pass CLI flags per process
# (the UNINA_DLA_QAT-style env contract of the reference, train.py:821).
ENV_COORDINATOR = "UNINA_COORDINATOR"
ENV_NUM_PROCESSES = "UNINA_NUM_PROCESSES"
ENV_PROCESS_ID = "UNINA_PROCESS_ID"


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Connect this process to the training job. Returns True if a
    multi-process runtime was initialised, False for single-process.

    Arguments fall back to UNINA_COORDINATOR / UNINA_NUM_PROCESSES /
    UNINA_PROCESS_ID env vars; with neither, this is a no-op (the
    single-host path needs no coordinator). On real TPU pods with a
    supported launcher, ``jax.distributed.initialize()`` with no args
    auto-detects — pass coordinator="auto" to request that.
    """
    coordinator = coordinator or os.environ.get(ENV_COORDINATOR)
    num_processes = num_processes or _env_int(ENV_NUM_PROCESSES)
    process_id = process_id if process_id is not None \
        else _env_int(ENV_PROCESS_ID)

    if coordinator == "auto":
        jax.distributed.initialize()
        return jax.process_count() > 1
    if not coordinator or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _env_int(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v else None


def is_main_process() -> bool:
    """Rank-0 gate for artifact writes (reference RANK in {-1, 0})."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def make_global_batch(
    batch: dict[str, np.ndarray],
    mesh: Mesh,
    global_batch_size: int,
    axis: str = "data",
) -> dict[str, Any]:
    """Per-host batch slice -> global batch-sharded jax.Arrays.

    ``batch`` holds this host's rows only (global_batch_size /
    process_count of them); the returned arrays are global views sharded
    over the mesh's data axis, assembled without any cross-host copy —
    each device keeps the rows its host loaded.
    """
    sharding = NamedSharding(mesh, P(axis))

    def to_global(x: np.ndarray):
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(x),
            global_shape=(global_batch_size,) + x.shape[1:])

    return {k: to_global(v) for k, v in batch.items()}
