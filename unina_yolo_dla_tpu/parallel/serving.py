"""Sharded multi-stream serving: a camera fleet over a device mesh.

The reference serves one camera per Jetson (perception_node.cpp is a
single-device process). On TPU the natural deployment unit is a multi-
chip slice, so the multi-stream serving program (runtime/pipeline.py
``build_batch_serving_fn``) extends to it directly: shard the stream
axis over the mesh's ``data`` axis, replicate the weights, and run the
per-chip program under ``shard_map``. Per-stream work (forward, decode,
NMS) is independent, and shard_map makes that independence STRUCTURAL:
each chip runs its own complete program — including its own NMS-fixpoint
while loop — with ZERO collectives and zero cross-chip sync (a plain
``jit`` with shardings instead inserts a pred[] all-reduce per fixpoint
iteration to globalise the vmapped while condition, coupling every
camera's tail latency to the slowest chip's convergence; asserted
collective-free in tests). Each chip serves its slice of the fleet at
single-chip latency; total throughput scales linearly with slice size.
No NCCL, no per-device processes, no manual device loops: one call on
one host thread drives every chip.

Tested on the 8-device virtual CPU mesh (tests/test_parallel_serving.py)
— the same path the training DP story uses (SURVEY.md §2 #26).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import (
    DEFAULT_CONF_THRESHOLD,
    DEFAULT_CP_Q,
    DEFAULT_IOU_THRESHOLD,
    MAX_DETECTIONS,
    ModelConfig,
)
from ..runtime.pipeline import build_batch_serving_fn


def make_sharded_batch_serving_fn(
    model,
    cfg: ModelConfig,
    mesh: Mesh,
    conf_threshold: float = DEFAULT_CONF_THRESHOLD,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
    q_factor: float = DEFAULT_CP_Q,
    max_detections: int = MAX_DETECTIONS,
    axis: str = "data",
) -> Callable[[Any, jax.Array], Any]:
    """Returns jitted ``(variables, frames (B, ...)) -> Detections`` with
    the stream axis sharded over ``mesh[axis]`` and weights replicated;
    each chip runs its shard's program independently (shard_map).

    ``B`` must be a multiple of the mesh axis size. The returned
    Detections fields keep the leading stream axis (sharded — fetch with
    ``jax.device_get`` or consume shard-locally).
    """
    serve = build_batch_serving_fn(model, cfg, conf_threshold,
                                   iou_threshold, q_factor, max_detections)
    # check_vma=False: variables are replicated operands, and the body is
    # intentionally collective-free — nothing to cross-check.
    local = jax.shard_map(serve, mesh=mesh,
                          in_specs=(P(), P(axis)), out_specs=P(axis),
                          check_vma=False)
    return jax.jit(local)


def shard_streams(frames, mesh: Mesh, axis: str = "data"):
    """Place a host (B, ...) frame batch with streams split over the mesh."""
    return jax.device_put(frames, NamedSharding(mesh, P(axis)))
