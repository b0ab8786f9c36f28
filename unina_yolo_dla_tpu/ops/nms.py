"""Class-aware greedy NMS — pure-jnp reference oracle, static shapes.

Semantic parity with the reference
(``/root/reference/.../include/postprocess.hpp:44-67`` and the CUDA kernel
``gpu_postprocess.cu:207-231``): detections sorted by confidence descending;
a surviving higher-confidence box suppresses any lower-confidence box of the
SAME class with IoU > threshold.

TPU-first: no atomics, no dynamic shapes. Greedy NMS is inherently
sequential in the survivor set, so this runs a ``lax.fori_loop`` over the K
sorted candidates with a fully vectorised suppression row per step —
K iterations of O(K) VPU work, K = 1024 static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.config import DEFAULT_IOU_THRESHOLD
from ..utils.boxes import pairwise_iou
from .decode import Detections


def nms(
    dets: Detections,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
) -> Detections:
    """Greedy class-aware NMS over a confidence-sorted Detections set.

    ``dets`` must already be sorted by score descending (decode_outputs'
    top-k guarantees this). Returns the same static-shape Detections with
    ``valid`` cleared on suppressed boxes.
    """
    k = dets.boxes.shape[0]
    iou = pairwise_iou(dets.boxes, dets.boxes)               # (K, K)
    same_class = dets.classes[:, None] == dets.classes[None, :]
    # suppress_matrix[i, j]: i would suppress j (j strictly later in sort order)
    later = jnp.triu(jnp.ones((k, k), dtype=bool), k=1)
    suppress_matrix = (iou > iou_threshold) & same_class & later
    suppress_matrix &= dets.valid[None, :] & dets.valid[:, None]

    def body(i, keep):
        # Row i only acts if box i itself survived so far.
        row = suppress_matrix[i] & keep[i]
        return keep & ~row

    keep = jax.lax.fori_loop(0, k, body, dets.valid)
    return dets._replace(valid=keep)


def nms_fast(
    dets: Detections,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
) -> Detections:
    """One-shot matrix NMS approximation (no sequential dependency).

    Suppresses any box overlapped by ANY higher-scored same-class box,
    regardless of whether that box itself survived. Differs from greedy NMS
    only in chains (A suppresses B, B would have suppressed C -> here C also
    checks against A). Cheaper on TPU (one matmul-free pass, no loop);
    exposed for latency-critical serving where the chain case is rare.
    """
    iou = pairwise_iou(dets.boxes, dets.boxes)
    same_class = dets.classes[:, None] == dets.classes[None, :]
    k = dets.boxes.shape[0]
    earlier = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1)   # j earlier than i
    suppressed_by = (iou.T > iou_threshold) & same_class & earlier
    suppressed_by &= dets.valid[None, :]
    keep = dets.valid & ~jnp.any(suppressed_by, axis=1)
    return dets._replace(valid=keep)
