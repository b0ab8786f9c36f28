"""Anchor-free head decode — pure-jnp reference oracle.

Numerical parity with the reference CPU decode
(``/root/reference/.../include/postprocess.hpp:94-145``) and the CUDA kernel
(``gpu_postprocess.cu:102-199``):

  - per-cell sigmoid over class logits, argmax -> (conf, class)
  - cell center = (x + 0.5) * stride
  - reg output is [l, t, r, b] in stride units:
      x1 = cx - l*s,  y1 = cy - t*s,  x2 = cx + r*s,  y2 = cy + b*s
  - conformal dilation (postprocess.hpp:77-85): grow each side by
    q * width / q * height.

TPU-first shape discipline: every function returns STATIC shapes. There is
no data-dependent compaction; candidate selection is a masked top-k to a
fixed ``max_detections`` (default 1024 = reference MAX_DETECTIONS). This is
the sort/threshold replacement for the CUDA warp-aggregated atomic append.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..models.config import (
    DEFAULT_CONF_THRESHOLD,
    DEFAULT_CP_Q,
    MAX_DETECTIONS,
)


class Detections(NamedTuple):
    """Fixed-capacity detection set (the ~1 KB device->host payload)."""

    boxes: jnp.ndarray    # (K, 4) xyxy, pixels
    scores: jnp.ndarray   # (K,)
    classes: jnp.ndarray  # (K,) int32
    valid: jnp.ndarray    # (K,) bool

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


# Allow Detections to cross the jax.export serialization boundary (the AOT
# serving artifact returns one).
try:
    from jax import export as _jax_export

    _jax_export.register_namedtuple_serialization(
        Detections, serialized_name="unina_yolo_dla_tpu.Detections")
except Exception:  # pragma: no cover - older jax without the registry
    pass


def decode_level(
    cls_logits: jnp.ndarray,   # (H, W, C) raw logits
    reg: jnp.ndarray,          # (H, W, 4) raw TLBR in stride units
    stride: int,
    conf_threshold: float = DEFAULT_CONF_THRESHOLD,
    q_factor: float = DEFAULT_CP_Q,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode one pyramid level. Returns flat per-cell
    (boxes (HW,4), scores (HW,), classes (HW,), valid (HW,))."""
    h, w, _ = cls_logits.shape
    conf = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    scores = jnp.max(conf, axis=-1)           # (H, W)
    classes = jnp.argmax(conf, axis=-1)       # (H, W)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    cx = (xs + 0.5) * stride
    cy = (ys + 0.5) * stride

    reg = reg.astype(jnp.float32) * stride
    l, t, r, b = reg[..., 0], reg[..., 1], reg[..., 2], reg[..., 3]
    x1, y1 = cx - l, cy - t
    x2, y2 = cx + r, cy + b

    if q_factor > 0.0:
        dw = (x2 - x1) * q_factor
        dh = (y2 - y1) * q_factor
        x1, y1, x2, y2 = x1 - dw, y1 - dh, x2 + dw, y2 + dh

    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(-1, 4)
    scores = scores.reshape(-1)
    classes = classes.reshape(-1).astype(jnp.int32)
    valid = scores > conf_threshold
    return boxes, scores, classes, valid


def decode_outputs(
    outputs: Sequence[tuple[jnp.ndarray, jnp.ndarray]],
    strides: Sequence[int] = (4, 8, 16),
    conf_threshold: float = DEFAULT_CONF_THRESHOLD,
    q_factor: float = DEFAULT_CP_Q,
    max_detections: int = MAX_DETECTIONS,
    exact_topk: bool = True,
) -> Detections:
    """Decode all levels of a SINGLE image and compact to ``max_detections``.

    ``outputs`` is the model's ``[(cls, reg), ...]`` with leading batch dim 1
    or no batch dim. Compaction = top-k over masked scores (replaces the
    reference's atomic append; deterministic and static-shaped).
    ``exact_topk=False`` switches to the faster TPU PartialReduce — the
    SERVING default (see inline note for when it is provably identical);
    eval/mining keep the exact sort because they decode at conf 0.001,
    where #valid >> K and a 0.99-recall pass could differ at the tail.
    """
    all_boxes, all_scores, all_classes, all_valid = [], [], [], []
    for (cls_l, reg_l), s in zip(outputs, strides):
        if cls_l.ndim == 4:
            cls_l, reg_l = cls_l[0], reg_l[0]
        b, sc, c, v = decode_level(cls_l, reg_l, s, conf_threshold, q_factor)
        all_boxes.append(b)
        all_scores.append(sc)
        all_classes.append(c)
        all_valid.append(v)

    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    classes = jnp.concatenate(all_classes, axis=0)
    valid = jnp.concatenate(all_valid, axis=0)

    # Masked top-k: invalid cells sink to -1 so they sort last.
    masked = jnp.where(valid, scores, -1.0)
    k = min(max_detections, masked.shape[0])
    if exact_topk or k >= masked.shape[0]:
        top_scores, top_idx = jax.lax.top_k(masked, k)
    else:
        # TPU PartialReduce (ApproxTopK): 0.072 -> 0.040 ms at
        # N=33.6k/K=1024 (RESULTS.md round 3). In the operating regime
        # the result is EXACTLY the top-k set: candidates are valid only
        # above conf_threshold, so the #valid <= K cap (the reference's
        # own max-detections contract, gpu_postprocess.cu atomic append)
        # means every valid row is returned; only sub-threshold
        # (already-invalid) tail rows can differ. exact_topk=True
        # restores the sort-based path.
        top_scores, top_idx = jax.lax.approx_max_k(
            masked, k, recall_target=0.99)
    # ONE row gather instead of four field gathers: TPU gathers are
    # latency-bound (~3 GB/s on the r3 trace, 2.9% of device time over
    # four of them), so pack the fields into 28 B rows, gather once, and
    # slice the columns back out. Class indices and the valid bit
    # round-trip f32 exactly (values < 2^24).
    packed = jnp.concatenate([
        boxes,
        scores[:, None],
        classes.astype(jnp.float32)[:, None],
        valid.astype(jnp.float32)[:, None],
    ], axis=1)
    rows = packed[top_idx]
    return Detections(
        boxes=rows[:, :4],
        scores=rows[:, 4],
        classes=rows[:, 5].astype(jnp.int32),
        valid=(rows[:, 6] > 0.5) & (top_scores > -0.5),
    )
