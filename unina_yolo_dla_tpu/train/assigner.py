"""Task-aligned (TAL) anchor-free label assignment.

The reference delegates assignment/loss entirely to Ultralytics
(SURVEY.md §7 "hard parts"); this is our own implementation, built
batched + static-shaped for TPU:

- anchor points = cell centers of every P2/P3/P4 cell ((x+0.5)*stride,
  matching the serving decode in ops/decode.py).
- candidates: anchors whose center lies inside a GT box.
- alignment metric t = score^alpha * iou^beta (alpha=0.5, beta=6.0).
- top-k (k=10) anchors per GT by t; anchors claimed by several GTs go to
  the GT with the highest IoU.
- target scores = one-hot(label) * t / max_t * max_iou (per assigned GT).

Everything is dense masked tensor algebra over a fixed ``max_gt`` — no
dynamic shapes, no host sync; vmapped over the batch.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..utils.boxes import box_iou


class AssignResult(NamedTuple):
    fg_mask: jnp.ndarray         # (B, A) bool — anchor has a target
    target_boxes: jnp.ndarray    # (B, A, 4) xyxy px
    target_scores: jnp.ndarray   # (B, A, C) soft cls targets in [0, 1]
    target_gt_idx: jnp.ndarray   # (B, A) int32 index into the GT axis


def make_anchors(
    grid_sizes: Sequence[int],
    strides: Sequence[int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Flat anchor centers (A, 2) in pixels + per-anchor stride (A,)."""
    centers, strs = [], []
    for g, s in zip(grid_sizes, strides):
        ys = jax.lax.broadcasted_iota(jnp.float32, (g, g), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (g, g), 1)
        c = jnp.stack([(xs + 0.5) * s, (ys + 0.5) * s], axis=-1).reshape(-1, 2)
        centers.append(c)
        strs.append(jnp.full((g * g,), s, jnp.float32))
    return jnp.concatenate(centers), jnp.concatenate(strs)


def decode_ltrb(reg: jnp.ndarray, anchors: jnp.ndarray,
                strides: jnp.ndarray) -> jnp.ndarray:
    """(…, A, 4) raw ltrb (stride units) -> xyxy pixels at anchor centers.

    Identical decode math to serving (ops/decode.py / postprocess.hpp:117-132)
    so train-time and serve-time geometry cannot diverge.
    """
    ltrb = reg * strides[..., None]
    x1 = anchors[..., 0] - ltrb[..., 0]
    y1 = anchors[..., 1] - ltrb[..., 1]
    x2 = anchors[..., 0] + ltrb[..., 2]
    y2 = anchors[..., 1] + ltrb[..., 3]
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def assign(
    pred_scores: jnp.ndarray,   # (B, A, C) sigmoid probabilities
    pred_boxes: jnp.ndarray,    # (B, A, 4) xyxy px
    anchors: jnp.ndarray,       # (A, 2) centers px
    gt_boxes: jnp.ndarray,      # (B, G, 4) xyxy px
    gt_labels: jnp.ndarray,     # (B, G) int32
    gt_mask: jnp.ndarray,       # (B, G) bool — real vs padding
    num_classes: int,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    B, A, C = pred_scores.shape
    G = gt_boxes.shape[1]

    # (B, G, A) IoU between each GT and each predicted box
    iou = box_iou(gt_boxes[:, :, None, :], pred_boxes[:, None, :, :])
    iou = jnp.clip(iou, 0.0)

    # classification score of each anchor at each GT's label: (B, G, A)
    labels = jnp.clip(gt_labels, 0, num_classes - 1)
    score_at_label = jnp.take_along_axis(
        jnp.swapaxes(pred_scores, 1, 2),          # (B, C, A)
        labels[:, :, None], axis=1)               # -> (B, G, A)

    align = (score_at_label ** alpha) * (iou ** beta)

    # candidate: anchor center strictly inside the GT box
    cx = anchors[None, None, :, 0]
    cy = anchors[None, None, :, 1]
    inside = ((cx > gt_boxes[..., 0:1]) & (cx < gt_boxes[..., 2:3])
              & (cy > gt_boxes[..., 1:2]) & (cy < gt_boxes[..., 3:4]))
    mask = inside & gt_mask[:, :, None]

    align = jnp.where(mask, align, 0.0)

    # top-k per GT over anchors
    k = min(topk, A)
    topk_vals, topk_idx = jax.lax.top_k(align, k)            # (B, G, k)
    topk_mask = topk_vals > eps
    in_topk = jnp.zeros((B, G, A), bool)
    in_topk = jnp.put_along_axis(
        in_topk, topk_idx, topk_mask, axis=2, inplace=False)
    mask = mask & in_topk

    # resolve anchors claimed by multiple GTs: keep the max-IoU GT
    claimed = jnp.sum(mask.astype(jnp.int32), axis=1)        # (B, A)
    iou_masked = jnp.where(mask, iou, -1.0)
    best_gt = jnp.argmax(iou_masked, axis=1)                 # (B, A)
    keep = jax.nn.one_hot(best_gt, G, axis=1, dtype=bool)    # (B, G, A)
    mask = jnp.where((claimed > 1)[:, None, :], mask & keep, mask)

    fg_mask = jnp.any(mask, axis=1)                          # (B, A)
    target_gt_idx = jnp.argmax(mask, axis=1).astype(jnp.int32)  # (B, A)

    # gather per-anchor targets
    target_boxes = jnp.take_along_axis(
        gt_boxes, target_gt_idx[..., None], axis=1)          # (B, A, 4)
    target_labels = jnp.take_along_axis(gt_labels, target_gt_idx, axis=1)
    onehot = jax.nn.one_hot(target_labels, num_classes)      # (B, A, C)

    # normalised soft scores: per-GT  t * max_iou / max_t
    align = jnp.where(mask, align, 0.0)
    max_align = jnp.max(align, axis=2, keepdims=True)        # (B, G, 1)
    max_iou = jnp.max(jnp.where(mask, iou, 0.0), axis=2, keepdims=True)
    norm = align * max_iou / jnp.maximum(max_align, eps)     # (B, G, A)
    anchor_score = jnp.max(norm, axis=1)                     # (B, A)

    target_scores = onehot * anchor_score[..., None]
    target_scores = jnp.where(fg_mask[..., None], target_scores, 0.0)

    return AssignResult(
        fg_mask=fg_mask,
        target_boxes=target_boxes,
        target_scores=target_scores,
        target_gt_idx=target_gt_idx,
    )
