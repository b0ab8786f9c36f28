"""Detection loss: BCE classification + CIoU TLBR regression.

The reference's loss lives inside Ultralytics (SURVEY.md §7 hard parts);
this is our own anchor-free formulation matched to the 4-channel raw-TLBR
head (no DFL — the head predicts box offsets directly,
reference model.py:296-300):

  L = w_cls * BCE(cls_logits, target_scores) / sum(target_scores)
    + w_box * sum(score * (1 - CIoU(pred, target))) / sum(target_scores)

Weights default to the Ultralytics convention (cls 0.5, box 7.5) scaled for
the missing DFL term.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from ..models.config import ModelConfig
from ..utils.boxes import box_ciou
from .assigner import AssignResult, assign, decode_ltrb, make_anchors


class LossConfig(NamedTuple):
    cls_weight: float = 0.5
    box_weight: float = 7.5
    assigner_topk: int = 10
    assigner_alpha: float = 0.5
    assigner_beta: float = 6.0


def flatten_outputs(outputs) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Model ``[(cls,reg) x3]`` NHWC -> ((B, A, C), (B, A, 4)) flat."""
    cls_flat, reg_flat = [], []
    for cls_l, reg_l in outputs:
        b = cls_l.shape[0]
        cls_flat.append(cls_l.reshape(b, -1, cls_l.shape[-1]))
        reg_flat.append(reg_l.reshape(b, -1, 4))
    return jnp.concatenate(cls_flat, 1), jnp.concatenate(reg_flat, 1)


def detection_loss(
    outputs,
    gt_boxes: jnp.ndarray,   # (B, G, 4) xyxy px
    gt_labels: jnp.ndarray,  # (B, G) int32
    gt_mask: jnp.ndarray,    # (B, G) bool
    cfg: ModelConfig,
    loss_cfg: LossConfig = LossConfig(),
    grid_sizes: Sequence[int] | None = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Returns (scalar loss, aux dict). Fully jittable, static shapes."""
    grid_sizes = tuple(grid_sizes or cfg.grid_sizes)
    anchors, strides = make_anchors(grid_sizes, cfg.strides)

    cls_logits, reg = flatten_outputs(outputs)       # (B,A,C), (B,A,4)
    pred_boxes = decode_ltrb(reg, anchors, strides)  # (B,A,4) px

    pred_scores = jax.nn.sigmoid(cls_logits)
    res: AssignResult = assign(
        jax.lax.stop_gradient(pred_scores),
        jax.lax.stop_gradient(pred_boxes),
        anchors, gt_boxes, gt_labels, gt_mask, cfg.num_classes,
        topk=loss_cfg.assigner_topk, alpha=loss_cfg.assigner_alpha,
        beta=loss_cfg.assigner_beta)

    score_sum = jnp.maximum(res.target_scores.sum(), 1.0)

    # Classification: BCE against soft target scores, all anchors.
    cls_loss = optax.sigmoid_binary_cross_entropy(
        cls_logits, res.target_scores).sum() / score_sum

    # Regression: CIoU on foreground anchors, weighted by target score.
    ciou = box_ciou(pred_boxes, res.target_boxes)    # (B, A)
    weight = res.target_scores.sum(-1)               # (B, A)
    box_loss = (jnp.where(res.fg_mask, (1.0 - ciou) * weight, 0.0).sum()
                / score_sum)

    total = loss_cfg.cls_weight * cls_loss + loss_cfg.box_weight * box_loss
    aux = {
        "loss": total,
        "cls_loss": cls_loss,
        "box_loss": box_loss,
        "num_fg": res.fg_mask.sum(),
    }
    return total, aux
