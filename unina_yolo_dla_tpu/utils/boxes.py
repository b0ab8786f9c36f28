"""Box utilities: format conversion and IoU family (vectorised jnp).

IoU semantics match the reference scalar implementation
(``/root/reference/.../include/postprocess.hpp:28-39``): degenerate
intersections return 0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[cx, cy, w, h] -> [x1, y1, x2, y2] (last-dim 4)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; last dim 4 -> scalar per box."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Elementwise IoU of xyxy boxes with broadcasting.

    ``a`` and ``b`` must broadcast against each other on all but the last
    axis. For an (N, M) pairwise matrix pass shapes (N, 1, 4) and (M, 4).
    """
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return inter / jnp.maximum(union, eps)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU matrix."""
    return box_iou(a[:, None, :], b[None, :, :])


def box_ciou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete-IoU (CIoU) between broadcastable xyxy boxes.

    Used by the regression loss (the reference delegates its loss to
    Ultralytics' CIoU; we own it here).
    """
    iou = box_iou(a, b, eps)

    # Enclosing box diagonal
    enc_lt = jnp.minimum(a[..., :2], b[..., :2])
    enc_rb = jnp.maximum(a[..., 2:], b[..., 2:])
    enc_wh = jnp.clip(enc_rb - enc_lt, 0.0)
    c2 = enc_wh[..., 0] ** 2 + enc_wh[..., 1] ** 2 + eps

    # Center distance
    a_c = (a[..., :2] + a[..., 2:]) / 2
    b_c = (b[..., :2] + b[..., 2:]) / 2
    rho2 = jnp.sum((a_c - b_c) ** 2, axis=-1)

    # Aspect-ratio consistency
    a_wh = jnp.clip(a[..., 2:] - a[..., :2], eps)
    b_wh = jnp.clip(b[..., 2:] - b[..., :2], eps)
    v = (4 / jnp.pi**2) * (
        jnp.arctan(b_wh[..., 0] / b_wh[..., 1])
        - jnp.arctan(a_wh[..., 0] / a_wh[..., 1])
    ) ** 2
    # alpha is a trade-off weight, treated as constant w.r.t. the gradient
    alpha = jax.lax.stop_gradient(v / jnp.maximum(1.0 - iou + v, eps))

    return iou - rho2 / c2 - alpha * v
