"""Fused frame->boxes serving pipeline.

The TPU-native equivalent of the reference's per-frame hot loop
(``perception_node.cpp:581-688``): preprocess -> inference -> decode x3 ->
NMS -> compacted detections. On the reference this is five CUDA kernel
launches + a TensorRT enqueue + explicit stream sync; here it is ONE jitted
XLA program — the frame enters HBM once, only the ~1 KB detection set
(1024 x (4+1+1+1) x 4 B upper bound; valid-masked) returns to the host.
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from ..models.config import (
    DEFAULT_CONF_THRESHOLD,
    DEFAULT_CP_Q,
    DEFAULT_IOU_THRESHOLD,
    MAX_DETECTIONS,
    ModelConfig,
)
from ..ops.decode import Detections, decode_outputs
from ..ops.nms import nms, nms_fast
from ..ops.preprocess import normalize, resize_bilinear_mxu


def build_serving_fn(
    model,
    cfg: ModelConfig,
    conf_threshold: float = DEFAULT_CONF_THRESHOLD,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
    q_factor: float = DEFAULT_CP_Q,
    max_detections: int = MAX_DETECTIONS,
    use_greedy_nms: bool = True,
) -> Callable[[Any, jnp.ndarray], Detections]:
    """Returns a jittable ``(variables, frame_uint8) -> Detections``.

    ``frame_uint8`` is (H, W, 3) RGB uint8 already at ``cfg.input_size``
    (camera-resolution frames go through ``ops.preprocess.resize_bilinear``
    or the Pallas fused kernel first — kept out of the benchmark path since
    the reference's 15 ms target is measured at 640x640 input).
    """

    def serve(variables, frame: jnp.ndarray) -> Detections:
        x = normalize(frame.astype(jnp.float32) / 255.0)
        x = x[None]  # batch 1
        outputs = model.apply(variables, x, train=False)
        dets = decode_outputs(
            outputs, cfg.strides, conf_threshold, q_factor, max_detections)
        if use_greedy_nms:
            return nms(dets, iou_threshold)
        return nms_fast(dets, iou_threshold)

    return serve


def build_camera_serving_fn(
    model,
    cfg: ModelConfig,
    camera_height: int,
    camera_width: int,
    camera_format: str = "bgra",   # "bgra" | "rgb"
    conf_threshold: float = DEFAULT_CONF_THRESHOLD,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
    q_factor: float = DEFAULT_CP_Q,
    max_detections: int = MAX_DETECTIONS,
) -> Callable[[Any, jnp.ndarray], Detections]:
    """Full camera-path pipeline: raw camera-resolution frame on-chip.

    Parity with the reference's fused resize kernel
    (``resize_bgra_to_rgb_normalize_kernel``, cuda_preprocess.cu:144-204):
    BGRA/RGB at camera resolution -> bilinear resize (two interpolation
    MATMULS on the MXU — the TPU-native gather replacement) -> ImageNet
    normalise -> forward -> decode -> NMS, all one XLA program. Detected
    boxes are returned in MODEL pixel space; multiply by
    ``camera_{width,height} / cfg.input_size`` to map back.
    """
    s = cfg.input_size

    def serve(variables, frame: jnp.ndarray) -> Detections:
        if camera_format == "bgra":
            frame = frame[..., 2::-1]  # BGRA -> RGB (drop alpha)
        resized = resize_bilinear_mxu(frame.astype(jnp.float32), s, s)
        x = normalize(resized / 255.0)[None]
        outputs = model.apply(variables, x, train=False)
        dets = decode_outputs(
            outputs, cfg.strides, conf_threshold, q_factor, max_detections)
        return nms(dets, iou_threshold)

    return serve
