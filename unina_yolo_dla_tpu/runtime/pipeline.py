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

import jax
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
from ..ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize,
    nv12_to_rgb,
    resize_bilinear_mxu,
)


def _normalize_for(cfg: ModelConfig, frames: jnp.ndarray) -> jnp.ndarray:
    """uint8 frames -> normalised f32, layout-aware: s2d_host inputs are
    (S/2, S/2, 12) blocked, so the per-channel constants tile 4x in the
    same (di, dj, c) order as ``space_to_depth``; s2d_merged inputs merge
    adjacent column pairs into lanes on top (S/2, S/4, 24), tiling 8x."""
    x = frames.astype(jnp.float32) / 255.0
    if getattr(cfg, "s2d_merged", False):
        return normalize(x, mean=tuple(IMAGENET_MEAN) * 8,
                         std=tuple(IMAGENET_STD) * 8)
    if getattr(cfg, "s2d_host", False):
        return normalize(x, mean=tuple(IMAGENET_MEAN) * 4,
                         std=tuple(IMAGENET_STD) * 4)
    return normalize(x)


def build_serving_fn(
    model,
    cfg: ModelConfig,
    conf_threshold: float = DEFAULT_CONF_THRESHOLD,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
    q_factor: float = DEFAULT_CP_Q,
    max_detections: int = MAX_DETECTIONS,
    use_greedy_nms: bool = True,
    use_pallas_kernels: bool = False,
) -> Callable[[Any, jnp.ndarray], Detections]:
    """Returns a jittable ``(variables, frame_uint8) -> Detections``.

    ``frame_uint8`` is (H, W, 3) RGB uint8 already at ``cfg.input_size``
    (camera-resolution frames go through ``build_camera_serving_fn``).

    ``use_pallas_kernels`` swaps the XLA-fused preprocess/decode/NMS for
    the hand-written Pallas kernels (ops/pallas) — numerically equivalent
    (oracle-tested); the XLA path is the default because XLA's fusion of
    these ops is already at parity on v5e.
    """
    if use_pallas_kernels:
        from ..ops.pallas import decode_level_pallas, nms_pallas, normalize_pallas

        def serve(variables, frame: jnp.ndarray) -> Detections:
            x = normalize_pallas(frame)[None]
            outputs = model.apply(variables, x, train=False)
            parts = [
                decode_level_pallas(c[0], r[0], s, conf_threshold, q_factor)
                for (c, r), s in zip(outputs, cfg.strides)
            ]
            boxes = jnp.concatenate([p[0] for p in parts])
            scores = jnp.concatenate([p[1] for p in parts])
            classes = jnp.concatenate([p[2] for p in parts])
            valid = jnp.concatenate([p[3] for p in parts])
            masked = jnp.where(valid, scores, -1.0)
            k = min(max_detections, masked.shape[0])
            top_scores, top_idx = jax.lax.top_k(masked, k)
            dets = Detections(boxes[top_idx], scores[top_idx],
                              classes[top_idx],
                              valid[top_idx] & (top_scores > -0.5))
            keep = nms_pallas(dets.boxes, dets.scores, dets.classes,
                              dets.valid, iou_threshold)
            return dets._replace(valid=keep)

        return serve

    def serve(variables, frame: jnp.ndarray) -> Detections:
        x = _normalize_for(cfg, frame)
        x = x[None]  # batch 1
        outputs = model.apply(variables, x, train=False)
        dets = decode_outputs(
            outputs, cfg.strides, conf_threshold, q_factor, max_detections,
            exact_topk=False)
        if use_greedy_nms:
            return nms(dets, iou_threshold)
        return nms_fast(dets, iou_threshold)

    return serve


def build_batch_serving_fn(
    model,
    cfg: ModelConfig,
    conf_threshold: float = DEFAULT_CONF_THRESHOLD,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
    q_factor: float = DEFAULT_CP_Q,
    max_detections: int = MAX_DETECTIONS,
):
    """Multi-stream serving: (variables, frames (B, S, S, 3) uint8) ->
    batched Detections (every field gains a leading B axis). One forward
    feeds all cameras (~1500+ fps at B=8 on v5e); decode/NMS are vmapped
    per stream.
    """

    def serve(variables, frames: jnp.ndarray):
        x = _normalize_for(cfg, frames)
        outputs = model.apply(variables, x, train=False)

        def post(per_image_outputs):
            # exact sort-based top-k here: an approx-vs-exact A/B through
            # the committed b8 artifact measured NO difference at B=8
            # (866 fps both, same session — the vmapped compaction is not
            # the batched bottleneck), so the batch path keeps the
            # simpler exact sort; the batch-1 path keeps the measured
            # PartialReduce win (0.072 -> 0.040 ms).
            dets = decode_outputs(
                [(c[None], r[None]) for c, r in per_image_outputs],
                cfg.strides, conf_threshold, q_factor, max_detections,
                exact_topk=True)
            return nms(dets, iou_threshold)

        return jax.vmap(post)([(c, r) for c, r in outputs])

    return serve


def build_camera_serving_fn(
    model,
    cfg: ModelConfig,
    camera_height: int,
    camera_width: int,
    camera_format: str = "bgra",   # "bgra" | "rgb" | "nv12"
    conf_threshold: float = DEFAULT_CONF_THRESHOLD,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
    q_factor: float = DEFAULT_CP_Q,
    max_detections: int = MAX_DETECTIONS,
    letterbox: bool = False,
    box_space: str = "model",      # "model" | "camera"
) -> Callable[[Any, jnp.ndarray], Detections]:
    """Full camera-path pipeline: raw camera-resolution frame on-chip.

    Parity with the reference's fused preprocess kernels
    (``resize_bgra_to_rgb_normalize_kernel`` cuda_preprocess.cu:144-204,
    ``nv12_to_rgb_normalize_kernel`` :212-253): BGRA/RGB/NV12 at camera
    resolution -> colour convert -> bilinear resize (two interpolation
    MATMULS on the MXU — the TPU-native gather replacement) -> ImageNet
    normalise -> forward -> decode -> NMS, all one XLA program. Frame
    input shapes: rgb (H,W,3) u8, bgra (H,W,4) u8, nv12 (H*3/2, W) u8
    planar (Y then interleaved UV — the shm-ring layout).

    ``letterbox=False`` stretches the frame square — the literal
    cuda_preprocess.cu:144-204 behaviour. ``letterbox=True`` bakes the
    TRAINING geometry on-chip instead: aspect-preserving resize + gray
    (114) center pad, exactly what ``data.dataset.load_letterboxed``
    applies at train time — a squashed-aspect serve geometry is a silent
    train/serve skew (the same argument that fixed serve_cli in r2; see
    the measured A/B in RESULTS.md "Camera-path letterbox A/B").
    Everything is static at trace time, so the pad is two constants.

    ``box_space="camera"`` maps detected boxes back to camera pixel space
    INSIDE the program (undo pad+scale, clamp to frame bounds) — the
    consumer never needs to know which geometry the artifact bakes.
    ``box_space="model"`` returns raw model-space boxes (r2-compatible).
    """
    s = cfg.input_size
    ch, cw = camera_height, camera_width
    if letterbox:
        scale = min(s / ch, s / cw)
        new_h, new_w = round(ch * scale), round(cw * scale)
        pad_y, pad_x = (s - new_h) // 2, (s - new_w) // 2

    def serve(variables, frame: jnp.ndarray) -> Detections:
        if camera_format == "bgra":
            rgb = frame[..., 2::-1].astype(jnp.float32)  # drop alpha
        elif camera_format == "nv12":
            y = frame[:ch].reshape(ch, cw)
            uv = frame[ch:].reshape(ch // 2, cw // 2, 2)
            rgb = nv12_to_rgb(y, uv)
        else:
            rgb = frame.astype(jnp.float32)
        if letterbox:
            resized = resize_bilinear_mxu(rgb, new_h, new_w)
            canvas = jnp.full((s, s, 3), 114.0, jnp.float32)
            resized = jax.lax.dynamic_update_slice(
                canvas, resized, (pad_y, pad_x, 0))
        else:
            resized = resize_bilinear_mxu(rgb, s, s)
        x = normalize(resized / 255.0)[None]
        outputs = model.apply(variables, x, train=False)
        dets = decode_outputs(
            outputs, cfg.strides, conf_threshold, q_factor, max_detections,
            exact_topk=False)
        dets = nms(dets, iou_threshold)
        if box_space == "camera":
            b = dets.boxes
            if letterbox:
                pads = jnp.asarray([pad_x, pad_y, pad_x, pad_y], jnp.float32)
                b = (b - pads) / scale
            else:
                sx, sy = cw / s, ch / s
                b = b * jnp.asarray([sx, sy, sx, sy], jnp.float32)
            lim = jnp.asarray([cw, ch, cw, ch], jnp.float32)
            dets = dets._replace(boxes=jnp.clip(b, 0.0, lim))
        return dets

    return serve
