"""Pallas TPU kernel: fused per-level YOLO head decode.

The ``decode_yolo_head_kernel`` equivalent (reference
gpu_postprocess.cu:102-199) — per-cell sigmoid + class argmax + TLBR
decode + conformal dilation + threshold — as one VPU pass over the level.
Where the CUDA kernel appends survivors with warp-aggregated atomics, TPU
has no atomics: the kernel emits dense per-cell results and compaction
happens via the caller's masked top-k (ops/decode.py), which is
deterministic and static-shaped.

Layout: cells are rows (sublanes), classes/coords are lanes. One grid step
processes a tile of cells; outputs are (cells, 4) boxes and (cells, 4)
meta = [score, class, valid, 0].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELL_TILE = 2048


def _decode_kernel(cls_ref, reg_ref, centers_ref, boxes_ref, meta_ref, *,
                   stride: int, conf_threshold: float, q_factor: float):
    cls_logits = cls_ref[:].astype(jnp.float32)          # (T, C)
    reg = reg_ref[:].astype(jnp.float32) * stride        # (T, 4)
    centers = centers_ref[:]                             # (T, 2) px

    probs = jax.nn.sigmoid(cls_logits)
    score = jnp.max(probs, axis=1, keepdims=True)        # (T, 1)
    # argmax via first-match comparison — Mosaic cannot legalize vector
    # int<->float converts/iota in this layout, so stay in float space
    # (cell centers likewise arrive precomputed as a float input)
    n_cls = cls_logits.shape[1]
    klass = jnp.zeros_like(score)
    found = jnp.zeros_like(score, dtype=jnp.bool_)
    for c in range(n_cls):
        is_max = (probs[:, c:c + 1] >= score) & ~found
        klass = jnp.where(is_max, float(c), klass)
        found = found | is_max

    cx = centers[:, 0:1]
    cy = centers[:, 1:2]

    l, t = reg[:, 0:1], reg[:, 1:2]
    r, b = reg[:, 2:3], reg[:, 3:4]
    x1, y1 = cx - l, cy - t
    x2, y2 = cx + r, cy + b
    if q_factor > 0.0:
        dw = (x2 - x1) * q_factor
        dh = (y2 - y1) * q_factor
        x1, y1, x2, y2 = x1 - dw, y1 - dh, x2 + dw, y2 + dh

    boxes_ref[:] = jnp.concatenate([x1, y1, x2, y2], axis=1)
    valid = (score > conf_threshold).astype(jnp.float32)
    zeros = jnp.zeros_like(score)
    meta_ref[:] = jnp.concatenate([score, klass, valid, zeros], axis=1)


@functools.partial(jax.jit, static_argnames=(
    "stride", "conf_threshold", "q_factor", "interpret"))
def decode_level_pallas(
    cls_logits: jnp.ndarray,   # (H, W, C)
    reg: jnp.ndarray,          # (H, W, 4)
    stride: int,
    conf_threshold: float = 0.5,
    q_factor: float = 0.1,
    interpret: bool = False,
):
    """Returns (boxes (HW,4), scores (HW,), classes (HW,) i32, valid (HW,))
    — identical contract to ops.decode.decode_level."""
    h, w, c = cls_logits.shape
    n = h * w
    # largest power-of-two tile (multiple of 8 sublanes) dividing n
    tile = next((t for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8)
                 if n % t == 0), n)

    cls_flat = cls_logits.reshape(n, c)
    reg_flat = reg.reshape(n, 4)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    centers = jnp.stack(
        [(xs + 0.5) * stride, (ys + 0.5) * stride], axis=-1).reshape(n, 2)

    kernel = functools.partial(
        _decode_kernel, stride=stride,
        conf_threshold=conf_threshold, q_factor=q_factor)

    boxes, meta = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 4), jnp.float32),
            jax.ShapeDtypeStruct((n, 4), jnp.float32),
        ],
        interpret=interpret,
    )(cls_flat, reg_flat, centers)

    return (boxes, meta[:, 0], meta[:, 1].astype(jnp.int32),
            meta[:, 2] > 0.5)
