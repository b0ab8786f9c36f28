"""Image preprocessing — pure-jnp reference oracle.

Numerical parity with the reference's fused CUDA kernels
(``/root/reference/.../src/cuda_preprocess.cu``):

- bilinear resize with half-pixel centers, clamped:
  ``src = (dst + 0.5) * scale - 0.5`` (cuda_preprocess.cu:158-168)
- BGRA/BGR -> RGB channel reorder
- ImageNet normalisation ``(px/255 - mean)/std`` (cuda_preprocess.cu:68-85)
- NV12 (YUV420sp) -> RGB via BT.601 (cuda_preprocess.cu:212-253)

TPU-first differences: output is NHWC float (channels-last feeds TPU convs
directly; the CUDA version emits CHW for TensorRT), and the whole thing is a
jittable function that fuses into the inference graph — the frame never
round-trips through host memory. A Pallas fused kernel lives in
``ops/pallas/preprocess_kernel.py``; this module is its oracle.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..models.config import IMAGENET_MEAN, IMAGENET_STD


def normalize(rgb01: jnp.ndarray,
              mean: Sequence[float] = IMAGENET_MEAN,
              std: Sequence[float] = IMAGENET_STD) -> jnp.ndarray:
    """(..., 3) RGB in [0,1] -> ImageNet-normalised float32."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (rgb01.astype(jnp.float32) - mean) / std


def ensure_normalized(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB frames -> ImageNet-normalised f32; float passes through.

    Training/eval batches cross host->device as uint8 — 4x fewer bytes
    than normalised float32, which is the dominant per-step transfer at
    640x640 (78 MB -> 20 MB at batch 16) — and are normalised on device,
    where the op fuses into the first conv. Float inputs are assumed
    already normalised (backward-compatible with host-side
    ``data.dataset.normalize_images``). The dtype test is static under
    ``jit``.
    """
    if images.dtype == jnp.uint8:
        return normalize(images.astype(jnp.float32) / 255.0)
    return images


def _bilinear_coords(dst: int, src: int):
    """Half-pixel source coordinates + weights for one axis."""
    scale = src / dst
    coords = (jnp.arange(dst, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, src - 1.0)
    i0 = jnp.floor(coords).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, src - 1)
    frac = coords - i0.astype(jnp.float32)
    return i0, i1, frac


def resize_bilinear(img: jnp.ndarray, dst_h: int, dst_w: int) -> jnp.ndarray:
    """(H, W, C) -> (dst_h, dst_w, C) bilinear, CUDA-kernel coordinate math."""
    src_h, src_w = img.shape[0], img.shape[1]
    img = img.astype(jnp.float32)
    y0, y1, fy = _bilinear_coords(dst_h, src_h)
    x0, x1, fx = _bilinear_coords(dst_w, src_w)

    # Separable gather: rows then columns.
    top = img[y0]                        # (dst_h, W, C)
    bot = img[y1]
    rows = top + (bot - top) * fy[:, None, None]
    left = rows[:, x0]                   # (dst_h, dst_w, C)
    right = rows[:, x1]
    return left + (right - left) * fx[None, :, None]


def _interp_matrix(dst: int, src: int) -> jnp.ndarray:
    """(dst, src) bilinear interpolation matrix (two nonzeros per row),
    same half-pixel coordinate math as ``_bilinear_coords``."""
    import numpy as np

    scale = src / dst
    coords = (np.arange(dst) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0.0, src - 1.0)
    i0 = np.floor(coords).astype(np.int64)
    i1 = np.minimum(i0 + 1, src - 1)
    frac = (coords - i0).astype(np.float32)
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), i0] += 1.0 - frac
    m[np.arange(dst), i1] += frac
    return jnp.asarray(m)


def resize_bilinear_mxu(img: jnp.ndarray, dst_h: int,
                        dst_w: int) -> jnp.ndarray:
    """Bilinear resize as two interpolation MATMULS — the TPU-native
    formulation of the CUDA resize kernel (cuda_preprocess.cu:144-204).

    ``out = Ry @ img @ Rx^T`` where Ry (dst_h, H) / Rx (dst_w, W) encode
    the separable bilinear weights. Gathers (the GPU formulation) are slow
    on TPU; two dense matmuls ride the MXU at ~full rate. Bit-compatible
    with ``resize_bilinear`` up to float accumulation order.
    """
    src_h, src_w = img.shape[0], img.shape[1]
    ry = _interp_matrix(dst_h, src_h)                      # (dh, H)
    rx = _interp_matrix(dst_w, src_w)                      # (dw, W)
    x = img.astype(jnp.float32)
    # HIGHEST precision: the MXU's default bf16 passes would cost ~0.5/255
    # absolute error on pixel values; full-f32 keeps parity with the
    # gather-based oracle at negligible cost for this matrix size
    rows = jnp.einsum("dh,hwc->dwc", ry, x,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ew,dwc->dec", rx, rows,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def preprocess_rgb(
    img_uint8: jnp.ndarray,
    out_size: int = 640,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jnp.ndarray:
    """(H, W, 3) RGB uint8 -> (out, out, 3) normalised float32 (NHWC w/o batch)."""
    resized = resize_bilinear(img_uint8, out_size, out_size)
    return normalize(resized / 255.0, mean, std)


def preprocess_bgra(
    img_uint8: jnp.ndarray,
    out_size: int = 640,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jnp.ndarray:
    """(H, W, 4) BGRA uint8 -> (out, out, 3) normalised float32.

    Channel reorder happens BEFORE the resize, matching the CUDA kernel's
    per-sample BGR->RGB reorder (interpolation is linear so order commutes).
    """
    rgb = img_uint8[..., 2::-1]  # B,G,R,A -> R,G,B
    return preprocess_rgb(rgb, out_size, mean, std)


def nv12_to_rgb(y_plane: jnp.ndarray, uv_plane: jnp.ndarray) -> jnp.ndarray:
    """NV12 -> RGB uint8-range float, BT.601 (cuda_preprocess.cu:212-253).

    ``y_plane``: (H, W) uint8; ``uv_plane``: (H//2, W//2, 2) interleaved U,V.
    """
    y = y_plane.astype(jnp.float32)
    uv = uv_plane.astype(jnp.float32)
    # Upsample chroma 2x nearest
    u = jnp.repeat(jnp.repeat(uv[..., 0], 2, axis=0), 2, axis=1) - 128.0
    v = jnp.repeat(jnp.repeat(uv[..., 1], 2, axis=0), 2, axis=1) - 128.0
    u = u[: y.shape[0], : y.shape[1]]
    v = v[: y.shape[0], : y.shape[1]]
    c = y - 16.0
    r = 1.164 * c + 1.596 * v
    g = 1.164 * c - 0.392 * u - 0.813 * v
    b = 1.164 * c + 2.017 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/b, W/b, b*b*C), offsets flattened
    row-major ((di, dj, c) -> di*b*C + dj*C + c).

    The TPU stem transform: a 3-channel 640x640 conv input packs C=3 into
    8/128-lane tiles so badly that XLA spends ~30% of frame time in layout
    copies around the stem (measured: layer_table on BENCH_r02's trace —
    copy.476/477/478, 28-248 GB/s). Blocking 2x2 turns the stride-2 3x3
    stem into a stride-1 2x2 conv over 12 channels at quarter the spatial
    positions (the public MLPerf-ResNet space-to-depth recipe); see
    quant/deploy.fold_stem_space_to_depth for the weight-side transform.
    """
    # strided slices + channel concat, NOT reshape/6D-transpose: the
    # transpose formulation lowers to a scalarised loop fusion on TPU
    # (measured 0.69 ms/frame at 10 GB/s — worse than the copies it was
    # meant to remove); slice+concat lowers to clean tiled copies
    parts = [x[..., di::block, dj::block, :]
             for di in range(block) for dj in range(block)]
    return jnp.concatenate(parts, axis=-1)


def space_to_depth_rt(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """Reshape/transpose space_to_depth — for LARGE-channel on-device use.

    Two formulations coexist deliberately: for the u8 C=3 frame the
    6D-transpose lowers to a scalarised loop (0.69 ms) and slice+concat
    to slow copies (2.3 ms) — there the shuffle belongs on the HOST
    (``space_to_depth_np``). For bf16 C>=32 activations the transpose
    moves contiguous 64+ B channel vectors and lowers cleanly (stage1:
    0.002 ms inside the 0.074 ms blocked downsample vs 0.85 ms for
    slice+concat — `tools/stage1_probe.py`). Same (di, dj, c) order.
    """
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // block, block, w // block, block, c)
    nd = len(lead)
    perm = (*range(nd), nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return jnp.transpose(x, perm).reshape(
        *lead, h // block, w // block, block * block * c)


def space_to_depth_np(x, block: int = 2):
    """Host-side (numpy) space_to_depth, same (di, dj, c) channel order.

    The ``s2d_host`` input path: the shuffle is a single numpy
    transpose-copy (~1.2 MB at 640²) on the host — on-device every
    formulation of it costs more than the layout copies it removes
    (RESULTS.md round 3), on the host it is one memory pass (and the
    native host fuses it into the staging conversion loop for free).
    """
    import numpy as np

    *lead, h, w, c = x.shape
    y = x.reshape(*lead, h // block, block, w // block, block, c)
    nd = len(lead)
    perm = (*range(nd), nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return np.ascontiguousarray(np.transpose(y, perm)).reshape(
        *lead, h // block, w // block, block * block * c)


def letterbox(
    img: jnp.ndarray,
    out_size: int = 640,
    pad_value: float = 114.0,
) -> tuple[jnp.ndarray, float, tuple[int, int]]:
    """Aspect-preserving resize + center pad (training-time letterbox,
    parity with the Ultralytics LetterBox used by mine_data.py:48-86).

    Returns (letterboxed (out,out,C) float32, scale, (pad_x, pad_y)).
    Static output shape; scale/pads are Python floats for label transforms
    (host-side, trace-free).
    """
    src_h, src_w = int(img.shape[0]), int(img.shape[1])
    scale = min(out_size / src_h, out_size / src_w)
    new_h, new_w = round(src_h * scale), round(src_w * scale)
    resized = resize_bilinear(img, new_h, new_w)
    pad_y = (out_size - new_h) // 2
    pad_x = (out_size - new_w) // 2
    canvas = jnp.full((out_size, out_size, img.shape[-1]), pad_value,
                      jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (pad_y, pad_x, 0))
    return canvas, scale, (pad_x, pad_y)
