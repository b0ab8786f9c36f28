"""Pallas TPU kernel: fused uint8 -> normalised-float preprocessing.

The ``bgra_to_rgb_normalize_kernel`` equivalent (reference
cuda_preprocess.cu:99-128): channel reorder + /255 + ImageNet mean/std in
one VPU pass. Layout: pixels are rows (sublanes), channels are lanes —
(H*W, C) blocks — because lane-strided channel deinterleave is free in
this layout while HWC-flat would need gathers.

Arbitrary-ratio bilinear RESIZE is deliberately NOT a hand-written kernel:
on TPU the right decomposition is two interpolation matmuls on the MXU
(``ops.preprocess.resize_bilinear_mxu``), which XLA already schedules
optimally — a gather-based Pallas port of the CUDA kernel would be slower.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.config import IMAGENET_MEAN, IMAGENET_STD

# pixels-per-block: blocks are (tile, C<=4) but VMEM tiles pad the lane
# dim to 128, so each buffered block costs tile*128*4 B — keep it ~1 MB
PIXEL_TILE = 2048


def _normalize_kernel(px_ref, out_ref, *, mean, std, swap_rb: bool,
                      in_ch: int):
    px = px_ref[:]                                 # (T, in_ch) f32
    if swap_rb:
        r = px[:, 2:3]
        g = px[:, 1:2]
        b = px[:, 0:1]
        rgb = jnp.concatenate([r, g, b], axis=1)
    else:
        rgb = px[:, 0:3]
    # mean/std folded into a single scale+shift as python-float constants
    # (captured jnp arrays are not allowed in pallas kernels)
    scale = [1.0 / (255.0 * s) for s in std]
    shift = [-m / s for m, s in zip(mean, std)]
    out = [rgb[:, i:i + 1] * scale[i] + shift[i] for i in range(3)]
    out_ref[:] = jnp.concatenate(out, axis=1)


@functools.partial(jax.jit, static_argnames=("swap_rb", "interpret"))
def normalize_pallas(
    img_uint8: jnp.ndarray,      # (H, W, 3|4) uint8
    swap_rb: bool = False,       # True for BGRA/BGR input
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W, C) uint8 -> (H, W, 3) ImageNet-normalised float32."""
    h, w, c = img_uint8.shape
    n = h * w
    tile = min(PIXEL_TILE, n)
    assert n % tile == 0, (n, tile)

    # uint8 -> f32 widening happens in XLA (Mosaic has no u8->f32 cast);
    # XLA fuses it into the kernel's input stream
    flat = img_uint8.reshape(n, c).astype(jnp.float32)
    kernel = functools.partial(
        _normalize_kernel, mean=IMAGENET_MEAN, std=IMAGENET_STD,
        swap_rb=swap_rb, in_ch=c)
    out = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3), jnp.float32),
        interpret=interpret,
    )(flat)
    return out.reshape(h, w, 3)
