"""Pallas TPU kernels: class-aware greedy NMS.

The ``nms_kernel`` equivalent (reference gpu_postprocess.cu:207-231) built
the TPU way: no atomics, no O(n^2) thread scan. Two kernels:

1. ``_suppress_kernel`` (grid over column blocks): builds the (K, K)
   suppression matrix — IoU > threshold, same class, strictly-later sort
   position, both valid — one (K, B) block per grid step so VMEM stack
   stays ~10 MB under the 16 MB scoped limit.
2. ``_fixpoint_kernel``: runs the exact-greedy fixpoint
   ``keep <- valid & ~(keep @ S)`` on the MXU for a fixed iteration budget,
   after which the wrapper finishes the fixpoint to stationarity in XLA —
   so the result is exact greedy NMS for ANY suppression-chain depth (see
   ops/nms.py for the exactness argument). S (K=1024 -> 4 MB f32) lives
   fully in VMEM here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COL_BLOCK = 256
FIXPOINT_ITERS = 16  # >= max suppression-chain depth seen in practice


def _suppress_kernel(boxes_ref, cols_ref, classes_ref, valid_ref, s_ref, *,
                     iou_threshold: float, k: int):
    """One (K, B) column block of the suppression matrix.

    ``cols_ref`` carries the column block's [x1, y1, x2, y2, class, valid]
    pre-transposed to (6, B) so no sublane<->lane reshapes happen here.
    """
    b0 = pl.program_id(0) * COL_BLOCK

    boxes = boxes_ref[:]                       # (K, 4)
    classes = classes_ref[:]                   # (K, 1)
    valid = valid_ref[:]                       # (K, 1)
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    x2, y2 = boxes[:, 2:3], boxes[:, 3:4]
    area = (x2 - x1) * (y2 - y1)

    cols = cols_ref[:]                         # (8, B): rows 0..5 used
    cx1, cy1 = cols[0:1, :], cols[1:2, :]
    cx2, cy2 = cols[2:3, :], cols[3:4, :]
    ccls, cval = cols[4:5, :], cols[5:6, :]
    carea = (cx2 - cx1) * (cy2 - cy1)

    iw = jnp.maximum(jnp.minimum(x2, cx2) - jnp.maximum(x1, cx1), 0.0)
    ih = jnp.maximum(jnp.minimum(y2, cy2) - jnp.maximum(y1, cy1), 0.0)
    inter = iw * ih                            # (K, B)
    union = jnp.maximum(area + carea - inter, 1e-9)
    iou = inter / union

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (k, COL_BLOCK), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (k, COL_BLOCK), 1) + b0
    later = cols_i > rows_i
    sup = ((iou > iou_threshold) & (ccls == classes) & later
           & (cval > 0.5) & (valid > 0.5))
    s_ref[:] = sup.astype(jnp.float32)


def _fixpoint_kernel(s_ref, valid_ref, keep_ref, *, k: int):
    # all state lives as (1, K) row vectors — no sublane<->lane relayout
    # inside the loop (a (K,1)->(1,K) reshape per iteration hangs Mosaic)
    valid = valid_ref[:]                       # (1, K)
    s = s_ref[:]                               # (K, K)

    def body(_, keep):                         # keep: (1, K)
        hit = jax.lax.dot_general(
            keep, s,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.where(hit > 0.5, 0.0, valid)

    keep_ref[:] = jax.lax.fori_loop(0, FIXPOINT_ITERS, body, valid)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_pallas(
    boxes: jnp.ndarray,     # (K, 4) f32, sorted by score desc
    scores: jnp.ndarray,    # (K,)
    classes: jnp.ndarray,   # (K,) int32
    valid: jnp.ndarray,     # (K,) bool
    iou_threshold: float = 0.45,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns the keep mask (K,) bool; contract of ops.nms.nms."""
    del scores  # ordering is positional (inputs pre-sorted)
    k_in = boxes.shape[0]
    # pad to a COL_BLOCK multiple with invalid entries (tiling requirement)
    k = max(((k_in + COL_BLOCK - 1) // COL_BLOCK) * COL_BLOCK, COL_BLOCK)
    if k != k_in:
        pad = k - k_in
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
        classes = jnp.concatenate(
            [classes, jnp.zeros((pad,), classes.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])

    boxes = boxes.astype(jnp.float32)
    classes_f = classes.astype(jnp.float32).reshape(k, 1)
    valid_f = valid.astype(jnp.float32).reshape(k, 1)
    # column view (8, K): x1,y1,x2,y2,class,valid + 2 sublane-pad rows
    cols = jnp.concatenate(
        [boxes.T, classes_f.T, valid_f.T,
         jnp.zeros((2, k), jnp.float32)], axis=0)

    sup = pl.pallas_call(
        functools.partial(_suppress_kernel, iou_threshold=iou_threshold,
                          k=k),
        grid=(k // COL_BLOCK,),
        in_specs=[
            pl.BlockSpec((k, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, COL_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, COL_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, k), jnp.float32),
        interpret=interpret,
    )(boxes, cols, classes_f, valid_f)

    keep = pl.pallas_call(
        functools.partial(_fixpoint_kernel, k=k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        interpret=interpret,
    )(sup, valid_f.reshape(1, k))

    # Exactness guard: FIXPOINT_ITERS covers suppression chains up to that
    # depth; finish the fixpoint to stationarity in XLA so a deeper chain
    # cannot silently diverge from greedy NMS. When the kernel already
    # converged (the practical case) this costs exactly one extra matmul.
    valid_row = valid_f.reshape(1, k)

    def _cond(carry):
        _, changed = carry
        return changed

    def _body(carry):
        kp, _ = carry
        hit = jax.lax.dot_general(
            kp, sup, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        new = jnp.where(hit > 0.5, 0.0, valid_row)
        return new, jnp.any(new != kp)

    keep, _ = jax.lax.while_loop(_cond, _body, (keep, jnp.bool_(True)))
    return (keep[0, :] > 0.5)[:k_in]
