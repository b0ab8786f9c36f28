"""Fused decoupled detection head in one VMEM pass.

The P2 head is the single most expensive subgraph of the deployed engine
after the backbone entry: ~14% of device time on the r3 trace
(``artifacts/layer_table_s2dh.json`` — cls/reg conv1 fusions 3.1% each,
cls/reg conv2+pred fusions 3.5/4.0%), and it is ALWAYS bf16 — ``head_p2``
is on the reference's own quantisation exclusion list (DEFAULT_EXCLUDE;
reference train.py:779-781). The two branches each run

    ConvBlock(3x3, h->h) -> ConvBlock(3x3, h->h) -> 1x1 pred (+bias)

over the SAME (160,160,64) input, which XLA reads from HBM once per
branch and whose three intermediates each round-trip HBM: ~6 tensor
round-trips where speed of light is one input read + two small logit
writes. The measured fusions run at ~250 GB/s / one-third MXU peak —
dispatch/bandwidth-bound, exactly the regime the fused C3k2 kernel
already reclaims (``c3k2_kernel.py``).

This kernel reads x once into VMEM and runs all six convs in-register:
3x3s as nine shifted static slices (one MXU dot per tap, f32
accumulation, ReLU in-register), preds as plain dots with bias. Output
is ONE (H, W, C+4) float32 block — cls logits then reg distances — split
by the caller (a lane slice XLA fuses into the decode epilogue). The two
branches reuse the same padded-slice buffers, so the kernel also halves
the input reads the unfused graph pays.

Reference analogue: TensorRT fuses each head branch into 2-3 DLA kernels
at build time (``/root/reference/unina_yolo_dla/model.py:274-303`` built
through ``export_trt.py:431-455``); the TPU equivalent must be authored.

Per-platform primitive (``stage1_kernel`` pattern): Pallas on tpu, the
identical-math XLA form on cpu — one multi-platform artifact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .c3k2_kernel import (  # shared shift-dot 3x3 + row-grid helpers
    _VMEM_LIMIT,
    _conv3x3,
    _grid_blk,
    _mask_rows,
    _pad_rows,
    _row_mask,
    _unroll_leading,
    _whole_g,
)

__all__ = ["fused_head", "fused_head_p"]


def _head_math(x, wc1, bc1, wc2, bc2, wcp, bcp, wr1, br1, wr2, br2, wrp,
               brp, valid=None):
    """cls/reg branches on in-memory arrays — shared by the Pallas kernel
    body and the XLA form. 3x3 weights (3,3,h,h); preds (h, co) + (1,co).
    Returns (H, W, Ccls+4) float32: cls logits then reg distances.

    ``valid`` (row-gridded form only) marks the window rows that are real
    image rows. Conv1 evaluated at the window's out-of-image halo rows is
    NONZERO (ReLU of bias + the edge-row taps), but the gridless form's
    same-pad semantics say conv2 must see ZERO there — so conv1's output
    is re-masked before conv2 (both branches), exactly like the c3k2
    kernel's ``_post_win``. No mask is needed after conv2: the 1x1 preds
    do not mix rows, and the contaminated halo rows are sliced away.
    """
    cls = _conv3x3(x, wc1, bc1)
    if valid is not None:
        cls = _mask_rows(cls, valid)
    cls = _conv3x3(cls, wc2, bc2)
    cls = lax.dot_general(cls, wcp, (((2,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    cls = cls + bcp.reshape(1, 1, -1).astype(jnp.float32)
    reg = _conv3x3(x, wr1, br1)
    if valid is not None:
        reg = _mask_rows(reg, valid)
    reg = _conv3x3(reg, wr2, br2)
    reg = lax.dot_general(reg, wrp, (((2,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    reg = reg + brp.reshape(1, 1, -1).astype(jnp.float32)
    return jnp.concatenate([cls, reg], axis=-1)


def _kernel(x_ref, *refs):
    *w_refs, o_ref = refs
    o_ref[:] = _head_math(x_ref[:], *(r[:] for r in w_refs))


def _kernel_grid(x_ref, *refs, blk, h_img):
    """Row-gridded form (see c3k2_kernel for why): the six convs' f32
    accumulators at 160^2 (~50 MB) blow the 16 MB scoped-VMEM stack, so
    each grid step computes blk output rows from a halo-4 window of the
    2-row-zero-padded resident input. The window's zero rows ARE the
    conv's same-pad zeros at image edges for CONV1's input taps — but
    conv1's OUTPUT at those fictitious rows is nonzero, so it is
    re-masked to zero before conv2 via ``valid`` (the r3 advisor found
    output rows 0/H-1 silently diverging from the gridless form without
    it). Interior contamination from the window-edge padding never
    reaches the kept center rows (two chained 3x3s consume exactly the
    2-row halo). pl.program_id is safe here: the Pallas forms are
    applied by static unroll, never vmap (which would prepend the batch
    axis to the grid and re-bind it).
    """
    *w_refs, o_ref = refs
    i = pl.program_id(0)
    xw = x_ref[pl.ds(i * blk, blk + 4)]
    valid = _row_mask(i * blk - 2, blk + 4, h_img)
    out = _head_math(xw, *(r[:] for r in w_refs), valid=valid)
    o_ref[:] = out[2:blk + 2]


def _whole(a):
    return pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


def _pallas_head(x, *ws, interpret=False):
    h, w, _ = x.shape
    co = ws[4].shape[-1] + ws[10].shape[-1]  # wcp cols + wrp cols
    blk = _grid_blk(h)
    if blk is None:
        return pl.pallas_call(
            _kernel,
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
            out_shape=jax.ShapeDtypeStruct((h, w, co), jnp.float32),
            in_specs=[_whole(x)] + [_whole(a) for a in ws],
            out_specs=pl.BlockSpec((h, w, co), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x, *ws)
    x_pad = _pad_rows(x, 2)
    return pl.pallas_call(
        functools.partial(_kernel_grid, blk=blk, h_img=h),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        grid=(h // blk,),
        out_shape=jax.ShapeDtypeStruct((h, w, co), jnp.float32),
        in_specs=[_whole_g(x_pad)] + [_whole_g(a) for a in ws],
        out_specs=pl.BlockSpec((blk, w, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x_pad, *ws)


def _xla_head(x, *ws):
    return _head_math(x, *ws)


import jax.extend as jex  # noqa: E402
from jax import core as jcore  # noqa: E402
from jax.interpreters import batching as jbatching  # noqa: E402
from jax.interpreters import mlir as jmlir  # noqa: E402

fused_head_p = jex.core.Primitive("unina_fused_head")


@fused_head_p.def_abstract_eval
def _abstract(x, *ws):
    *lead, h, w, _c = x.shape
    co = ws[4].shape[-1] + ws[10].shape[-1]
    return jcore.ShapedArray((*lead, h, w, co), jnp.float32)


def _apply_leading(fn):
    def run(x, *ws, **kw):
        f = functools.partial(fn, **kw)
        for _ in range(x.ndim - 3):
            f = jax.vmap(f, in_axes=(0,) + (None,) * 12)
        return f(x, *ws)

    return run


def _impl_xla(x, *ws):
    return _apply_leading(_xla_head)(x, *ws)


def _impl_pallas(x, *ws):
    return _unroll_leading(_pallas_head)(x, *ws)


def _batch_rule(args, dims):
    x, *ws = args
    xd, *wds = dims
    assert all(d is jbatching.not_mapped for d in wds), \
        "fused_head: weights cannot be batched"
    x = jnp.moveaxis(x, xd, 0)
    return fused_head_p.bind(x, *ws), 0


fused_head_p.def_impl(_impl_xla)
jbatching.primitive_batchers[fused_head_p] = _batch_rule
jmlir.register_lowering(
    fused_head_p, jmlir.lower_fun(_impl_xla, multiple_results=False))
jmlir.register_lowering(
    fused_head_p, jmlir.lower_fun(_impl_pallas, multiple_results=False),
    platform="tpu")


def fused_head(x, cls_convs, cls_pred, reg_convs, reg_pred, *,
               use_pallas=None, interpret=False):
    """One-VMEM-pass decoupled head over flax-layout weights.

    Args:
        x: (..., H, W, h) feature map (bf16 deploy path).
        cls_convs/reg_convs: [(k, b), (k, b)] — the two 3x3 ConvBlocks per
            branch, kernels (3, 3, h, h).
        cls_pred/reg_pred: (kernel (1, 1, h, co), bias) of the 1x1 preds.

    Returns ``(cls, reg)`` float32 — (..., H, W, Ccls) logits and
    (..., H, W, 4) distances — split from the kernel's single fused
    output block (a lane slice XLA fuses into the decode epilogue).
    """
    dt = x.dtype
    (kc1, bc1), (kc2, bc2) = cls_convs
    (kr1, br1), (kr2, br2) = reg_convs
    kcp, bcp = cls_pred
    krp, brp = reg_pred
    cc = kcp.shape[-1]
    ws = (kc1.astype(dt), bc1.reshape(1, -1),
          kc2.astype(dt), bc2.reshape(1, -1),
          kcp.reshape(kcp.shape[-2], cc).astype(dt), bcp.reshape(1, -1),
          kr1.astype(dt), br1.reshape(1, -1),
          kr2.astype(dt), br2.reshape(1, -1),
          krp.reshape(krp.shape[-2], krp.shape[-1]).astype(dt),
          brp.reshape(1, -1))
    if use_pallas is None:
        out = fused_head_p.bind(x, *ws)
    elif use_pallas:
        out = _unroll_leading(
            functools.partial(_pallas_head, interpret=interpret))(x, *ws)
    else:
        out = _apply_leading(_xla_head)(x, *ws)
    return out[..., :cc], out[..., cc:]
