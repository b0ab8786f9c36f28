"""Fused C3k2 (CSP split-process-concat block) in one VMEM pass.

The deployed engine's two 160x160 C3k2 blocks — ``backbone/stage1_block``
and ``neck/fpn_c3k2_2`` — run in bf16 even in the int8 engine
(``quant.fake_quant.PERF_EXCLUDE``: at 160^2 their cost is data movement,
not arithmetic, so int8's requant work only adds traffic). On the r3
trace (``artifacts/layer_table_s2dh.json``) they burn 8.2% + 6.4% of
device time at ~640 GB/s with arithmetic intensity ~21: every conv in the
block round-trips its (160,160,32..64) activations through HBM because XLA
cannot fuse ACROSS convolutions, only into their epilogues.

Speed of light for the whole block is ONE read of the input + ONE write of
the output (~7 MB at stage1_block vs ~30 MB unfused) plus a small dot
stack. At these shapes the entire block fits VMEM (worst instance:
fpn_c3k2_2's (160,160,128) bf16 input = 6.5 MB, v5e VMEM = 128 MB), so the
kernel is gridless (grid=(1,)): read x once, run

    cv1(1x1) -> n x [bottleneck: cv1(1x1) -> cv2(3x3) -> +residual]
    cv2(1x1) on x
    cv3(1x1) on the concat         (computed as a split dot — no concat
                                    tensor is ever materialised)

entirely in VMEM/registers, write the output once. 3x3 convs are nine
shifted static slices of a zero-concat-padded buffer, each one MXU dot
(the same shift-dot idea as ``stage1_kernel``); 1x1 convs are plain dots.
All accumulation f32, bias+ReLU in-register, bf16 between stages (matching
the standard path's inter-conv dtype).

This is the TPU analogue of TensorRT's builder-time cross-layer fusion on
the DLA (the reference's engine builder fuses conv+BN+ReLU chains and
keeps CSP block intermediates in CBUF; ``/root/reference/unina_yolo_dla/
export_trt.py:431-455``, ``model.py:76-110``) — on TPU the fusion must be
authored, XLA will not cross a conv boundary.

Follows the ``stage1_kernel`` per-platform-primitive pattern: one
multi-platform artifact carries the Pallas form on tpu and the
identical-math XLA form elsewhere (``lax.platform_dependent`` cannot carry
a Pallas branch through a (cpu,tpu) export — see stage1_kernel.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_c3k2", "fused_c3k2_p"]


def _dot1x1(t, w, b):
    """ReLU(t @ w + b): the 1x1 conv. t (H, W, C), w (C, O), b (O,)."""
    z = lax.dot_general(t, w, (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    b = b.reshape(1, 1, -1).astype(jnp.float32)
    return jnp.maximum(z + b, 0.0).astype(t.dtype)


def _pad_hw(t):
    """Zero-pad one row/col of halo on each side via concat (jnp.pad's
    lax.pad does not lower in Mosaic; concatenate does)."""
    h, w, c = t.shape
    zr = jnp.zeros((1, w, c), t.dtype)
    t = jnp.concatenate([zr, t, zr], axis=0)
    zc = jnp.zeros((h + 2, 1, c), t.dtype)
    return jnp.concatenate([zc, t, zc], axis=1)


def _conv3x3(t, w, b):
    """ReLU(3x3 same-pad conv): nine shifted static slices, one dot each.

    t (H, W, C), w (3, 3, C, O), b (O,). f32 accumulation across taps.
    """
    h, wd, _c = t.shape
    tp = _pad_hw(t)
    acc = None
    for kh in range(3):
        for kw in range(3):
            z = lax.dot_general(tp[kh:kh + h, kw:kw + wd, :], w[kh, kw],
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = z if acc is None else acc + z
    b = b.reshape(1, 1, -1).astype(jnp.float32)
    return jnp.maximum(acc + b, 0.0).astype(t.dtype)


def _up2(t):
    """Nearest 2x upsample (each row/col doubled) — the in-register form
    of ``models.blocks.upsample_nearest_2x``."""
    h, w, c = t.shape
    t = jnp.broadcast_to(t[:, None, :, None, :], (h, 2, w, 2, c))
    return t.reshape(h * 2, w * 2, c)


def _dot1x1_pair(xa, xb, w, b, up_a):
    """ReLU(concat([up?(xa), xb]) @ w + b) WITHOUT materialising the
    upsample or the concat: split dot by input rows, and — because a 1x1
    conv commutes with nearest upsampling (every upsampled pixel copies a
    source pixel's channel vector) — the xa dot runs at xa's resolution
    (4x fewer FLOPs) and only its f32 RESULT is upsampled, in-register.
    """
    ca = xa.shape[-1]
    za = lax.dot_general(xa, w[:ca], (((2,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    if up_a:
        za = _up2(za)
    zb = lax.dot_general(xb, w[ca:], (((2,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    b = b.reshape(1, 1, -1).astype(jnp.float32)
    return jnp.maximum(za + zb + b, 0.0).astype(xb.dtype)


def _c3k2_post(p1, p2, wb1, bb1, wb2, bb2, w3, b3, *, shortcut):
    """Bottleneck chain + the cv3 split dot (shared by both entry forms).

    cv3 on concat([p1, p2]) == p1 @ w3[:h] + p2 @ w3[h:] — exact, and the
    2h-wide concat tensor never exists.
    """
    n = wb1.shape[0]
    for i in range(n):
        t = _dot1x1(p1, wb1[i], bb1[i])
        t = _conv3x3(t, wb2[i], bb2[i])
        p1 = p1 + t if shortcut else t
    h = p1.shape[-1]
    z = (lax.dot_general(p1, w3[:h], (((2,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
         + lax.dot_general(p2, w3[h:], (((2,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32))
    b3 = b3.reshape(1, 1, -1).astype(jnp.float32)
    return jnp.maximum(z + b3, 0.0).astype(p1.dtype)


def _c3k2_math(x, w1, b1, wb1, bb1, wb2, bb2, w2, b2, w3, b3, *, shortcut):
    """The whole block on in-memory arrays — shared verbatim by the Pallas
    kernel body and the XLA (cpu/test) form, so the two lowerings are the
    same math by construction.

    Shapes: x (H, W, Cin); w1/w2 (Cin, h); wb1 (n, h, h); wb2 (n, 3, 3,
    h, h); w3 (2h, F); biases to match. All weights pre-reshaped from the
    flax HWIO params (a free transpose, constant-folded in weights-baked
    artifacts).
    """
    p1 = _dot1x1(x, w1, b1)
    p2 = _dot1x1(x, w2, b2)
    return _c3k2_post(p1, p2, wb1, bb1, wb2, bb2, w3, b3,
                      shortcut=shortcut)


def _c3k2_cat_math(xa, xb, w1, b1, wb1, bb1, wb2, bb2, w2, b2, w3, b3, *,
                   shortcut, up_a):
    """C3k2 over concat([up?(xa), xb]) with the upsample AND the concat
    folded away (the FPN fusion layers: ``C3k2(concat([upsample(lat),
    skip]))``). xa (Hs, Ws, Ca) at the coarse level when up_a, xb (H, W,
    Cb); w1/w2 rows are Ca + Cb (xa's first, matching concat order)."""
    p1 = _dot1x1_pair(xa, xb, w1, b1, up_a)
    p2 = _dot1x1_pair(xa, xb, w2, b2, up_a)
    return _c3k2_post(p1, p2, wb1, bb1, wb2, bb2, w3, b3,
                      shortcut=shortcut)


def _kernel(x_ref, w1, b1, wb1, bb1, wb2, bb2, w2, b2, w3, b3, o_ref, *,
            shortcut):
    o_ref[:] = _c3k2_math(x_ref[:], w1[:], b1[:], wb1[:], bb1[:], wb2[:],
                          bb2[:], w2[:], b2[:], w3[:], b3[:],
                          shortcut=shortcut)


# --------------------------------------------------------------------- #
# Row-gridded forms. The gridless kernel's f32 accumulators at 160^2
# (cv3's two split dots alone are 2 x 6.5 MB at fpn_c3k2_2) blow the
# 16 MB scoped-VMEM stack limit Mosaic enforces on real hardware — the
# r3 on-TPU probe OOM'd exactly there. At H >= 80 the kernel therefore
# grids over output row-blocks: the (zero-row-padded) input stays VMEM-
# resident across steps, each step slices a halo window (dynamic start
# from an SMEM index operand — NOT pl.program_id, which vmap re-binds to
# the batch axis: the batching rule prepends the batch to the grid) and
# computes its rows exactly (bit-identical to the gridless form: out-of-
# image rows are re-masked to zero after every stage so the 3x3s see the
# same zero padding; the halo gives interior taps their true neighbors).
# --------------------------------------------------------------------- #
def _grid_blk(h):
    """Largest row-block <= 32 that tiles H, or None to stay gridless.

    At H >= 80 the gridless form blows Mosaic's 16 MB scoped-VMEM stack
    on real hardware, so a None fallback there is a latent OOM, not a
    fast path — warn loudly (the deploy sizes 160/80/40 all tile; only
    odd/prime-ish custom sizes hit this)."""
    if h < 80:
        return None
    for blk in range(32, 7, -1):
        if h % blk == 0:
            return blk
    import warnings
    warnings.warn(
        f"fused kernels: H={h} >= 80 has no row-block divisor in [8, 32];"
        " falling back to the gridless Pallas form, which may exceed the"
        " 16 MB scoped-VMEM limit on real TPUs. Use an H divisible by a"
        " block in [8, 32] (the deploy sizes 160/80/40 all are).",
        stacklevel=3)
    return None


# Mosaic enforces a 16 MB scoped-VMEM stack by default; the gridded
# fpn_c3k2_2 pair-kernel's live temporaries measure 17.51 MB at blk=32
# on real v5e (the BENCH_r03 `_fc: null` root cause — compile-time OOM,
# surfaced by tools/fc_probe.py). v5e VMEM is 128 MB, so raising the
# per-kernel limit to 32 MB is free headroom, not a trade.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _unroll_leading(fn, n_batched=1):
    """Apply ``fn`` (a pallas_call wrapper whose first ``n_batched``
    operands carry leading batch dims) over those dims by STATIC UNROLL,
    never vmap: the pallas batching rule prepends the batch axis to the
    grid, which re-binds pl.program_id(0) — the row-block index inside
    the gridded kernels — to the batch index. The TPU grid is sequential
    anyway, so unrolled per-sample calls cost the same device time. (The
    XLA forms keep vmap — no grid to corrupt.)"""
    def run(*args, **kw):
        xs, ws = args[:n_batched], args[n_batched:]
        lead = xs[0].shape[:-3]
        if not lead:
            return fn(*xs, *ws, **kw)
        flat = [a.reshape(-1, *a.shape[-3:]) for a in xs]
        outs = [fn(*(f[i] for f in flat), *ws, **kw)
                for i in range(flat[0].shape[0])]
        return jnp.stack(outs).reshape(*lead, *outs[0].shape)

    return run


def _whole_g(a):
    return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


def _pad_rows(t, n):
    z = jnp.zeros((n, *t.shape[1:]), t.dtype)
    return jnp.concatenate([z, t, z], axis=0)


def _mask_rows(t, valid):
    return jnp.where(valid, t, jnp.zeros_like(t))


def _row_mask(row0, rows, h_img):
    idx = row0 + lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    return (idx >= 0) & (idx < h_img)


def _post_win(p1, p2c, wb1, bb1, wb2, bb2, w3, b3, *, shortcut, halo,
              valid):
    """Bottleneck chain + cv3 on a halo window: p1 is (blk + 2*halo, W,
    h) with out-of-image rows zeroed, p2c the (blk, W, h) center rows.
    Re-masks after every stage so window zero padding == image zero
    padding; the center blk rows come out bit-identical to the gridless
    form (halo >= n shifted-slice convs)."""
    n = wb1.shape[0]
    for i in range(n):
        t = _mask_rows(_dot1x1(p1, wb1[i], bb1[i]), valid)
        t = _conv3x3(t, wb2[i], bb2[i])
        p1 = _mask_rows(p1 + t if shortcut else t, valid)
    blk = p2c.shape[0]
    h = p1.shape[-1]
    p1c = p1[halo:halo + blk]
    z = (lax.dot_general(p1c, w3[:h], (((2,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
         + lax.dot_general(p2c, w3[h:], (((2,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32))
    b3 = b3.reshape(1, 1, -1).astype(jnp.float32)
    return jnp.maximum(z + b3, 0.0).astype(p1.dtype)


def _kernel_grid(x_ref, w1, b1, wb1, bb1, wb2, bb2, w2, b2, w3,
                 b3, o_ref, *, shortcut, blk, halo, h_img):
    i = pl.program_id(0)  # safe: the Pallas forms are never vmapped
    xw = x_ref[pl.ds(i * blk, blk + 2 * halo)]   # from the row-padded x
    valid = _row_mask(i * blk - halo, blk + 2 * halo, h_img)
    p1 = _mask_rows(_dot1x1(xw, w1[:], b1[:]), valid)
    p2 = _dot1x1(xw[halo:halo + blk], w2[:], b2[:])
    o_ref[:] = _post_win(p1, p2, wb1[:], bb1[:], wb2[:], bb2[:], w3[:],
                         b3[:], shortcut=shortcut, halo=halo, valid=valid)


def _kernel_cat_grid(xa_ref, xb_ref, w1, b1, wb1, bb1, wb2, bb2,
                     w2, b2, w3, b3, o_ref, *, shortcut, up_a, blk, halo,
                     h_img):
    i = pl.program_id(0)  # safe: the Pallas forms are never vmapped
    if up_a:  # halo is even; xa is row-padded by halo//2 at coarse res
        xaw = xa_ref[pl.ds(i * (blk // 2), blk // 2 + halo)]
        xac = xaw[halo // 2:halo // 2 + blk // 2]
    else:
        xaw = xa_ref[pl.ds(i * blk, blk + 2 * halo)]
        xac = xaw[halo:halo + blk]
    xbw = xb_ref[pl.ds(i * blk, blk + 2 * halo)]
    valid = _row_mask(i * blk - halo, blk + 2 * halo, h_img)
    p1 = _mask_rows(
        _dot1x1_pair(xaw, xbw, w1[:], b1[:], up_a), valid)
    p2 = _dot1x1_pair(xac, xbw[halo:halo + blk], w2[:], b2[:], up_a)
    o_ref[:] = _post_win(p1, p2, wb1[:], bb1[:], wb2[:], bb2[:], w3[:],
                         b3[:], shortcut=shortcut, halo=halo, valid=valid)


def _kernel_cat(xa_ref, xb_ref, w1, b1, wb1, bb1, wb2, bb2, w2, b2, w3, b3,
                o_ref, *, shortcut, up_a):
    o_ref[:] = _c3k2_cat_math(
        xa_ref[:], xb_ref[:], w1[:], b1[:], wb1[:], bb1[:], wb2[:], bb2[:],
        w2[:], b2[:], w3[:], b3[:], shortcut=shortcut, up_a=up_a)


def _whole(a):
    return pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


def _pallas_c3k2(x, *ws, shortcut, interpret=False):
    h, w, _ = x.shape
    f = ws[-1].shape[-1]
    blk = _grid_blk(h)
    if blk is None:
        kern = functools.partial(_kernel, shortcut=shortcut)
        return pl.pallas_call(
            kern,
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
            out_shape=jax.ShapeDtypeStruct((h, w, f), x.dtype),
            in_specs=[_whole(x)] + [_whole(a) for a in ws],
            out_specs=pl.BlockSpec((h, w, f), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x, *ws)
    n = ws[2].shape[0]  # wb1 (n, h, h): one 3x3 per bottleneck
    halo = n
    x_pad = _pad_rows(x, halo)
    kern = functools.partial(_kernel_grid, shortcut=shortcut, blk=blk,
                             halo=halo, h_img=h)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        grid=(h // blk,),
        out_shape=jax.ShapeDtypeStruct((h, w, f), x.dtype),
        in_specs=[_whole_g(x_pad)] + [_whole_g(a) for a in ws],
        out_specs=pl.BlockSpec((blk, w, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x_pad, *ws)


def _pallas_c3k2_cat(xa, xb, *ws, shortcut, up_a, interpret=False):
    h, w, _ = xb.shape
    f = ws[-1].shape[-1]
    blk = _grid_blk(h)
    if blk is None or (up_a and blk % 2):
        kern = functools.partial(_kernel_cat, shortcut=shortcut, up_a=up_a)
        return pl.pallas_call(
            kern,
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
            out_shape=jax.ShapeDtypeStruct((h, w, f), xb.dtype),
            in_specs=[_whole(xa), _whole(xb)] + [_whole(a) for a in ws],
            out_specs=pl.BlockSpec((h, w, f), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(xa, xb, *ws)
    n = ws[2].shape[0]
    halo = n + (n % 2) if up_a else n  # even halo keeps up2 row-aligned
    xa_pad = _pad_rows(xa, halo // 2 if up_a else halo)
    xb_pad = _pad_rows(xb, halo)
    kern = functools.partial(_kernel_cat_grid, shortcut=shortcut,
                             up_a=up_a, blk=blk, halo=halo, h_img=h)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        grid=(h // blk,),
        out_shape=jax.ShapeDtypeStruct((h, w, f), xb.dtype),
        in_specs=[_whole_g(xa_pad), _whole_g(xb_pad)]
                 + [_whole_g(a) for a in ws],
        out_specs=pl.BlockSpec((blk, w, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xa_pad, xb_pad, *ws)


def _xla_c3k2(x, *ws, shortcut):
    return _c3k2_math(x, *ws, shortcut=shortcut)


def _xla_c3k2_cat(xa, xb, *ws, shortcut, up_a):
    return _c3k2_cat_math(xa, xb, *ws, shortcut=shortcut, up_a=up_a)


# --------------------------------------------------------------------- #
# Per-platform primitive (stage1_kernel pattern): Pallas on tpu, the
# identical-math XLA form on every other platform, one multi-platform
# artifact. Leading batch dims are handled inside the lowering (vmap of
# the unbatched form); an explicit batching rule covers user-level vmap
# (the cached vmapped-predict graph used by calibration/eval).
# --------------------------------------------------------------------- #
import jax.extend as jex  # noqa: E402
from jax import core as jcore  # noqa: E402
from jax.interpreters import batching as jbatching  # noqa: E402
from jax.interpreters import mlir as jmlir  # noqa: E402

fused_c3k2_p = jex.core.Primitive("unina_fused_c3k2")


@fused_c3k2_p.def_abstract_eval
def _abstract(x, w1, b1, wb1, bb1, wb2, bb2, w2, b2, w3, b3, *, shortcut):
    *lead, h, w, _c = x.shape
    return jcore.ShapedArray((*lead, h, w, b3.shape[-1]), x.dtype)


def _apply_leading(fn):
    def run(x, *ws, **kw):
        f = functools.partial(fn, **kw)
        for _ in range(x.ndim - 3):
            f = jax.vmap(f, in_axes=(0,) + (None,) * 10)
        return f(x, *ws)

    return run


def _impl_xla(x, *ws, shortcut):
    return _apply_leading(_xla_c3k2)(x, *ws, shortcut=shortcut)


def _impl_pallas(x, *ws, shortcut):
    return _unroll_leading(_pallas_c3k2)(x, *ws, shortcut=shortcut)


def _batch_rule(args, dims, *, shortcut):
    x, *ws = args
    xd, *wds = dims
    assert all(d is jbatching.not_mapped for d in wds), \
        "fused_c3k2: weights cannot be batched"
    x = jnp.moveaxis(x, xd, 0)
    return fused_c3k2_p.bind(x, *ws, shortcut=shortcut), 0


fused_c3k2_p.def_impl(_impl_xla)
jbatching.primitive_batchers[fused_c3k2_p] = _batch_rule
jmlir.register_lowering(
    fused_c3k2_p, jmlir.lower_fun(_impl_xla, multiple_results=False))
jmlir.register_lowering(
    fused_c3k2_p, jmlir.lower_fun(_impl_pallas, multiple_results=False),
    platform="tpu")

# -- pair-input form: C3k2 over concat([up?(xa), xb]), fusion folded in --
fused_c3k2_cat_p = jex.core.Primitive("unina_fused_c3k2_cat")


@fused_c3k2_cat_p.def_abstract_eval
def _abstract_cat(xa, xb, w1, b1, wb1, bb1, wb2, bb2, w2, b2, w3, b3, *,
                  shortcut, up_a):
    *lead, h, w, _c = xb.shape
    return jcore.ShapedArray((*lead, h, w, b3.shape[-1]), xb.dtype)


def _apply_leading2(fn):
    def run(xa, xb, *ws, **kw):
        f = functools.partial(fn, **kw)
        for _ in range(xb.ndim - 3):
            f = jax.vmap(f, in_axes=(0, 0) + (None,) * 10)
        return f(xa, xb, *ws)

    return run


def _impl_cat_xla(xa, xb, *ws, shortcut, up_a):
    return _apply_leading2(_xla_c3k2_cat)(xa, xb, *ws, shortcut=shortcut,
                                          up_a=up_a)


def _impl_cat_pallas(xa, xb, *ws, shortcut, up_a):
    return _unroll_leading(_pallas_c3k2_cat, 2)(xa, xb, *ws,
                                                shortcut=shortcut,
                                                up_a=up_a)


def _batch_rule_cat(args, dims, *, shortcut, up_a):
    xa, xb, *ws = args
    da, db, *wds = dims
    assert all(d is jbatching.not_mapped for d in wds), \
        "fused_c3k2_cat: weights cannot be batched"
    xa = jnp.moveaxis(xa, da, 0) if da is not jbatching.not_mapped else \
        jnp.broadcast_to(xa[None], (xb.shape[0] if db == 0 else 1,
                                    *xa.shape))
    if db is not jbatching.not_mapped:
        xb = jnp.moveaxis(xb, db, 0)
    return fused_c3k2_cat_p.bind(xa, xb, *ws, shortcut=shortcut,
                                 up_a=up_a), 0


fused_c3k2_cat_p.def_impl(_impl_cat_xla)
jbatching.primitive_batchers[fused_c3k2_cat_p] = _batch_rule_cat
jmlir.register_lowering(
    fused_c3k2_cat_p, jmlir.lower_fun(_impl_cat_xla,
                                      multiple_results=False))
jmlir.register_lowering(
    fused_c3k2_cat_p, jmlir.lower_fun(_impl_cat_pallas,
                                      multiple_results=False),
    platform="tpu")


def fused_c3k2(x, cv1, cv2, cv3, bottlenecks, *, shortcut=True,
               use_pallas=None, interpret=False):
    """One-VMEM-pass C3k2 over flax-layout weights.

    Args:
        x: (..., H, W, Cin) activations (bf16 deploy path).
        cv1/cv2/cv3: (kernel, bias) HWIO tuples of the three 1x1 convs —
            kernels (1, 1, Cin, h), (1, 1, Cin, h), (1, 1, 2h, F).
        bottlenecks: list of ((k1, b1), (k2, b2)) per bottleneck —
            k1 (1, 1, h, h), k2 (3, 3, h, h).
        shortcut: residual add around each bottleneck (C3k2 default).
        use_pallas: None = per-platform primitive (tpu -> Pallas kernel,
            else XLA form); True/False force a form (tests/probes).
        interpret: Pallas interpret mode (CPU correctness tests).

    Returns (..., H, W, F) in ``x.dtype``. Weight reshapes below are pure
    layout (constant-folded in weights-baked artifacts).
    """
    ws = _pack_weights(cv1, cv2, cv3, bottlenecks, x.dtype)
    if use_pallas is None:
        return fused_c3k2_p.bind(x, *ws, shortcut=shortcut)
    if use_pallas:
        fn = _unroll_leading(
            functools.partial(_pallas_c3k2, interpret=interpret))
    else:
        fn = _apply_leading(_xla_c3k2)
    return fn(x, *ws, shortcut=shortcut)


def _pack_weights(cv1, cv2, cv3, bottlenecks, dt):
    """Flax HWIO param tuples -> the kernel's flat 2D/stacked operands.
    Pure layout — constant-folded in weights-baked artifacts."""
    (k1, b1), (k2, b2), (k3, b3) = cv1, cv2, cv3
    hd = k1.shape[-1]
    w1 = k1.reshape(k1.shape[-2], hd).astype(dt)
    w2 = k2.reshape(k2.shape[-2], hd).astype(dt)
    w3 = k3.reshape(k3.shape[-2], k3.shape[-1]).astype(dt)
    wb1 = jnp.stack([kk1.reshape(hd, hd) for (kk1, _), _ in bottlenecks]
                    ).astype(dt)
    bb1 = jnp.stack([bbias for (_, bbias), _ in bottlenecks])
    wb2 = jnp.stack([kk2 for _, (kk2, _) in bottlenecks]).astype(dt)
    bb2 = jnp.stack([bbias for _, (_, bbias) in bottlenecks])
    b1, b2, b3 = (b.reshape(1, -1) for b in (b1, b2, b3))
    return (w1, b1, wb1, bb1, wb2, bb2, w2, b2, w3, b3)


def fused_c3k2_cat(xa, xb, cv1, cv2, cv3, bottlenecks, *, shortcut=True,
                   upsample_a=False, use_pallas=None, interpret=False):
    """Fused C3k2 over ``concat([upsample2x?(xa), xb], -1)`` with the
    upsample and the concat folded into the block's first dots (the FPN
    fusion layers ``C3k2(concat([upsample(lateral), skip]))``) — neither
    the upsampled tensor nor the 2x-wide concat ever reaches HBM, and the
    lateral dot runs at the coarse resolution (1x1 conv commutes with
    nearest upsampling).

    Args: xa (..., H/2, W/2, Ca) when ``upsample_a`` else (..., H, W,
    Ca); xb (..., H, W, Cb); weights as in :func:`fused_c3k2` with
    cv1/cv2 kernels (1, 1, Ca+Cb, h), xa's rows first (concat order).
    """
    ws = _pack_weights(cv1, cv2, cv3, bottlenecks, xb.dtype)
    if use_pallas is None:
        return fused_c3k2_cat_p.bind(xa, xb, *ws, shortcut=shortcut,
                                     up_a=upsample_a)
    if use_pallas:
        # static unroll, NEVER vmap: the pallas batching rule prepends
        # the batch axis to the grid, re-binding pl.program_id(0) inside
        # _kernel_cat_grid to the batch index (same rule as fused_c3k2).
        fn = _unroll_leading(
            functools.partial(_pallas_c3k2_cat, interpret=interpret), 2)
        return fn(xa, xb, *ws, shortcut=shortcut, up_a=upsample_a)
    return _apply_leading2(_xla_c3k2_cat)(xa, xb, *ws, shortcut=shortcut,
                                          up_a=upsample_a)
