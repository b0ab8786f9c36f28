"""Fused stem + stage1 downsample over the column-MERGED frame layout.

One VMEM pass from the normalized merged frame (S/2, S/4, 24) straight to
the stage1 output (S/4, S/4, c2): the stem's 2x2 shift-dot, its ReLU, the
stage1 kw-packed taps, bias and ReLU all run in-register; the 6.5 MB stem
intermediate never reaches HBM.

Why: at batch 1 the XLA lowering of the merged stem (ShiftDot2x2) fuses
well (45 us/frame), but at batch 8 XLA materialises the shifted-slice
patches as padded HBM tensors — `pad_maximum_fusion` + `pad_slice_fusion`
cost 1.08 ms/batch and the stem balloons from 6.4% to 19.1% of device
time (runs/b8_trace_int8_s2dm_b8, artifacts/b8_trace.json). The batched
regime needs the fusion authored, exactly like the stage1 kernel
(`stage1_kernel.py`) it extends.

Geometry (all top-pads, so blocks only need a TOP halo):

    frame   (320, 160, 24) merged columns, conv pad ((1,0),(1,0))
    stem    2x2 stride-1 shift-dot -> (320, 160, 64) merged columns
    stage1  folded 2x2 blocked conv (``fused_downsample_merged`` math)
            -> (160, 160, 64)

For an output row block [R0, R0+hb): stage1 reads stem rows
[2*R0-2, 2*R0+2*hb-1] (its top-2 zero pad), each stem row s reads frame
rows s-1, s — so the block consumes frame rows [2*R0-3, 2*R0+2*hb-1].
The wrapper zero-pads the frame by 4 top rows (making the span
pair-aligned) and views it as row PAIRS; the kernel gets hb main pairs +
two single-pair halo operands (the ``stage1_kernel`` halo pattern —
BlockSpec index maps cannot express overlap, but a block of height 1
indexes in units of 1). Out-of-image stem rows are RE-MASKED to zero
before the stage1 taps: the stem at a zero-padded frame row evaluates
ReLU(bias) != 0, while stage1's pad semantics require zeros (the exact
edge-row bug class the r3 advisor caught in the fused head).

Reference analogue: the DLA executes stem+stage1 back-to-back from CBUF
without an HBM round-trip (TensorRT builder-time scheduling,
``/root/reference/unina_yolo_dla/model.py:152-190``); on TPU the fusion
must be authored.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stage1_kernel import _wpad, pack_stage1_weights

__all__ = ["fused_stem_stage1", "fused_stem_stage1_p", "pack_stem_weights"]


def pack_stem_weights(k: jnp.ndarray) -> jnp.ndarray:
    """(2, 2, CM, O) merged stem kernel -> (2, CM, 2*O) kw-packed:

        wkw[kh, c, kw*O + o] = k[kh, kw, c, o]

    so each kh tap is ONE (CM, 2*O) dot over the column-padded rows whose
    two O-column halves are the kw=0/kw=1 contributions, recovered by a
    shift-by-one-column slice of the product — the ``stage1_kernel``
    ``_taps`` pattern. (A 4-tap lane-concat patches form would give a
    deeper K=4*CM contraction, but Mosaic cannot concatenate lane-dim
    pieces whose column-shifted slices carry mismatched sublane offsets:
    "result/input offset mismatch on non-concat dimension".)
    """
    kh2, kw2, cm, o = k.shape
    assert kh2 == 2 and kw2 == 2
    return k.transpose(0, 2, 1, 3).reshape(2, cm, 2 * o)


def _stem_rows(x, wkw, b, *, rows, w2):
    """Stem rows j = 0..rows-1 from the local padded frame block ``x``
    ((rows+2), wpad, CM): stem row j reads frame-local rows j+1 (kh=0),
    j+2 (kh=1); the kw taps come from the packed dot's shifted column
    halves. f32 accumulation, bias + ReLU in-register."""
    o = wkw.shape[-1] // 2
    acc = None
    for kh in range(2):
        z = lax.dot_general(x[1 + kh:1 + kh + rows], wkw[kh],
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        t = z[:, 0:w2, 0:o] + z[:, 1:w2 + 1, o:2 * o]
        acc = t if acc is None else acc + t
    return jnp.maximum(acc + b, 0.0)


def _stage1_rows(sl, wp, b, *, hb, w2, co):
    """stage1 output rows from ``sl`` (2*hb+2, wpad, co) stem rows (one
    ZERO left-halo col at index 0, zero cols beyond w2+1 — the sublane-
    aligned ``_wpad`` layout Mosaic's relayout inference needs) — the
    ``stage1_kernel._taps`` math on a locally-built pair view."""
    s4 = sl.reshape(hb + 1, 2, sl.shape[-2], sl.shape[-1])
    acc = jnp.zeros((hb, w2, co), jnp.float32)
    for kh in range(2):
        for di in range(2):
            xs = s4[kh:kh + hb, di]
            z = lax.dot_general(xs, wp[kh, di], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = acc + z[:, 0:w2, 0:co] + z[:, 1:w2 + 1, co:2 * co]
    return jnp.maximum(acc + b, 0.0)


def _kernel(xm_ref, xh1_ref, xh2_ref, w96_ref, bs_ref, wp_ref, b1_ref,
            o_ref, *, hb, w2, co, h_img):
    i = pl.program_id(0)  # safe: batch is handled by static unroll
    x = jnp.concatenate([xm_ref[:], xh1_ref[:], xh2_ref[:]], axis=0)
    x = x.reshape(-1, *x.shape[2:])          # (2*hb+4, wpad, CM) rows
    _kernel_body(i, x, w96_ref, bs_ref, wp_ref, b1_ref, o_ref, hb=hb,
                 w2=w2, co=co, h_img=h_img)


def _kernel_body(i, x, w96_ref, bs_ref, wp_ref, b1_ref, o_ref, *, hb, w2,
                 co, h_img):
    rows = 2 * hb + 2                        # stem rows 2*R0-2 .. +2*hb-1
    stem = _stem_rows(x, w96_ref[:], bs_ref[0], rows=rows, w2=w2)
    # re-mask: stem rows < 0 are stage1 ZERO padding, not ReLU(bias)
    row0 = 2 * (i * hb) - 2
    idx = row0 + lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    stem = jnp.where((idx >= 0) & (idx < h_img), stem, 0.0)
    stem = stem.astype(o_ref.dtype)  # bf16 inter-stage boundary, as the
    # composed path materialises it — keeps the stage1 dots bit-identical
    # one zero col = stage1's left column halo (its conv zero padding);
    # right-pad to the sublane-aligned wpad so the pair-view reshape and
    # the tap dots stay tile-aligned (Mosaic rejects a 161-col reshape)
    wpad = _wpad(w2)
    co2 = stem.shape[-1]
    sl = jnp.concatenate(
        [jnp.zeros((rows, 1, co2), stem.dtype), stem,
         jnp.zeros((rows, wpad - w2 - 1, co2), stem.dtype)], axis=1)
    o_ref[:] = _stage1_rows(sl, wp_ref[:], b1_ref[0], hb=hb, w2=w2,
                            co=co).astype(o_ref.dtype)


def _prep(xm, wpad):
    """(H, W2, CM) merged frame -> (H/2+2, 2, wpad, CM) pair view with 4
    zero top rows (frame halo, pair-aligned) and the stem's 1-col left
    zero pad."""
    h, w2, cm = xm.shape
    xp = jnp.pad(xm, ((4, 0), (1, wpad - w2 - 1), (0, 0)))
    return xp.reshape(h // 2 + 2, 2, wpad, cm)


def _kernel_resident(x_ref, w96_ref, bs_ref, wp_ref, b1_ref, o_ref, *,
                     hb, w2, co, h_img):
    """Variant: the whole padded frame stays VMEM-resident (2 MB at the
    deploy size; constant block index -> fetched once); each step slices
    its overlapping window with pl.ds — no halo operands, no concat."""
    i = pl.program_id(0)
    x = x_ref[pl.ds(i * hb, hb + 2)]
    x = x.reshape(-1, *x.shape[2:])
    _kernel_body(i, x, w96_ref, bs_ref, wp_ref, b1_ref, o_ref, hb=hb,
                 w2=w2, co=co, h_img=h_img)


def _pallas_form_resident(xm, wkw, bs, wp, b1, *, hb=8, interpret=False):
    h, w2, cm = xm.shape
    h2 = h // 2
    co = wp.shape[-1] // 2
    wpad = _wpad(w2)
    x4 = _prep(xm, wpad)
    bs2 = bs.reshape(1, -1).astype(jnp.float32)
    b12 = b1.reshape(1, -1).astype(jnp.float32)
    kern = functools.partial(_kernel_resident, hb=hb, w2=w2, co=co, h_img=h)

    def _whole(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((h2, w2, co), xm.dtype),
        grid=(h2 // hb,),
        in_specs=[_whole(x4), _whole(wkw), _whole(bs2), _whole(wp),
                  _whole(b12)],
        out_specs=pl.BlockSpec((hb, w2, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x4, wkw, bs2, wp, b12)


def _pallas_form(xm, wkw, bs, wp, b1, *, hb=8, interpret=False):
    h, w2, cm = xm.shape
    h2 = h // 2
    co = wp.shape[-1] // 2
    wpad = _wpad(w2)
    x4 = _prep(xm, wpad)
    bs2 = bs.reshape(1, -1).astype(jnp.float32)
    b12 = b1.reshape(1, -1).astype(jnp.float32)
    kern = functools.partial(_kernel, hb=hb, w2=w2, co=co, h_img=h)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((h2, w2, co), xm.dtype),
        grid=(h2 // hb,),
        in_specs=[
            pl.BlockSpec((hb, 2, wpad, cm), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, wpad, cm), lambda i: (i * hb + hb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, wpad, cm),
                         lambda i: (i * hb + hb + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wkw.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs2.shape[-1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b12.shape[-1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, w2, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x4, x4, x4, wkw, bs2, wp, b12)


def _xla_form(xm, wkw, bs, wp, b1):
    """Identical math, no Pallas — the cpu lowering and the correctness
    oracle. Uses the SAME kw-packed 2-dot stem form as the kernel so the
    two platform lowerings are one math (the composed ShiftDot2x2 graph
    computes one K=4*CM dot instead; its f32 accumulation order differs
    by reassociation only — bf16-tolerance vs that path, bit-identity
    between these two forms)."""
    from .stage1_kernel import _merged_padded, _taps

    h, w2, cm = xm.shape
    wpad = _wpad(w2)
    # two top pad rows so _stem_rows' local indexing (frame[s-1+kh] at
    # local row s+1+kh) holds; row 0 is never read
    xp = jnp.pad(xm, ((2, 0), (1, wpad - w2 - 1), (0, 0)))
    stem = _stem_rows(xp, wkw, bs.astype(jnp.float32), rows=h, w2=w2)
    stem = stem.astype(xm.dtype)
    co = wp.shape[-1] // 2
    x4 = _merged_padded(stem, wpad)
    acc = _taps(x4, wp, h // 2, w2, co)
    return jnp.maximum(acc + b1.astype(jnp.float32), 0.0).astype(xm.dtype)


def _unroll(fn):
    def run(xm, *ws, **kw):
        lead = xm.shape[:-3]
        if not lead:
            return fn(xm, *ws, **kw)
        flat = xm.reshape(-1, *xm.shape[-3:])
        outs = [fn(flat[i], *ws, **kw) for i in range(flat.shape[0])]
        return jnp.stack(outs).reshape(*lead, *outs[0].shape)

    return run


def _apply_leading(fn):
    def run(xm, *ws, **kw):
        f = functools.partial(fn, **kw)
        for _ in range(xm.ndim - 3):
            f = jax.vmap(f, in_axes=(0,) + (None,) * len(ws))
        return f(xm, *ws)

    return run


# --------------------------------------------------------------------- #
# Per-platform primitive (stage1_kernel pattern): Pallas on tpu, the
# identical-math XLA form elsewhere; one multi-platform artifact. Batch
# via static unroll on the Pallas side (the TPU grid is sequential; vmap
# would re-bind pl.program_id(0) to the batch axis).
# --------------------------------------------------------------------- #
import jax.extend as jex  # noqa: E402
from jax import core as jcore  # noqa: E402
from jax.interpreters import batching as jbatching  # noqa: E402
from jax.interpreters import mlir as jmlir  # noqa: E402

fused_stem_stage1_p = jex.core.Primitive("unina_fused_stem_stage1")


@fused_stem_stage1_p.def_abstract_eval
def _abstract(xm, wkw, bs, wp, b1):
    *lead, h, w2, _cm = xm.shape
    return jcore.ShapedArray((*lead, h // 2, w2, wp.shape[-1] // 2),
                             xm.dtype)


def _impl_xla(xm, *ws):
    return _apply_leading(_xla_form)(xm, *ws)


def _impl_pallas(xm, *ws):
    return _unroll(_pallas_form)(xm, *ws)


def _batch_rule(args, dims):
    xm, *ws = args
    xd, *wds = dims
    assert all(d is jbatching.not_mapped for d in wds), \
        "fused_stem_stage1: weights cannot be batched"
    xm = jnp.moveaxis(xm, xd, 0)
    return fused_stem_stage1_p.bind(xm, *ws), 0


fused_stem_stage1_p.def_impl(_impl_xla)
jbatching.primitive_batchers[fused_stem_stage1_p] = _batch_rule
jmlir.register_lowering(
    fused_stem_stage1_p, jmlir.lower_fun(_impl_xla, multiple_results=False))
jmlir.register_lowering(
    fused_stem_stage1_p, jmlir.lower_fun(_impl_pallas,
                                         multiple_results=False),
    platform="tpu")


def fused_stem_stage1(xm: jnp.ndarray, stem_kernel: jnp.ndarray,
                      stem_bias: jnp.ndarray, stage1_kernel: jnp.ndarray,
                      stage1_bias: jnp.ndarray,
                      use_pallas: bool | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """ReLU(stage1(ReLU(stem(xm)))) in one fused pass.

    Args:
        xm: (..., H, W2, CM) normalized merged frame (CM = 24 deployed).
        stem_kernel: (2, 2, CM, O2) merged stem kernel
            (``quant.deploy.merge_stem_columns`` layout; O2 = 2*c1).
        stem_bias: (O2,).
        stage1_kernel: (2, 2, 2*O2, c2) blocked downsample kernel
            (``fold_downsample_space_to_depth`` layout).
        stage1_bias: (c2,).
        use_pallas: None = per-platform primitive (tpu -> Pallas kernel);
            True/False force a form (tests/probes).
        interpret: Pallas interpret mode (CPU correctness tests).

    Returns (..., H/2, W2, c2) in ``xm.dtype``.
    """
    dt = xm.dtype
    wkw = pack_stem_weights(stem_kernel.astype(dt))
    wp = pack_stage1_weights(stage1_kernel.astype(dt))
    bs = stem_bias.reshape(1, -1)
    b1 = stage1_bias.reshape(1, -1)
    if use_pallas is None:
        return fused_stem_stage1_p.bind(xm, wkw, bs, wp, b1)
    if use_pallas:
        return _unroll(functools.partial(_pallas_form,
                                         interpret=interpret))(
            xm, wkw, bs, wp, b1)
    return _apply_leading(_xla_form)(xm, wkw, bs, wp, b1)
