"""Fused stage1 downsample over the column-MERGED stem layout.

The committed ``stage1_s2d`` path (``ops.preprocess.space_to_depth_rt`` +
``models.blocks.ShiftDot2x2``) is correct but makes five full HBM passes
over 6.5-26 MB for an op whose speed of light is one 6.5 MB read + one
3.3 MB write + a 1.7 GFLOP dot: the 6D-transpose shuffle (two passes,
9.2% of device time on the r3 trace), the 4-slice patches concat and the
dot (11.6%). This module fuses all of it into ONE VMEM pass.

Layout insight (probed in ``tools/stage1_pallas_probe.py``): in the
column-merged view ``xm = x.reshape(H, W/2, 2C)`` — a byte-identical
row-major view of the stem output — every tap of the folded 2x2 blocked
conv becomes a PLAIN slice after a free leading-dim split
``xmp.reshape(H/2+1, 2, WP, 2C)``: no strided access, no gather, no 6D
transpose. The kernel reads each input block once into VMEM and
accumulates four kw-packed dots (K = 2C, N = 2*O) in f32, adds the bias
and applies ReLU in-register, and writes the (H/2, W/2, O) result once.

The merged view is NOT free to materialise on-device (the retile costs
~0.06 ms, probed) — it must arrive merged, which the s2d_merged stem
provides for free (``quant.deploy.merge_stem_columns``: the stem matmul
itself emits merged columns; the host input bytes are unchanged).

Equivalent of the reference's DLA-side fused conv scheduling
(``/root/reference/unina_yolo_dla/model.py:152-190`` stage1 +
TensorRT's builder-time fusion); measured 0.036 ms vs 0.082 ms for the
unfused committed path at (320,320,32)->(160,160,64) on v5e.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pack_stage1_weights",
    "fused_downsample_merged",
    "merged_from_standard",
]

# sublane tile for bf16 — pad the merged-column axis (second-to-last in
# the kernel's operand blocks) up to it so slices stay tile-aligned
_SUBLANE = 16


def _wpad(w2: int) -> int:
    """Padded merged-column count: left pad 1 (the conv's column halo)
    then round up; cols beyond w2+1 are garbage and never sliced out."""
    return ((w2 + 1 + _SUBLANE - 1) // _SUBLANE) * _SUBLANE


def pack_stage1_weights(wb: jnp.ndarray) -> jnp.ndarray:
    """(2,2,4C,O) blocked kernel -> (2,2,2C,2O) kw-packed:

        wp[kh, di, c, kw*O + o] = wb[kh, kw, di*2C + c, o]

    so each (kh, di) tap is one (2C, 2O) matmul whose two O-column halves
    are the kw=0/kw=1 contributions, recovered by a shift-by-one-column
    slice of the product. Pure transpose/reshape of the weights — XLA
    constant-folds it in weights-baked artifacts.
    """
    kh2, kw2, c4, o = wb.shape
    assert kh2 == 2 and kw2 == 2 and c4 % 2 == 0
    cm = c4 // 2
    w = wb.reshape(2, 2, 2, cm, o)       # [kh, kw, di, c, o]
    w = w.transpose(0, 2, 3, 1, 4)       # [kh, di, c, kw, o]
    return w.reshape(2, 2, cm, 2 * o)


def _merged_padded(xm: jnp.ndarray, wpad: int) -> jnp.ndarray:
    """(H, W2, CM) merged rows -> (H/2+1, 2, wpad, CM) plain-slice form.

    Row pad 2 = one halo row (the conv's top pad) + one to keep the
    leading-dim split even; col pad 1 left (column halo) + right to the
    sublane tile. All pads are zeros == the conv's zero padding.
    """
    h, w2, cm = xm.shape
    xmp = jnp.pad(xm, ((2, 0), (1, wpad - w2 - 1), (0, 0)))
    return xmp.reshape(h // 2 + 1, 2, wpad, cm)


def _taps(x4, wp, hb: int, w2: int, co: int):
    """The four (kh, di) dots + shifted-slice adds, f32 accumulation.

    ``x4``: (hb+1, 2, wpad, CM) — this grid step's rows + one halo row.
    """
    acc = jnp.zeros((hb, w2, co), jnp.float32)
    for kh in range(2):
        for di in range(2):
            xs = x4[kh:kh + hb, di]                       # (hb, wpad, CM)
            z = lax.dot_general(xs, wp[kh, di],
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = acc + z[:, 0:w2, 0:co] + z[:, 1:w2 + 1, co:2 * co]
    return acc


def _kernel(x_ref, xh_ref, w_ref, b_ref, o_ref, *, hb, w2, co):
    x4 = jnp.concatenate([x_ref[:], xh_ref[:]], axis=0)   # (+1 halo row)
    acc = _taps(x4, w_ref[:], hb, w2, co)
    o_ref[:] = jnp.maximum(acc + b_ref[0], 0.0).astype(o_ref.dtype)


def _xla_merged(xm, wp, bias):
    """Same math without Pallas — the CPU/test path (and itself faster
    than the unfused committed path: 0.064 vs 0.082 ms probed)."""
    h, w2, cm = xm.shape
    h2, co = h // 2, wp.shape[-1] // 2
    x4 = _merged_padded(xm, _wpad(w2))
    acc = _taps(x4, wp, h2, w2, co)
    return jnp.maximum(acc + bias.astype(jnp.float32),
                       0.0).astype(xm.dtype)


def _pallas_merged(xm, wp, bias, hb: int, interpret: bool = False):
    h, w2, cm = xm.shape
    h2, co = h // 2, wp.shape[-1] // 2
    wpad = _wpad(w2)
    x4 = _merged_padded(xm, wpad)
    b2 = bias.reshape(1, co).astype(jnp.float32)
    kern = functools.partial(_kernel, hb=hb, w2=w2, co=co)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((h2, w2, co), xm.dtype),
        grid=(h2 // hb,),
        in_specs=[
            pl.BlockSpec((hb, 2, wpad, cm), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # one-row halo block below this grid step's rows (the kh=1
            # tap of the last output row) — same array, offset index map
            pl.BlockSpec((1, 2, wpad, cm), lambda i: (i * hb + hb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, cm, 2 * co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, w2, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x4, x4, wp, b2)


def _pick_hb(h2: int) -> int:
    """Largest divisor of the output row count <= 8 (hb=8 measured best;
    the grid must tile the rows exactly)."""
    for hb in (8, 4, 2, 1):
        if h2 % hb == 0:
            return hb
    return 1


# ---------------------------------------------------------------------
# Per-platform primitive: ONE multi-platform artifact carries BOTH
# lowerings — the Pallas kernel on tpu, the identical-math XLA form on
# cpu. (lax.platform_dependent cannot express this in this JAX version:
# its cond lowering does not restrict inner primitives to the branch's
# platforms, so the Pallas branch fails to lower for the cpu target of a
# multi-platform export. A primitive with platform lowering rules is the
# mechanism pallas_call itself uses.)
# ---------------------------------------------------------------------
import jax.extend as jex  # noqa: E402
from jax import core as jcore  # noqa: E402
from jax.interpreters import mlir as jmlir  # noqa: E402

fused_stage1_p = jex.core.Primitive("unina_fused_stage1_merged")


@fused_stage1_p.def_abstract_eval
def _fused_abstract(xm, wp, bias):
    *lead, h, w2, _cm = xm.shape
    co = wp.shape[-1] // 2
    return jcore.ShapedArray((*lead, h // 2, w2, co), xm.dtype)


def _apply_leading(fn):
    """Map an unbatched (H, W2, CM) implementation over any leading dims."""

    def run(xm, wp, bias):
        f = fn
        for _ in range(xm.ndim - 3):
            f = jax.vmap(f, in_axes=(0, None, None))
        return f(xm, wp, bias)

    return run


def _pallas_impl(xm, wp, bias):
    hb = _pick_hb(xm.shape[-3] // 2)
    return _apply_leading(
        functools.partial(_pallas_merged, hb=hb))(xm, wp, bias)


def _xla_impl(xm, wp, bias):
    return _apply_leading(_xla_merged)(xm, wp, bias)


fused_stage1_p.def_impl(_xla_impl)
jmlir.register_lowering(
    fused_stage1_p, jmlir.lower_fun(_xla_impl, multiple_results=False))
jmlir.register_lowering(
    fused_stage1_p, jmlir.lower_fun(_pallas_impl, multiple_results=False),
    platform="tpu")


def fused_downsample_merged(xm: jnp.ndarray, wb: jnp.ndarray,
                            bias: jnp.ndarray,
                            use_pallas: bool | None = None,
                            interpret: bool = False) -> jnp.ndarray:
    """ReLU(3x3-stride-2-conv) over the column-merged input, fused.

    Args:
        xm: (..., H, W2, 2C) merged activations — ``xm[..., h, w2, :2C]``
            is the standard tensor's column ``2*w2``, ``[2C:]`` column
            ``2*w2+1``.
        wb: (2, 2, 4C, O) blocked kernel
            (``quant.deploy.fold_downsample_space_to_depth`` layout).
        bias: (O,) folded conv bias.
        use_pallas: force the kernel on/off; None binds the per-platform
            primitive ``fused_stage1_p`` — the Pallas kernel on the tpu
            lowering, the identical-math XLA form elsewhere — so one
            trace serves multi-platform (cpu,tpu) artifacts.
        interpret: run the Pallas kernel in interpret mode (CPU testing).

    Returns (..., H/2, W2, O) in ``xm.dtype``.
    """
    wp = pack_stage1_weights(wb.astype(xm.dtype))
    if use_pallas is None:
        return fused_stage1_p.bind(xm, wp, bias)
    if use_pallas:
        h2 = xm.shape[-3] // 2
        fn = functools.partial(_pallas_merged, hb=_pick_hb(h2),
                               interpret=interpret)
    else:
        fn = _xla_merged
    return _apply_leading(fn)(xm, wp, bias)


def merged_from_standard(x: np.ndarray | jnp.ndarray):
    """(..., H, W, C) -> (..., H, W/2, 2C) merged view — byte-identical
    row-major reshape (free on the host; a RETILE on-device, ~0.06 ms —
    which is why the s2d_merged stem emits merged columns directly)."""
    *lead, h, w, c = x.shape
    return x.reshape(*lead, h, w // 2, 2 * c)
