"""QTensor: an int8 activation tensor carrying its quantisation scale.

This is the data type that flows BETWEEN layers in the fused int8 engine
(``QuantSpec.mode == "int8_fused"``). Where the round-1 engine dequantised
every conv output to bfloat16 and re-quantised at the next conv's input
quantizer (two HBM round-trips of a 2-byte tensor per layer boundary), the
fused engine keeps activations as int8 end to end:

    conv(int8 x, int8 w) -> int32  -- MXU, 2x bf16 throughput
      * (s_in * s_w[c])            -- dequant scale  (fused epilogue)
      + bias[c]                    -- BN-folded bias (fused epilogue)
      relu == clip(., 0, 127)      -- ReLU folds into the requant clip
      / s_out, round -> int8       -- requant to the NEXT layer's scale

XLA fuses the whole epilogue into the conv output, so the only HBM tensor
per layer boundary is 1-byte int8 — 3x less inter-layer traffic than the
round-1 int8 engine and 2x less than the bf16 path. This is the TPU
equivalent of TensorRT's int8 layer-chaining on the DLA, where the engine
is int8-in/int8-out per layer and scales live in the layer epilogue
(reference export_trt.py:431-455 builds nothing else).

Scale convention matches fake_quant: symmetric, scale = amax / 127. The
carried ``amax`` is a traced f32 scalar (a leaf of the ``quant`` variable
collection), so jit/AOT treat it like any other parameter.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

QMAX = 127.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """int8 values + the amax they were quantised with (scale = amax/127)."""

    q: jnp.ndarray      # int8, NHWC
    amax: jnp.ndarray   # f32 scalar

    def tree_flatten(self):
        return (self.q, self.amax), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape

    @property
    def scale(self) -> jnp.ndarray:
        return jnp.maximum(self.amax, 1e-9) / QMAX

    def dequant(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        """QTensor -> float tensor (the int8 -> float boundary: excluded
        layers and final head outputs)."""
        return (self.q.astype(jnp.float32) * self.scale).astype(dtype)


def quantize(x: jnp.ndarray, amax: jnp.ndarray) -> QTensor:
    """float tensor -> QTensor at a calibrated amax (float -> int8
    boundary: the first quantized conv after an excluded/float region)."""
    scale = jnp.maximum(amax, 1e-9) / QMAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -QMAX, QMAX).astype(jnp.int8)
    return QTensor(q, jnp.asarray(amax, jnp.float32))


def requantize(x: QTensor, amax: jnp.ndarray) -> QTensor:
    """Rescale an int8 tensor to a new amax (concat scale matching).

    ratio <= 1 when amax >= x.amax, so no clipping occurs in that
    direction; clip anyway for safety when shrinking the range.
    """
    ratio = x.scale / (jnp.maximum(amax, 1e-9) / QMAX)
    q = jnp.clip(jnp.round(x.q.astype(jnp.float32) * ratio),
                 -QMAX, QMAX).astype(jnp.int8)
    return QTensor(q, jnp.asarray(amax, jnp.float32))


def qconcat(xs: list[QTensor], axis: int = -1) -> QTensor:
    """Concat int8 tensors on a common scale (the max of the input amaxes,
    so no branch ever clips — TensorRT inserts the same reformat at int8
    concats).

    Branches whose traced amax is the SAME tracer object (e.g. SPPF's
    chained maxpools, which preserve scale exactly) skip the rescale —
    identity is a static property, so this costs nothing under jit.
    """
    target = xs[0].amax
    for x in xs[1:]:
        if x.amax is not target:
            target = jnp.maximum(target, x.amax)
    parts = [x.q if x.amax is target else requantize(x, target).q
             for x in xs]
    return QTensor(jnp.concatenate(parts, axis=axis), target)


def qadd(a: QTensor, b: QTensor, out_amax: jnp.ndarray) -> QTensor:
    """Residual add of two int8 tensors, requantised to a calibrated output
    amax (the Bottleneck shortcut; reference qat.py:281-294 gives the
    residual its own quantizer for the same scale-matching reason)."""
    out_scale = jnp.maximum(out_amax, 1e-9) / QMAX
    y = (a.q.astype(jnp.float32) * (a.scale / out_scale)
         + b.q.astype(jnp.float32) * (b.scale / out_scale))
    q = jnp.clip(jnp.round(y), -QMAX, QMAX).astype(jnp.int8)
    return QTensor(q, jnp.asarray(out_amax, jnp.float32))


def qmaxpool(x: QTensor, window: int, stride: int = 1) -> QTensor:
    """Max-pool on int8 values directly (max is monotone, scale-preserving).
    reduce_window(max) supports integer operands on TPU/CPU."""
    pad = window // 2
    q = jax.lax.reduce_window(
        x.q, jnp.int8(-128), jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return QTensor(q, x.amax)


def upsample_nearest_2x_q(x: QTensor) -> QTensor:
    """Nearest 2x upsample on int8 (pure layout op, scale-preserving)."""
    b, h, w, c = x.q.shape
    q = x.q[:, :, None, :, None, :]
    q = jnp.broadcast_to(q, (b, h, 2, w, 2, c)).reshape(b, h * 2, w * 2, c)
    return QTensor(q, x.amax)
