"""Int8 fake-quantisation primitives (the pytorch-quantization replacement).

Design (parity targets in parentheses):

- symmetric per-tensor int8 fake-quant with straight-through estimator
  (TensorQuantizer semantics; per-tensor descriptors, qat.py:109-113).
- weights: amax = max|w| computed inline each step ("max" calibration).
- activations: amax comes from a ``quant`` variable collection, filled by
  the offline calibrator (histogram/entropy — quant/calibrate.py, replacing
  ``collect_calibration_stats`` qat.py:171-220 + TensorRT's
  IInt8EntropyCalibrator2).
- calibration mode: modules pass activations through unchanged while
  accumulating running-amax and a fixed-bin |x| histogram into a mutable
  ``quant_calib`` collection (two-pass: max first, then histogram).

Because quantisation state lives in separate collections and the param tree
is IDENTICAL between FP32 and QAT models, the FP32->QAT handoff is a plain
params copy — no name-matching surgery (contrast qat.py:521-673).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import qtensor
from .qtensor import QTensor

HIST_BINS = 2048

# FP16/FP32-excluded layer patterns: stem + P2 head keep full precision
# (train.py:779-781 — small-object-critical layers).
DEFAULT_EXCLUDE = ("backbone/stem", "backbone/stage1_conv", "head_p2")

# TPU-perf extension of the exclusion list for the DEPLOYED int8 engine:
# v5e microbenchmarks (RESULTS.md) show int8 convs beat bf16 by ~25% at
# P3/P4 spatial sizes (80^2/40^2) but LOSE at the 160^2+ stages, whose
# cost is data-movement-bound and dtype-independent (f32 == bf16 there) —
# quantising them only adds requant work. The fast int8 engine therefore
# keeps every 160^2-operating layer in bf16, the same mixed-precision
# philosophy as the reference's own FP16 layer list (qat.py:700-753),
# extended per measured TPU economics. QAT still trains with
# DEFAULT_EXCLUDE only, so these layers' activation amaxes exist either
# way and an engine built with either list loads the same calibration.
PERF_EXCLUDE = DEFAULT_EXCLUDE + (
    "backbone/stage1_block",   # C3k2 at 160^2
    "backbone/stage2_conv",    # 160^2 -> 80^2 downsample
    "neck/lateral_p2",         # 1x1 at 80^2->160^2 path
    "neck/fpn_c3k2_2",         # P2 fusion C3k2 at 160^2
    "neck/down1",              # 160^2 -> 80^2 downsample
)


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Quantisation behaviour threaded through the model tree.

    mode: "off" (FP path), "calib_max" (pass-through, collect running amax),
    "calib_hist" (pass-through, fill |x| histograms over [0, amax]),
    "quantize" (fake-quant with calibrated amax — QAT / accuracy
    simulation), "int8" (TRUE integer compute: int8 weights + int8
    activations -> int32 MXU accumulation, dequantised to float between
    layers; requires weights pre-quantised by
    quant.deploy.quantize_weights_int8), "int8_fused" (int8 compute AND
    int8 activations BETWEEN layers: each ConvBlock requantises its
    post-ReLU output to a calibrated amax and emits a QTensor, so the
    inter-layer HBM tensor is 1 byte/elem — the TensorRT int8
    layer-chaining equivalent; see quant/qtensor.py).
    """

    mode: str = "off"
    num_bits: int = 8
    exclude: tuple[str, ...] = DEFAULT_EXCLUDE
    # weight quantisation granularity: per output channel (the
    # pytorch-quantization QuantConv2d default the reference inherits,
    # axis=0 in OIHW == last axis of our HWIO kernels) or per-tensor
    per_channel_weights: bool = True

    @property
    def qmax(self) -> float:
        return float(2 ** (self.num_bits - 1) - 1)

    def excluded(self, path: str) -> bool:
        return any(re.search(pat, path) for pat in self.exclude)


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round with straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quant_tensor(x: jnp.ndarray, amax: jnp.ndarray,
                      qmax: float) -> jnp.ndarray:
    """Symmetric per-tensor fake-quant; amax<=0 disables (pass-through)."""
    amax = jnp.maximum(amax, 1e-9)
    scale = amax / qmax
    q = ste_round(jnp.clip(x / scale, -qmax, qmax)) * scale
    return jnp.where(amax > 1e-8, q, x).astype(x.dtype)


class ActQuant(nn.Module):
    """Activation quantizer with calibration state.

    Collections:
      quant/amax          — calibrated threshold (set by the calibrator)
      quant_calib/amax    — running max|x| (calib_max mode)
      quant_calib/hist    — |x| histogram over [0, amax] (calib_hist mode)
    """

    spec: QuantSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        path = "/".join(self.scope.path)
        if spec.mode == "off" or spec.excluded(path):
            return x

        if spec.mode == "calib_max":
            running = self.variable("quant_calib", "amax",
                                    lambda: jnp.zeros((), jnp.float32))
            running.value = jnp.maximum(
                running.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
            return x

        if spec.mode == "calib_hist":
            running = self.variable("quant_calib", "amax",
                                    lambda: jnp.zeros((), jnp.float32))
            hist = self.variable("quant_calib", "hist",
                                 lambda: jnp.zeros((HIST_BINS,), jnp.float32))
            absx = jnp.abs(x.astype(jnp.float32)).reshape(-1)
            # strided subsample caps the scatter-add cost on huge
            # activations (calibration is statistical; TensorRT likewise
            # samples batches, not every element of the stream)
            n = absx.shape[0]
            max_elems = 1 << 21
            if n > max_elems:
                absx = absx[:: (n + max_elems - 1) // max_elems]
            upper = jnp.maximum(running.value, 1e-9)
            idx = jnp.clip((absx / upper * HIST_BINS).astype(jnp.int32),
                           0, HIST_BINS - 1)
            hist.value = hist.value + jnp.zeros_like(hist.value).at[idx].add(
                1.0)
            return x

        if spec.mode == "int8":
            # true integer quantisation: returns (int8 tensor, f32 scale)
            amax = self.variable("quant", "amax",
                                 lambda: jnp.zeros((), jnp.float32))
            scale = jnp.maximum(amax.value, 1e-9) / spec.qmax
            q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                         -spec.qmax, spec.qmax).astype(jnp.int8)
            return q, scale

        if spec.mode == "int8_fused":
            # float -> QTensor boundary at a calibrated amax. Used as
            # "in_q" (first quantized conv after a float region), "out_q"
            # (ConvBlock post-ReLU requant) and "add_q" (residual add
            # output). The variable paths match what the calib modes
            # collect, so one calibration serves both engines.
            amax = self.variable("quant", "amax",
                                 lambda: jnp.zeros((), jnp.float32))
            return qtensor.quantize(x, amax.value)

        # quantize (QAT fake-quant)
        amax = self.variable("quant", "amax",
                             lambda: jnp.zeros((), jnp.float32))
        return fake_quant_tensor(x, amax.value, spec.qmax)


def quant_weight(w: jnp.ndarray, spec: QuantSpec, path: str) -> jnp.ndarray:
    """Max-calibrated weight fake-quant (inline, stateless).

    Per-output-channel by default (pytorch-quantization parity for conv
    weights); per-tensor optional. Kernel layout HWIO -> channel axis -1.
    """
    if spec.mode != "quantize" or spec.excluded(path):
        return w
    if spec.per_channel_weights:
        amax = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True
                       ).astype(jnp.float32)
    else:
        amax = jnp.max(jnp.abs(w)).astype(jnp.float32)
    return fake_quant_tensor(w, amax, spec.qmax)


class QuantConv(nn.Module):
    """Conv with optional input/weight fake-quant.

    Param layout identical to ``nn.Conv`` (kernel HWIO named "kernel", bias
    "bias") so FP32 checkpoints load directly into the QAT model.
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = 0
    feature_group_count: int = 1
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    quant: QuantSpec | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1] // self.feature_group_count
        kshape = (kh, kw, in_ch, self.features)

        spec = self.quant or QuantSpec()
        path = "/".join(self.scope.path)
        quantized = spec.mode != "off" and not spec.excluded(path)
        int8_path = quantized and spec.mode in ("int8", "int8_fused")

        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))

        def conv(lhs, rhs, acc_dtype):
            return jax.lax.conv_general_dilated(
                lhs, rhs,
                window_strides=self.strides,
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count,
                preferred_element_type=acc_dtype,
            )

        if int8_path:
            # TRUE int8 engine path: int8 x int8 -> int32 on the MXU,
            # single rescale epilogue. Weights arrive pre-quantised
            # (quant.deploy.quantize_weights_int8): int8 kernel + f32
            # per-tensor scale.
            kernel_q = self.param("kernel", nn.initializers.zeros_init(),
                                  kshape, jnp.int8)
            # per-output-channel weight scales (broadcast over NHWC's C)
            w_scale = self.param("w_scale", nn.initializers.ones_init(),
                                 (self.features,), jnp.float32)
            if isinstance(x, QTensor):
                # fused chain: input already int8 at the producer's scale;
                # no in_q quantizer needed (or created)
                x_q, x_scale = x.q, x.scale
            elif spec.mode == "int8_fused":
                qt = ActQuant(spec, name="in_q")(x)
                x_q, x_scale = qt.q, qt.scale
            else:
                x_q, x_scale = ActQuant(spec, name="in_q")(x)
            y = conv(x_q, kernel_q, jnp.int32)
            y = y.astype(jnp.float32) * (x_scale * w_scale)
            if self.use_bias:
                bias = self.param("bias", self.bias_init, (self.features,),
                                  jnp.float32)
                y = y + bias
            # int8_fused: stay f32 so the downstream ReLU + requant chain
            # fuses into this conv's epilogue at full precision (the f32
            # never reaches HBM — the requantised int8 does)
            out_dtype = jnp.float32 if spec.mode == "int8_fused" else \
                self.dtype
            return y.astype(out_dtype)

        if isinstance(x, QTensor):
            # int8 -> float boundary: an excluded (full-precision) layer
            # consuming a fused-chain tensor (e.g. head_p2 reading the
            # quantized neck's P2 feature)
            x = x.dequant(self.dtype)

        kernel = self.param("kernel", self.kernel_init, kshape,
                            self.param_dtype)
        if quantized:
            x = ActQuant(spec, name="in_q")(x)
            kernel = quant_weight(kernel, spec, path)

        y = conv(x.astype(self.dtype), kernel.astype(self.dtype), self.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y
