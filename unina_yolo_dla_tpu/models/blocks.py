"""Core building blocks: ConvBlock, Bottleneck, C3k2, SPPF, nearest Upsample.

Behavioural parity with the reference blocks
(``/root/reference/unina_yolo_dla/model.py:23-147``) but written TPU-first:

- NHWC layout (TPU conv-native; NCHW forces transposes on TPU).
- ReLU-only activations (the reference's DLA constraint happens to also be
  the cheapest VPU activation — kept for weight-compat and parity).
- bfloat16 compute / float32 params & batch-norm statistics.
- Convs carry no bias (BatchNorm folds it), matching the reference.
- Every block threads an optional ``QuantSpec`` for int8 QAT — the
  quantized twin model (reference qat.py:225-345) is the SAME module tree
  with quantizers switched on, so FP32->QAT weight transfer is a no-op.

Every block is a plain ``flax.linen.Module``; XLA fuses BN+ReLU into the
conv epilogue on TPU, so there is no hand-fused conv kernel here — the MXU
path is already optimal through lax.conv_general_dilated.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..quant.fake_quant import ActQuant, QuantConv, QuantSpec
from ..quant.qtensor import QTensor, qconcat, qmaxpool, upsample_nearest_2x_q

# Modes in which ConvBlock appends an output quantizer: the calib modes
# collect post-ReLU stats for it, int8_fused reads the calibrated amax to
# requantise. QAT ("quantize") deliberately has NO output fake-quant —
# pytorch-quantization's QuantConv2d quantises input+weight only, and QAT
# parity with the reference is the contract (qat.py:225-258).
_OUT_Q_MODES = ("calib_max", "calib_hist", "int8_fused")


def concat_features(xs, axis: int = -1):
    """Concat that keeps a fused int8 chain int8 (scale-matched), falling
    back to float concat otherwise."""
    if all(isinstance(x, QTensor) for x in xs):
        return qconcat(list(xs), axis=axis)
    xs = [x.dequant() if isinstance(x, QTensor) else x for x in xs]
    return jnp.concatenate(xs, axis=axis)


class ShiftDot2x2(nn.Module):
    """2x2 stride-1 pad-((1,0),(1,0)) conv as shifted slices + ONE matmul.

    The space-to-depth stem's conv. ``lax.conv_general_dilated`` at small
    input channel counts lowers through internal layout-copy machinery
    that costs 0.13-0.30 ms/frame on v5e regardless of formulation
    (NHWC/NCHW/u8/f32 all measured, `tools/stem_probe.py`); the same math
    as four stride-1 shifted slices concatenated to (H*W, 4C) and one
    MXU dot measures 0.034 ms. Param layout identical to ``nn.Conv``
    (kernel (2,2,C,O) "kernel", bias "bias") so
    ``quant.deploy.fold_stem_space_to_depth`` weights load unchanged.
    """

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, c, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype)
        h, w = x.shape[-3], x.shape[-2]
        lead = x.shape[:-3]
        xp = jnp.pad(x.astype(self.dtype),
                     [(0, 0)] * len(lead) + [(1, 0), (1, 0), (0, 0)])
        # (kh, kw) slice order matches kernel.reshape(4c, O) row-major
        parts = [xp[..., kh:kh + h, kw:kw + w, :]
                 for kh in range(2) for kw in range(2)]
        patches = jnp.concatenate(parts, axis=-1).reshape(-1, 4 * c)
        y = jax.lax.dot_general(
            patches, kernel.astype(self.dtype).reshape(4 * c, self.features),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y = y + bias.astype(jnp.float32)
        return y.reshape(*lead, h, w, self.features).astype(self.dtype)


class _MergedShiftDotConv(nn.Module):
    """Param holder for the fused merged-layout downsample: the kernel
    stays in the BLOCKED (2,2,4C,O) layout ``fold_downsample_space_to_
    depth`` produces (loads unchanged); the kw-packing the kernel wants
    is a pure weight transpose done at trace time (constant-folded in
    weights-baked artifacts)."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas.stage1_kernel import fused_downsample_merged

        cm = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, 2 * cm, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype)
        return fused_downsample_merged(x.astype(self.dtype), kernel, bias)


class MergedDownsample(nn.Module):
    """stage1_conv in the s2d_merged engine: consumes the column-merged
    stem output, emits the standard (H/2, W2, O) layout; conv + bias +
    ReLU fused in one VMEM pass (``ops/pallas/stage1_kernel.py``).
    Deploy-graph only; the layer is quant-excluded (DEFAULT_EXCLUDE), so
    this composes with the int8 engine unchanged."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # ReLU lives inside the fused kernel's epilogue
        return _MergedShiftDotConv(self.features, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="conv")(x)


class ConvBlock(nn.Module):
    """Conv(no-bias) + BatchNorm + ReLU (reference model.py:23-50).

    With quantisation on, the conv input and weight are fake-quantised
    (QuantConvBlock parity, qat.py:225-258).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    quant: QuantSpec | None = None
    deploy: bool = False   # BN pre-folded into conv (quant.deploy)
    # explicit padding override (((t,b),(l,r))); None = kernel_size // 2
    # symmetric. The space-to-depth stem needs the asymmetric ((1,0),(1,0)).
    padding: Any = None
    # lower the conv through ShiftDot2x2 (s2d stem only; the layer must
    # be quant-excluded — the stem is, via DEFAULT_EXCLUDE)
    shift_dot: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.shift_dot:
            assert self.kernel_size == 2 and self.strides == 1 and self.deploy
            x = ShiftDot2x2(self.features, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="conv")(x)
        else:
            x = QuantConv(
                self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.strides, self.strides),
                padding=(self.padding if self.padding is not None
                         else self.kernel_size // 2),
                feature_group_count=self.groups,
                use_bias=self.deploy,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                quant=self.quant,
                name="conv",
            )(x)
        if not self.deploy:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch BatchNorm2d default (momentum=0.1) eqv
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="bn",
            )(x)
        x = nn.relu(x)
        spec = self.quant
        if (spec is not None and spec.mode in _OUT_Q_MODES
                and not spec.excluded("/".join(self.scope.path))):
            # calib: collect post-ReLU output stats; int8_fused: requantise
            # to the calibrated output amax -> the block emits int8
            x = ActQuant(spec, name="out_q")(x)
        return x


class Bottleneck(nn.Module):
    """1x1 -> 3x3 with optional residual (reference model.py:53-73).

    The residual identity branch gets its own activation quantizer so the
    int8 add sees matched scales (parity: qat.py:281-294).
    """

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    quant: QuantSpec | None = None
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.features * self.expansion)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant, deploy=self.deploy)
        out = ConvBlock(hidden, 1, name="cv1", **kw)(x, train)
        out = ConvBlock(self.features, 3, name="cv2", **kw)(out, train)
        if self.shortcut and x.shape[-1] == self.features:
            spec = self.quant
            if isinstance(out, QTensor) and isinstance(x, QTensor):
                # fused engine: add on the VPU in f32 (both operands
                # dequantise in-register), requantise the sum to the
                # calibrated add_q amax -> int8 out
                s = out.dequant(jnp.float32) + x.dequant(jnp.float32)
                out = ActQuant(spec, name="add_q")(s)
            else:
                # residual quantizer for QAT/calibration (int8-add scale
                # matching, qat.py:281-294); in the unfused int8 engine the
                # add itself stays float on the VPU, so no quantizer there
                if spec is not None and spec.mode in (
                        "calib_max", "calib_hist", "quantize"):
                    x = ActQuant(spec, name="residual_q")(x)
                out = x + out
                if spec is not None and spec.mode in (
                        "calib_max", "calib_hist"):
                    # collect add-output stats for the fused engine's add_q
                    out = ActQuant(spec, name="add_q")(out)
        return out


class _DeployConvParams(nn.Module):
    """Param twin of a deploy-mode ConvBlock's float path: the same
    ``kernel``/``bias`` names, shapes, dtypes and initialisers QuantConv
    declares, so folded checkpoints load into the fused block unchanged."""

    kshape: tuple[int, ...]
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.kshape, jnp.float32)
        b = self.param("bias", self.bias_init,
                       (self.kshape[-1],), jnp.float32)
        return k, b


class _DeployConvHolder(nn.Module):
    """The ConvBlock name level (``<name>/conv/kernel``)."""

    kshape: tuple[int, ...]

    @nn.compact
    def __call__(self):
        return _DeployConvParams(self.kshape, name="conv")()


class _BottleneckParams(nn.Module):
    """The Bottleneck name level (``bottleneck_i/cv{1,2}/conv/kernel``)."""

    hidden: int

    @nn.compact
    def __call__(self):
        c1 = _DeployConvHolder((1, 1, self.hidden, self.hidden),
                               name="cv1")()
        c2 = _DeployConvHolder((3, 3, self.hidden, self.hidden),
                               name="cv2")()
        return c1, c2


class C3k2(nn.Module):
    """Cross-Stage-Partial block, split-process-concat form.

    Two 1x1 projections to ``features//2``; one path runs ``n`` bottlenecks
    (expansion 1.0), concat, 1x1 out conv (reference model.py:76-110).

    ``fused=True`` (deploy graphs, float path only): the whole block runs
    as ONE VMEM pass (``ops/pallas/c3k2_kernel.py``) instead of ~5 HBM
    round-trips — XLA fuses into conv epilogues but never ACROSS convs.
    The param tree is identical, so folded weights load either way. In the
    int8 engine this covers exactly the PERF_EXCLUDE C3k2s (the 160^2
    movement-bound blocks that stay bf16); quantized chains keep the
    standard per-conv path, whose int8 epilogues XLA already fuses.
    """

    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    quant: QuantSpec | None = None
    deploy: bool = False
    fused: bool = False
    # "pallas" -> per-platform primitive (Pallas kernel on tpu);
    # "xla" -> the identical-math XLA form inline (measured faster on
    # the fc subgraphs, tools/c3k2_probe.py r4 — see ModelConfig).
    fused_impl: str = "pallas"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, *,
                 x2: jnp.ndarray | None = None,
                 up_x: bool = False) -> jnp.ndarray:
        """``x2``/``up_x`` express the neck's fusion pattern
        ``C3k2(concat([upsample2x?(x), x2]))`` INSIDE the block, so the
        fused kernel can fold the upsample and the concat into its first
        dots (``fused_c3k2_cat``); the standard path reproduces the
        original concat/upsample ops exactly — the variable tree is
        identical either way (upsample/concat carry no params)."""
        hidden = int(self.features * self.expansion)
        spec = self.quant
        quant_active = (spec is not None and spec.mode != "off"
                        and not spec.excluded("/".join(self.scope.path)))
        if self.fused and self.deploy and not quant_active:
            from ..ops.pallas.c3k2_kernel import fused_c3k2, fused_c3k2_cat

            deq = lambda t: (t.dequant(self.dtype)  # noqa: E731
                             if isinstance(t, QTensor)
                             else t.astype(self.dtype))
            # int8 -> float boundary, as QuantConv does for excluded
            # layers consuming a fused-chain tensor
            x = deq(x)
            cin = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
            cv1 = _DeployConvHolder((1, 1, cin, hidden), name="cv1")()
            bns = [_BottleneckParams(hidden, name=f"bottleneck_{i}")()
                   for i in range(self.n)]
            cv2 = _DeployConvHolder((1, 1, cin, hidden), name="cv2")()
            cv3 = _DeployConvHolder((1, 1, 2 * hidden, self.features),
                                    name="cv3")()
            # None selects the per-platform primitive (Pallas on tpu);
            # False inlines the XLA form directly (lowers everywhere)
            up = None if self.fused_impl == "pallas" else False
            if x2 is not None:
                return fused_c3k2_cat(x, deq(x2), cv1, cv2, cv3, bns,
                                      shortcut=self.shortcut,
                                      upsample_a=up_x, use_pallas=up)
            return fused_c3k2(x, cv1, cv2, cv3, bns,
                              shortcut=self.shortcut, use_pallas=up)
        if x2 is not None:
            x = upsample_nearest_2x(x) if up_x else x
            x = concat_features([x, x2])
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant, deploy=self.deploy)
        path1 = ConvBlock(hidden, 1, name="cv1", **kw)(x, train)
        for i in range(self.n):
            path1 = Bottleneck(hidden, self.shortcut, expansion=1.0,
                               name=f"bottleneck_{i}", **kw)(path1, train)
        path2 = ConvBlock(hidden, 1, name="cv2", **kw)(x, train)
        merged = concat_features([path1, path2])
        return ConvBlock(self.features, 1, name="cv3", **kw)(merged, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): three chained 5x5 stride-1 maxpools
    (reference model.py:113-132, SPPF_DLA)."""

    features: int
    pool_size: int = 5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    quant: QuantSpec | None = None
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        hidden = in_ch // 2
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant=self.quant, deploy=self.deploy)
        x = ConvBlock(hidden, 1, name="cv1", **kw)(x, train)
        k = self.pool_size
        if isinstance(x, QTensor):
            # max is monotone: pool on int8 directly, scale unchanged — the
            # concat below sees four tensors at literally the same amax
            # tracer, so qconcat skips every rescale
            pool = lambda t: qmaxpool(t, k)  # noqa: E731
        else:
            pad = k // 2
            pool = lambda t: nn.max_pool(  # noqa: E731
                t, window_shape=(k, k), strides=(1, 1),
                padding=((pad, pad), (pad, pad)))
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        merged = concat_features([x, y1, y2, y3])
        return ConvBlock(self.features, 1, name="cv2", **kw)(merged, train)


def upsample_nearest_2x(x) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (reference model.py:135-147).

    Implemented as reshape+broadcast — XLA lowers this to a cheap layout op,
    unlike generic ``jax.image.resize`` which builds a gather. Int8 fused
    tensors upsample as int8 (pure layout, scale-preserving).
    """
    if isinstance(x, QTensor):
        return upsample_nearest_2x_q(x)
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
