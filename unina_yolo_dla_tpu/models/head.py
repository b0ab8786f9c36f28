"""Decoupled anchor-free detection head, one per feature level.

Parity with ``/root/reference/unina_yolo_dla/model.py:274-303``: cls branch =
2x ConvBlock(3x3) + 1x1 conv -> ``num_classes``; reg branch = 2x ConvBlock +
1x1 conv -> 4 TLBR channels. ``num_anchors`` fixed at 1.

The final 1x1 convs carry a bias (torch Conv2d default) and emit raw logits;
the cls bias is initialised to a negative prior so the sigmoid starts near
p=0.01, which stabilises early training of the BCE loss.

The P2 head is on the quantisation exclusion list by default
(train.py:779-781) — its QuantConvs resolve to plain convs via the
QuantSpec path filter.
"""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..quant.fake_quant import QuantConv
from .blocks import ConvBlock
from .config import ModelConfig

# sigmoid(CLS_BIAS_INIT) ~= 0.01 prior
CLS_BIAS_INIT = -math.log((1 - 0.01) / 0.01)


class DetectionHead(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = self.config
        hidden = x.shape[-1]
        spec = cfg.quant
        quant_active = (spec is not None and spec.mode != "off"
                        and not spec.excluded("/".join(self.scope.path)))
        if getattr(cfg, "merged_head", False) and cfg.deploy \
                and not quant_active:
            return self._merged(x, cfg, hidden)
        fuse_on = cfg.fused_head and (cfg.fused_only is None
                                      or self.name in cfg.fused_only)
        if fuse_on and cfg.deploy and not quant_active:
            # one-VMEM-pass head (ops/pallas/head_kernel.py): both
            # branches' six convs in-register, x read once. Identical
            # param tree (holders mirror ConvBlock/QuantConv layouts).
            from ..ops.pallas.head_kernel import fused_head
            from .blocks import _DeployConvHolder, _DeployConvParams
            from ..quant.qtensor import QTensor

            if isinstance(x, QTensor):
                x = x.dequant(cfg.compute_dtype)
            h = x.shape[-1]
            cls_convs = [_DeployConvHolder((3, 3, h, h), name=n)()
                         for n in ("cls_conv1", "cls_conv2")]
            cls_pred = _DeployConvParams(
                (1, 1, h, cfg.num_classes * cfg.num_anchors),
                bias_init=nn.initializers.constant(CLS_BIAS_INIT),
                name="cls_pred")()
            reg_convs = [_DeployConvHolder((3, 3, h, h), name=n)()
                         for n in ("reg_conv1", "reg_conv2")]
            reg_pred = _DeployConvParams((1, 1, h, 4 * cfg.num_anchors),
                                         name="reg_pred")()
            return fused_head(
                x.astype(cfg.compute_dtype), cls_convs, cls_pred,
                reg_convs, reg_pred,
                use_pallas=None if cfg.fused_impl == "pallas" else False)
        kw: dict[str, Any] = dict(dtype=cfg.compute_dtype,
                                  param_dtype=cfg.param_dtype,
                                  quant=cfg.quant,
                                  deploy=cfg.deploy)
        # prediction convs have no BN, so no deploy transform applies
        conv_kw = {k: v for k, v in kw.items() if k != "deploy"}

        cls = ConvBlock(hidden, 3, name="cls_conv1", **kw)(x, train)
        cls = ConvBlock(hidden, 3, name="cls_conv2", **kw)(cls, train)
        cls = QuantConv(
            cfg.num_classes * cfg.num_anchors, (1, 1), use_bias=True,
            bias_init=nn.initializers.constant(CLS_BIAS_INIT),
            name="cls_pred", **conv_kw)(cls)

        reg = ConvBlock(hidden, 3, name="reg_conv1", **kw)(x, train)
        reg = ConvBlock(hidden, 3, name="reg_conv2", **kw)(reg, train)
        reg = QuantConv(4 * cfg.num_anchors, (1, 1), use_bias=True,
                        name="reg_pred", **conv_kw)(reg)

        # Logits in float32 for numerically stable loss/decode.
        return cls.astype(jnp.float32), reg.astype(jnp.float32)

    def _merged(self, x: jnp.ndarray, cfg: ModelConfig, hidden: int):
        """Branch-merged deploy form (``cfg.merged_head``): exact math.

        The decoupled branches share their input, so
        ``conv(x,Wc) || conv(x,Wr) == conv(x, Wc||Wr)`` (channel concat)
        and the per-branch follow-ups are a block-diagonal conv over the
        doubled channel dim — two half-lane (N=64) MXU passes become one
        full-lane (N=128) pass and every activation is read once.
        Outputs match the standard head to accumulation-order rounding
        (~5e-7 on f32 logits; the zero blocks add exact zeros but a
        K=2h reduction tree may round differently than K=h). The
        param tree is IDENTICAL to the standard head (merge happens in
        the forward; baked-weight exports constant-fold it), so any
        folded checkpoint loads either way. Float-path levels only —
        quantized branches carry per-branch out_q scales a merged tensor
        cannot represent (config.py merged_head note).
        """
        import jax

        from ..quant.qtensor import QTensor
        from .blocks import _DeployConvHolder, _DeployConvParams

        if isinstance(x, QTensor):
            x = x.dequant(cfg.compute_dtype)
        h = hidden
        nc = cfg.num_classes * cfg.num_anchors
        nr = 4 * cfg.num_anchors
        ck1, cb1 = _DeployConvHolder((3, 3, h, h), name="cls_conv1")()
        ck2, cb2 = _DeployConvHolder((3, 3, h, h), name="cls_conv2")()
        ckp, cbp = _DeployConvParams(
            (1, 1, h, nc), bias_init=nn.initializers.constant(CLS_BIAS_INIT),
            name="cls_pred")()
        rk1, rb1 = _DeployConvHolder((3, 3, h, h), name="reg_conv1")()
        rk2, rb2 = _DeployConvHolder((3, 3, h, h), name="reg_conv2")()
        rkp, rbp = _DeployConvParams((1, 1, h, nr), name="reg_pred")()

        z33 = jnp.zeros((3, 3, h, h), jnp.float32)
        k1 = jnp.concatenate([ck1, rk1], axis=-1)              # (3,3,h,2h)
        b1 = jnp.concatenate([cb1, rb1])
        k2 = jnp.concatenate([                                 # (3,3,2h,2h)
            jnp.concatenate([ck2, z33], axis=-1),
            jnp.concatenate([z33, rk2], axis=-1)], axis=2)
        b2 = jnp.concatenate([cb2, rb2])
        kp = jnp.concatenate([                                 # (1,1,2h,nc+4)
            jnp.concatenate([ckp, jnp.zeros((1, 1, h, nr), jnp.float32)],
                            axis=-1),
            jnp.concatenate([jnp.zeros((1, 1, h, nc), jnp.float32), rkp],
                            axis=-1)], axis=2)
        bp = jnp.concatenate([cbp, rbp])

        dt = cfg.compute_dtype

        def conv(v, k, pad):
            return jax.lax.conv_general_dilated(
                v, k.astype(dt), window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt)

        y = nn.relu(conv(x.astype(dt), k1, 1) + b1.astype(dt))
        y = nn.relu(conv(y, k2, 1) + b2.astype(dt))
        y = conv(y, kp, 0) + bp.astype(dt)
        return (y[..., :nc].astype(jnp.float32),
                y[..., nc:].astype(jnp.float32))
