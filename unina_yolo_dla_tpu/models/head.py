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
