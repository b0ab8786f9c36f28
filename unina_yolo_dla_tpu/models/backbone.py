"""CSP-Darknet backbone emitting P2 (s4), P3 (s8), P4 (s16) + SPPF(P4).

Parity with ``/root/reference/unina_yolo_dla/model.py:152-219``: no P5 stage
(stride 32 is too coarse for 10-15 px cones), ``lite_p2`` swaps the P2 C3k2
for a plain conv (the reference's DLA-CBUF escape hatch; on TPU it trims the
160x160 stage's VMEM/HBM traffic), widths ``base_channels * {1,2,4,8,16}``.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import C3k2, ConvBlock, MergedDownsample, SPPF
from .config import ModelConfig


class Backbone(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = self.config
        c1, c2, c3, c4, _c5 = cfg.widths
        kw: dict[str, Any] = dict(dtype=cfg.compute_dtype,
                                  param_dtype=cfg.param_dtype,
                                  quant=cfg.quant,
                                  deploy=cfg.deploy)
        def ckw(name: str) -> dict[str, Any]:
            # per-block fusion gate (cfg.fused_only; see config.py)
            on = cfg.fused_c3k2 and (cfg.fused_only is None
                                     or name in cfg.fused_only)
            return dict(kw, fused=on, fused_impl=cfg.fused_impl, name=name)

        # Stem: (B,640,640,3) -> (B,320,320,c1)
        if cfg.s2d_merged and cfg.fused_stem:
            # batched-regime engine: stem + stage1 in ONE Pallas VMEM
            # pass over the merged frame (ops/pallas/stem_kernel.py) —
            # same param tree as the stem ConvBlock + MergedDownsample
            # it replaces, so merged checkpoints load either way.
            from ..ops.pallas.stem_kernel import fused_stem_stage1
            from .blocks import _DeployConvHolder

            cm = x.shape[-1]
            ks, bs = _DeployConvHolder((2, 2, cm, 2 * c1), name="stem")()
            k1, b1 = _DeployConvHolder((2, 2, 4 * c1, c2),
                                       name="stage1_conv")()
            x = fused_stem_stage1(x.astype(cfg.compute_dtype),
                                  ks, bs, k1, b1)
            if cfg.lite_p2:
                p2 = ConvBlock(c2, 3, name="stage1_block", **kw)(x, train)
            else:
                p2 = C3k2(c2, n=1, **ckw("stage1_block"))(x, train)
            x = ConvBlock(c3, 3, strides=2, name="stage2_conv",
                          **kw)(p2, train)
            p3 = C3k2(c3, n=2, **ckw("stage2_c3k2"))(x, train)
            x = ConvBlock(c4, 3, strides=2, name="stage3_conv",
                          **kw)(p3, train)
            p4 = C3k2(c4, n=2, **ckw("stage3_c3k2"))(x, train)
            p4_sppf = SPPF(c4, name="sppf", **kw)(p4, train)
            return p2, p3, p4, p4_sppf
        if cfg.stem_s2d:
            # deploy-graph space-to-depth stem: same math, zero C=3 layout
            # copies (weights from quant.deploy.fold_stem_space_to_depth;
            # derivation + measurement in that docstring / RESULTS.md).
            # s2d_host: the input arrives ALREADY blocked (S/2,S/2,12) —
            # the shuffle runs on the host, where it is free inside the
            # staging pass; on-device it costs more than it saves in
            # every measured formulation. The blocked conv lowers through
            # ShiftDot2x2 (one MXU dot), not lax.conv — 8x faster
            # (tools/stem_probe.py, RESULTS.md round 3).
            if not cfg.s2d_host:
                from ..ops.preprocess import space_to_depth

                x = space_to_depth(x, 2)
            # s2d_merged: the input arrives as the SAME bytes viewed
            # (S/2, S/4, 24) and the stem matmul emits merged columns
            # directly — 2*c1 output lanes, weights from
            # quant.deploy.merge_stem_columns. Same ShiftDot lowering.
            stem_feats = 2 * c1 if cfg.s2d_merged else c1
            x = ConvBlock(stem_feats, 2, strides=1, padding=((1, 0), (1, 0)),
                          name="stem", shift_dot=True, **kw)(x, train)
        else:
            x = ConvBlock(c1, 3, strides=2, name="stem", **kw)(x, train)

        # Stage 1 -> P2 (stride 4, 160x160)
        if cfg.s2d_merged:
            # fused merged-layout downsample: s2d shuffle + shift-dot +
            # bias + ReLU in ONE VMEM pass (ops/pallas/stage1_kernel.py)
            # on the merged stem output — replaces the 5-HBM-pass
            # space_to_depth_rt + ShiftDot2x2 chain below
            x = MergedDownsample(c2, dtype=cfg.compute_dtype,
                                 param_dtype=cfg.param_dtype,
                                 name="stage1_conv")(x, train)
        elif cfg.stage1_s2d:
            # blocked downsample (deploy graphs): reshape-transpose s2d
            # of the bf16 C=32 stem output + one contraction-128 matmul —
            # 2.7x the lax.conv lowering (tools/stage1_probe.py; weights
            # from quant.deploy.fold_downsample_space_to_depth)
            from ..ops.preprocess import space_to_depth_rt

            x = space_to_depth_rt(x, 2)
            x = ConvBlock(c2, 2, strides=1, padding=((1, 0), (1, 0)),
                          name="stage1_conv", shift_dot=True, **kw)(x, train)
        else:
            x = ConvBlock(c2, 3, strides=2, name="stage1_conv",
                          **kw)(x, train)
        if cfg.lite_p2:
            p2 = ConvBlock(c2, 3, name="stage1_block", **kw)(x, train)
        else:
            p2 = C3k2(c2, n=1, **ckw("stage1_block"))(x, train)

        # Stage 2 -> P3 (stride 8, 80x80)
        x = ConvBlock(c3, 3, strides=2, name="stage2_conv", **kw)(p2, train)
        p3 = C3k2(c3, n=2, **ckw("stage2_c3k2"))(x, train)

        # Stage 3 -> P4 (stride 16, 40x40)
        x = ConvBlock(c4, 3, strides=2, name="stage3_conv", **kw)(p3, train)
        p4 = C3k2(c4, n=2, **ckw("stage3_c3k2"))(x, train)

        # SPPF context on top of P4 (reference model.py:200-201)
        p4_sppf = SPPF(c4, name="sppf", **kw)(p4, train)

        return p2, p3, p4, p4_sppf
