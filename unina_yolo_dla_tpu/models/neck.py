"""FPN top-down + PAN bottom-up neck over P2/P3/P4.

Parity with ``/root/reference/unina_yolo_dla/model.py:224-269``: lateral 1x1
convs, nearest 2x upsample, concat fusion, strided-conv downsampling.
"""
from __future__ import annotations

from typing import Any


from flax import linen as nn

from .blocks import C3k2, ConvBlock
from .config import ModelConfig


class Neck(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, features, train: bool = False):
        cfg = self.config
        _c1, c2, c3, c4, _c5 = cfg.widths
        kw: dict[str, Any] = dict(dtype=cfg.compute_dtype,
                                  param_dtype=cfg.param_dtype,
                                  quant=cfg.quant,
                                  deploy=cfg.deploy)
        def ckw(name: str) -> dict[str, Any]:
            # per-block fusion gate (cfg.fused_only; see config.py)
            on = cfg.fused_c3k2 and (cfg.fused_only is None
                                     or name in cfg.fused_only)
            return dict(kw, fused=on, fused_impl=cfg.fused_impl, name=name)

        p2_in, p3_in, p4_in, p4_sppf = features

        # The upsample+concat fusion pattern is expressed THROUGH C3k2
        # (x2/up_x) so the fused kernel can fold both into its first dots
        # (ops/pallas/c3k2_kernel.py fused_c3k2_cat); the standard path
        # reproduces the same upsample/concat ops, identical param tree.

        # --- Top-down (FPN) ---
        p4_lat = ConvBlock(c3, 1, name="lateral_p3", **kw)(p4_sppf, train)
        p3_fused = C3k2(c3, n=1, **ckw("fpn_c3k2_1"))(
            p4_lat, train, x2=p3_in, up_x=True)  # 40 -> 80

        p3_lat = ConvBlock(c2, 1, name="lateral_p2", **kw)(p3_fused, train)
        p2_fused = C3k2(c2, n=1, **ckw("fpn_c3k2_2"))(
            p3_lat, train, x2=p2_in, up_x=True)  # 80 -> 160

        # --- Bottom-up (PAN) ---
        p2_down = ConvBlock(c2, 3, strides=2, name="down1", **kw)(p2_fused, train)
        p3_out = C3k2(c3, n=1, **ckw("pan_c3k2_1"))(
            p2_down, train, x2=p3_fused)

        p3_down = ConvBlock(c3, 3, strides=2, name="down2", **kw)(p3_out, train)
        p4_out = C3k2(c4, n=1, **ckw("pan_c3k2_2"))(
            p3_down, train, x2=p4_in)

        return p2_fused, p3_out, p4_out
