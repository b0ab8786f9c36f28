"""Full UNINA-YOLO-DLA detector: backbone + FPN/PAN neck + 3 decoupled heads.

Parity with ``/root/reference/unina_yolo_dla/model.py:308-386``. Forward
returns ``[(p2_cls, p2_reg), (p3_cls, p3_reg), (p4_cls, p4_reg)]`` with NHWC
shapes ``(B, 160, 160, nc)/(B, 160, 160, 4)`` etc. at 640 input.

The model is a pure function of (params, batch_stats, x) — jit/pjit/vmap
compose directly; quantized twins reuse the identical module tree so the
FP32 -> QAT handoff is a pytree copy, not name surgery (the reference's
qat.py:521-673 name-normalising porter is unnecessary here).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbone import Backbone
from .config import ModelConfig
from .head import DetectionHead
from .neck import Neck


class UninaYoloDla(nn.Module):
    """YOLOv11-inspired, ReLU-only, P2/P3/P4 anchor-free detector."""

    config: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = self.config
        x = x.astype(cfg.compute_dtype)
        feats = Backbone(cfg, name="backbone")(x, train)
        neck_feats = Neck(cfg, name="neck")(feats, train)
        p2 = DetectionHead(cfg, name="head_p2")(neck_feats[0], train)
        p3 = DetectionHead(cfg, name="head_p3")(neck_feats[1], train)
        p4 = DetectionHead(cfg, name="head_p4")(neck_feats[2], train)
        return [p2, p3, p4]


def create_model(config: ModelConfig | None = None) -> UninaYoloDla:
    return UninaYoloDla(config or ModelConfig())


def init_model(
    rng: jax.Array,
    config: ModelConfig | None = None,
    batch_size: int = 1,
) -> tuple[UninaYoloDla, dict[str, Any]]:
    """Initialise model variables ({'params', 'batch_stats'})."""
    config = config or ModelConfig()
    model = UninaYoloDla(config)
    dummy = jnp.zeros(
        (batch_size, config.input_size, config.input_size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return model, variables


def param_count(variables: dict[str, Any]) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(variables["params"]))
