from .blocks import C3k2, Bottleneck, ConvBlock, SPPF, upsample_nearest_2x
from .config import (
    DEFAULT_CLASS_NAMES,
    DEFAULT_CONF_THRESHOLD,
    DEFAULT_CP_Q,
    DEFAULT_IOU_THRESHOLD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    MAX_DETECTIONS,
    ModelConfig,
)
from .detector import UninaYoloDla, create_model, init_model, param_count

__all__ = [
    "C3k2", "Bottleneck", "ConvBlock", "SPPF", "upsample_nearest_2x",
    "ModelConfig", "UninaYoloDla", "create_model", "init_model", "param_count",
    "DEFAULT_CLASS_NAMES", "DEFAULT_CONF_THRESHOLD", "DEFAULT_CP_Q",
    "DEFAULT_IOU_THRESHOLD", "IMAGENET_MEAN", "IMAGENET_STD", "MAX_DETECTIONS",
]
