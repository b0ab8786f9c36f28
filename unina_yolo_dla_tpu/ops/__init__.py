from .decode import Detections, decode_level, decode_outputs
from .nms import nms, nms_fast, nms_reference
from .preprocess import (
    letterbox,
    normalize,
    nv12_to_rgb,
    preprocess_bgra,
    preprocess_rgb,
    resize_bilinear,
)

__all__ = [
    "Detections", "decode_level", "decode_outputs", "nms", "nms_fast", "nms_reference",
    "letterbox", "normalize", "nv12_to_rgb", "preprocess_bgra",
    "preprocess_rgb", "resize_bilinear",
]
