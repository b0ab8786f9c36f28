from .decode_kernel import decode_level_pallas
from .nms_kernel import nms_pallas
from .preprocess_kernel import normalize_pallas

__all__ = ["decode_level_pallas", "nms_pallas", "normalize_pallas"]
