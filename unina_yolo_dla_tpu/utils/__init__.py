from .boxes import (
    box_area,
    box_ciou,
    box_iou,
    pairwise_iou,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from .checkpoint import (
    CheckpointManager,
    load_msgpack,
    load_msgpack_raw,
    save_msgpack,
)
from .profiling import Timer, annotate, trace

__all__ = [
    "box_area", "box_ciou", "box_iou", "pairwise_iou",
    "xywh_to_xyxy", "xyxy_to_xywh",
    "CheckpointManager", "load_msgpack", "load_msgpack_raw", "save_msgpack",
    "Timer", "annotate", "trace",
]
