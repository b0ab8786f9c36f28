from .boxes import (
    box_area,
    box_ciou,
    box_iou,
    pairwise_iou,
    xywh_to_xyxy,
    xyxy_to_xywh,
)

__all__ = [
    "box_area", "box_ciou", "box_iou", "pairwise_iou",
    "xywh_to_xyxy", "xyxy_to_xywh",
]
