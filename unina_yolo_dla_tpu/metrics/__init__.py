from .map import average_precision, compute_map
from .small_object import SmallObjectMetric

__all__ = ["SmallObjectMetric", "average_precision", "compute_map"]
