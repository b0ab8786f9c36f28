from .small_object import SmallObjectMetric

__all__ = ["SmallObjectMetric"]
