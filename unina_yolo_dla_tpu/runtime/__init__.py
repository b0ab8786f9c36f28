from .pipeline import build_serving_fn

__all__ = ["build_serving_fn"]
