from .augment import augment_sample, hflip, hsv_jitter, mixup, mosaic4
from .dataset import (
    YoloDataset,
    batch_iterator,
    load_dataset_yaml,
    load_difficulty_weights,
    normalize_images,
)
from .synthetic import SynthConfig, generate_dataset, generate_image, validate_labels

__all__ = [
    "YoloDataset", "batch_iterator", "load_dataset_yaml",
    "load_difficulty_weights", "normalize_images",
    "augment_sample", "hflip", "hsv_jitter", "mixup", "mosaic4",
    "SynthConfig", "generate_dataset", "generate_image", "validate_labels",
]
