"""Corruption/robustness suite for engine-quality stress testing.

The reference's acceptance bar — int8 within 1 pt of FP32 on the
small-object mission (``/root/reference/README.md:19,34``) — is only
meaningful where engines can actually diverge. Quantised engines
typically break first under input corruption (blur/noise push
activations into poorly-calibrated ranges), so
``tools/compare_engines.py --corruptions`` evaluates every engine under
the conditions below and reports the FP32-vs-int8 delta per condition
(ImageNet-C-style protocol, applied to the letterboxed uint8 frames the
engines actually consume).

All transforms are uint8 (H, W, 3) -> uint8 (H, W, 3), severity 1-3.
cv2 is used the same way the synthetic generator uses it (IO/codec);
the arithmetic corruptions are plain numpy.
"""
from __future__ import annotations

from typing import Callable

import numpy as np


def gaussian_blur(img: np.ndarray, severity: int,
                  rng: np.random.Generator | None = None) -> np.ndarray:
    import cv2

    sigma = {1: 1.0, 2: 2.0, 3: 4.0}[severity]
    return cv2.GaussianBlur(img, ksize=(0, 0), sigmaX=sigma)


def gaussian_noise(img: np.ndarray, severity: int,
                   rng: np.random.Generator | None = None) -> np.ndarray:
    rng = rng or np.random.default_rng(0)
    sigma = {1: 8.0, 2: 18.0, 3: 32.0}[severity]
    noisy = img.astype(np.float32) + rng.normal(0, sigma, img.shape)
    return np.clip(noisy, 0, 255).astype(np.uint8)


def low_light(img: np.ndarray, severity: int,
              rng: np.random.Generator | None = None) -> np.ndarray:
    """Brightness reduction + sensor-noise floor (dusk/indoor)."""
    rng = rng or np.random.default_rng(0)
    gain = {1: 0.6, 2: 0.4, 3: 0.25}[severity]
    dark = img.astype(np.float32) * gain
    dark += rng.normal(0, 4.0, img.shape)  # read noise dominates when dark
    return np.clip(dark, 0, 255).astype(np.uint8)


def overexposure(img: np.ndarray, severity: int,
                 rng: np.random.Generator | None = None) -> np.ndarray:
    gain = {1: 1.4, 2: 1.8, 3: 2.4}[severity]
    return np.clip(img.astype(np.float32) * gain, 0, 255).astype(np.uint8)


def jpeg_compression(img: np.ndarray, severity: int,
                     rng: np.random.Generator | None = None) -> np.ndarray:
    import cv2

    quality = {1: 40, 2: 20, 3: 10}[severity]
    # engines consume RGB; cv2's codec is BGR — convert both ways so the
    # chroma subsampling hits the channels the way a real camera ISP would
    ok, enc = cv2.imencode(".jpg", img[..., ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, quality])
    if not ok:
        return img
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]


CORRUPTIONS: dict[str, Callable] = {
    "gaussian_blur": gaussian_blur,
    "gaussian_noise": gaussian_noise,
    "low_light": low_light,
    "overexposure": overexposure,
    "jpeg": jpeg_compression,
}


def maybe_corrupt(rng: np.random.Generator, img: np.ndarray, p: float,
                  severities: tuple[int, ...] = (1, 2)) -> np.ndarray:
    """With probability ``p``, apply one random corruption at a random
    severity — the QAT corruption-augmentation primitive
    (``train --qat-corruption-aug P``).

    Round-3 measured the int8 engine losing 4.8 mAP / 10.2 small-F1 pts
    vs FP32 under blur and 2.4/9.1 under low light (RESULTS.md): clean
    calibration leaves low-contrast activation ranges poorly covered, so
    quantisation clips exactly the regime where small objects are
    faintest. Mixing corrupted frames into phase-2 calibration AND the
    QAT fine-tune batches widens the calibrated ranges and lets the
    fine-tune adapt the weights to them. Severities default to (1, 2) —
    severity 3 destroys the small-object signal outright for FP32 too.
    """
    if p <= 0 or rng.uniform() >= p:
        return img
    name = list(CORRUPTIONS)[int(rng.integers(len(CORRUPTIONS)))]
    sev = int(severities[int(rng.integers(len(severities)))])
    return CORRUPTIONS[name](img, sev, rng)


def corrupt_batches(batches_fn, name: str, severity: int, seed: int = 0):
    """Wrap a batches_fn so every image is corrupted deterministically.

    Returns a new zero-arg callable (the evaluate_model contract).
    """
    fn = CORRUPTIONS[name]

    def gen():
        rng = np.random.default_rng(seed)
        for batch in batches_fn():
            batch = dict(batch)
            imgs = batch["images"].copy()
            for i in range(len(imgs)):
                imgs[i] = fn(imgs[i], severity, rng)
            batch["images"] = imgs
            yield batch

    return gen
