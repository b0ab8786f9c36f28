"""Preprocess oracle tests: bilinear parity with the CUDA kernel math."""
import jax.numpy as jnp
import numpy as np

from unina_yolo_dla_tpu.models import IMAGENET_MEAN, IMAGENET_STD
from unina_yolo_dla_tpu.ops import (
    letterbox,
    normalize,
    nv12_to_rgb,
    preprocess_bgra,
    preprocess_rgb,
    resize_bilinear,
)


def scalar_resize(img, dst_h, dst_w):
    """Straight port of resize_bgra_to_rgb_normalize_kernel coordinate math."""
    src_h, src_w, c = img.shape
    out = np.zeros((dst_h, dst_w, c), np.float32)
    sy, sx = src_h / dst_h, src_w / dst_w
    for dy in range(dst_h):
        for dx in range(dst_w):
            src_x = min(max((dx + 0.5) * sx - 0.5, 0.0), src_w - 1.0)
            src_y = min(max((dy + 0.5) * sy - 0.5, 0.0), src_h - 1.0)
            x0, y0 = int(src_x), int(src_y)
            x1, y1 = min(x0 + 1, src_w - 1), min(y0 + 1, src_h - 1)
            fx, fy = src_x - x0, src_y - y0
            out[dy, dx] = ((1 - fx) * (1 - fy) * img[y0, x0]
                           + fx * (1 - fy) * img[y0, x1]
                           + (1 - fx) * fy * img[y1, x0]
                           + fx * fy * img[y1, x1])
    return out


def test_resize_matches_cuda_kernel_math(rng):
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 16, 24))
    expected = scalar_resize(img, 16, 24)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)


def test_resize_identity():
    img = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 4, 6))
    np.testing.assert_allclose(got, img, atol=1e-5)


def test_normalize_formula(rng):
    rgb = rng.uniform(0, 1, (5, 5, 3)).astype(np.float32)
    got = np.asarray(normalize(jnp.asarray(rgb)))
    expected = (rgb - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_preprocess_bgra_channel_order(rng):
    img = rng.integers(0, 256, (32, 32, 4)).astype(np.uint8)
    out_bgra = np.asarray(preprocess_bgra(jnp.asarray(img), out_size=16))
    rgb = img[..., 2::-1]
    out_rgb = np.asarray(preprocess_rgb(jnp.asarray(rgb), out_size=16))
    np.testing.assert_allclose(out_bgra, out_rgb, atol=1e-5)
    assert out_bgra.shape == (16, 16, 3)


def test_nv12_gray():
    # Y=128, U=V=128 (no chroma) -> gray ~ (128-16)*1.164 = 130.4
    y = np.full((8, 8), 128, np.uint8)
    uv = np.full((4, 4, 2), 128, np.uint8)
    rgb = np.asarray(nv12_to_rgb(jnp.asarray(y), jnp.asarray(uv)))
    np.testing.assert_allclose(rgb, 130.368, atol=0.01)


def test_letterbox_shape_and_padding(rng):
    img = rng.integers(0, 256, (100, 200, 3)).astype(np.float32)
    out, scale, (pad_x, pad_y) = letterbox(jnp.asarray(img), 64)
    assert out.shape == (64, 64, 3)
    assert scale == 64 / 200
    assert pad_x == 0 and pad_y == (64 - 32) // 2
    out = np.asarray(out)
    assert np.all(out[:pad_y] == 114.0)  # top pad
    assert np.all(out[pad_y + 32:] == 114.0)  # bottom pad
